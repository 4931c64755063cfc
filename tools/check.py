#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the testdata parquet and compare (schema-lenient, value-exact)
against the parquet written by graft.Verify.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [skipCsv]

skipCsv: comma-separated query names to leave out of the compare (stress
SFs where the DuckDB formulation of a documented-quadratic oracle — e.g.
q23's exact all-pairs join at sf10 — is impractical; the Spark side may
still have run them).
"""
import json, sys, glob
import duckdb
import pyarrow.parquet as pq
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True,
                        key=lambda s: s.map(lambda v: str(v)))
    return df


def connect(sf_dir):
    con = duckdb.connect()
    # stress SFs: let DuckDB spill instead of OOM on the big oracle
    # intermediates (q21's 848M-row signature build at sf10)
    con.sql("SET temp_directory='/tmp/duckdb_spill'")
    # overridable: on boxes with strict commit accounting a 48GB DuckDB
    # reservation can starve the pandas side of the compare — spilling is
    # cheaper than the process dying
    import os
    con.sql(f"SET memory_limit='{os.environ.get('GRAFT_DUCKDB_MEM', '48GB')}'")
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def main(sf_dir, out_dir, skip=()):
    con = connect(sf_dir)
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok = fail = 0
    for name in sorted(oracle):
        if name in skip:
            print(f"SKIP     {name}")
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"MISSING  {name}: no parquet written")
            fail += 1
            continue
        # guard BOTH sides per query: one OOM (a too-big oracle, or an
        # allocator wedged by a previous one) must fail THAT query, not
        # abort the whole gate with the earlier OK lines unflushed
        try:
            got = pq.read_table(files[0]).to_pandas()
        except Exception as e:
            print(f"READ_ERR {name}: {type(e).__name__}: {str(e)[:200]}", flush=True)
            fail += 1
            continue
        try:
            want = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"ORACLE_ERR {name}: {type(e).__name__}: {str(e)[:200]}", flush=True)
            fail += 1
            # an OOM'd DuckDB can keep its allocator pinned; rebuild the
            # connection so later queries start from a clean slate
            try:
                con.close()
            except Exception:
                pass
            con = connect(sf_dir)
            continue
        g, w = norm(got), norm(want)
        if list(g.columns) != list(w.columns):
            print(f"SCHEMA   {name}: got {list(g.columns)} want {list(w.columns)}")
            fail += 1
            continue
        if len(g) != len(w):
            print(f"ROWS     {name}: got {len(g)} want {len(w)}")
            fail += 1
            continue
        gv = [tuple(str(x) for x in r) for r in g.itertuples(index=False)]
        wv = [tuple(str(x) for x in r) for r in w.itertuples(index=False)]
        if gv != wv:
            bad = next(i for i, (a, b) in enumerate(zip(gv, wv)) if a != b)
            print(f"VALUES   {name}: first diff row {bad}:\n  got  {gv[bad]}\n  want {wv[bad]}")
            fail += 1
            continue
        print(f"OK       {name} ({len(g)} rows)", flush=True)
        ok += 1
    print(f"\n{ok} ok, {fail} failed")
    sys.exit(1 if fail else 0)


if __name__ == "__main__":
    skip = tuple(s.strip() for s in sys.argv[3].split(",") if s.strip()) if len(sys.argv) > 3 else ()
    main(sys.argv[1], sys.argv[2], skip)
