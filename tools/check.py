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


# ---------------------------------------------------------------------------
# Iterative closure oracles (the stress-SF path for the recursive-CTE family)
#
# q48/q55/q57/q66/q162 need connected components over a verified near-dup
# pair set. Their driver-facing oracles (oracle_sql.json) express the
# closure as WITH RECURSIVE "min reachable id" — correct, but the reach
# relation materializes O(component_size) rows PER NODE, which OOMs
# DuckDB at sf1+. This harness replica instead runs the pair-generation
# SQL once into a temp edge table and closes it with a min-label loop:
#   lbl(n) <- min(lbl(n), min over neighbors' lbl)   (diameter-bounded)
#   lbl(n) <- lbl(lbl(n))                            (pointer jump -> log)
# Each round is linear in edges; the loop stops at fixpoint, which for
# min-label propagation IS the component minimum — the same label the
# recursive CTE computes. Used for the five whenever present (sf0.01
# gives the formulation itself a cross-check against the Spark side).
# ---------------------------------------------------------------------------

# q48/q55/q66/q162's shared pair generation: MinHash-LSH candidates,
# exact-Jaccard >= 0.8 verify (text of the CTE prefix in SparkEntry).
MINHASH_PAIRS = """
WITH t AS (SELECT doc_id, string_split(text, ' ') ts FROM documents),
sh AS (SELECT doc_id, list_distinct([CAST(concat('0x', substr(md5(ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]), 1, 15)) AS BIGINT)
         for i in range(1, len(ts) - 1)]) hs FROM t),
ex AS (SELECT doc_id, unnest(hs) h FROM sh),
seeds AS (SELECT r.s, CAST(concat('0x', substr(md5(CAST(r.s AS VARCHAR)), 1, 15)) AS BIGINT) c FROM range(32) r(s)),
mh AS (SELECT ex.doc_id, seeds.s, min(xor(ex.h, seeds.c)) mh FROM ex, seeds GROUP BY 1, 2),
sig AS (SELECT doc_id, list(mh ORDER BY s) sig FROM mh GROUP BY 1),
band AS (SELECT doc_id, r.b band, array_to_string(sig[r.b * 4 + 1 : r.b * 4 + 4], ',') bkey
         FROM sig, range(8) r(b)),
cand AS (SELECT DISTINCT a.doc_id da, b.doc_id db FROM band a JOIN band b
         ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
j AS (SELECT da, db, len(list_intersect(x.hs, y.hs)) inter, len(x.hs) na, len(y.hs) nb
      FROM cand JOIN sh x ON cand.da = x.doc_id JOIN sh y ON cand.db = y.doc_id)
SELECT da AS u, db AS v FROM j WHERE CAST(inter AS DOUBLE) / (na + nb - inter) >= 0.8
"""

# q57's pair generation: hyperplane-LSH candidates, exact cosine >= 0.45.
COSINE_PAIRS = """
WITH vv AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) v FROM embeddings),
n AS (SELECT vec_id, v, sqrt(list_reduce(list_transform(v, x -> x * x), (a, b) -> a + b)) nrm FROM vv),
planes AS (SELECT r.p, list_transform(range(0, 64), i ->
    CAST(CAST(concat('0x', substr(md5(CAST(r.p AS VARCHAR) || '#' || CAST(i AS VARCHAR)), 1, 15)) AS BIGINT) % 2001 - 1000 AS DOUBLE) / 1000.0) w
  FROM range(16) r(p)),
sigs AS (SELECT n.vec_id,
    CAST(sum(CASE WHEN list_reduce(list_transform(range(1, 65), i -> n.v[i] * pl.w[i]), (a, b) -> a + b) >= 0
             THEN (1::BIGINT << pl.p) ELSE 0 END) AS BIGINT) AS sig
  FROM n, planes pl GROUP BY n.vec_id),
band AS (SELECT vec_id, r.b AS band, (sig >> (r.b * 4)) & 15 AS bkey FROM sigs, range(4) r(b)),
cand AS (SELECT DISTINCT a.vec_id va, b.vec_id vb FROM band a JOIN band b
         ON a.band = b.band AND a.bkey = b.bkey AND a.vec_id < b.vec_id)
SELECT va AS u, vb AS v FROM (
    SELECT va, vb, list_reduce(list_transform(range(1, 65), i -> x.v[i] * y.v[i]), (a, b) -> a + b) / (x.nrm * y.nrm) c
    FROM cand JOIN n x ON va = x.vec_id JOIN n y ON vb = y.vec_id) s
  WHERE c >= 0.45
"""

# Per-query tails over __comp(n, lbl) — each the literal tail of its
# recursive-CTE twin with c/comp replaced by the loop's fixpoint table.
ITERATIVE_ORACLES = {
    "q48_dedup_clusters": (MINHASH_PAIRS, """
        WITH c AS (SELECT n AS doc_id, lbl AS cluster_id FROM __comp),
        sz AS (SELECT cluster_id, count(*) AS cluster_size FROM c GROUP BY 1)
        SELECT c.doc_id, c.cluster_id, sz.cluster_size
        FROM c JOIN sz USING (cluster_id) ORDER BY doc_id"""),
    "q55_dedup_keep_list": (MINHASH_PAIRS, """
        WITH c AS (SELECT n AS doc_id, lbl AS cluster_id FROM __comp)
        SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS cluster_id,
          d.doc_id = COALESCE(c.cluster_id, d.doc_id) AS keep
        FROM documents d LEFT JOIN c ON d.doc_id = c.doc_id
        ORDER BY d.doc_id"""),
    "q66_canonical_docs": (MINHASH_PAIRS, """
        WITH c AS (SELECT n AS doc_id, lbl AS cluster_id FROM __comp),
        t AS (SELECT doc_id, string_split(text, ' ') ts FROM documents),
        m AS (SELECT doc_id, CAST(len(ts) AS BIGINT) ntok, CAST(len(list_distinct(ts)) AS BIGINT) ndist,
          CAST(len(list_filter(ts, x -> x IN ('the', 'a', 'of', 'to', 'and'))) AS BIGINT) nstop,
          CAST(list_reduce(list_transform(ts, x -> CAST(length(x) AS BIGINT)), (a, b) -> a + b) AS BIGINT) sumlen
          FROM t),
        q AS (SELECT doc_id,
          floor((0.4 * (CAST(ndist AS DOUBLE) / ntok) + 0.3 * (1.0 - CAST(nstop AS DOUBLE) / ntok)
            + 0.3 * least(CAST(sumlen AS DOUBLE) / ntok / 10.0, 1.0)) * 1000000.0 + 0.5) / 1000000.0 AS score
          FROM m),
        lab AS (SELECT q.doc_id, COALESCE(c.cluster_id, q.doc_id) AS cluster_id, q.score
                FROM q LEFT JOIN c ON q.doc_id = c.doc_id)
        SELECT doc_id, cluster_id, score,
          row_number() OVER (PARTITION BY cluster_id ORDER BY score DESC, doc_id ASC) = 1 AS keep
        FROM lab ORDER BY doc_id"""),
    "q162_cluster_capped_sample": (MINHASH_PAIRS, """
        WITH c AS (SELECT n AS doc_id, lbl AS cluster_id FROM __comp),
        sz AS (SELECT cluster_id, count(*) AS cluster_size FROM c GROUP BY 1),
        k AS (SELECT c.doc_id, c.cluster_id, sz.cluster_size,
            CAST(row_number() OVER (PARTITION BY c.cluster_id
              ORDER BY CAST(concat('0x', substr(md5(CAST(c.doc_id AS VARCHAR)), 1, 15)) AS BIGINT), c.doc_id) AS BIGINT) AS keep_rank
          FROM c JOIN sz USING (cluster_id))
        SELECT doc_id, cluster_id, cluster_size, keep_rank, keep_rank <= 2 AS kept
        FROM k ORDER BY doc_id"""),
    "q57_embed_dedup_clusters": (COSINE_PAIRS, """
        WITH comp AS (SELECT n AS vec_id, lbl AS cluster_id FROM __comp),
        sz AS (SELECT cluster_id, count(*) AS cluster_size FROM comp GROUP BY 1)
        SELECT comp.vec_id, comp.cluster_id, sz.cluster_size
        FROM comp JOIN sz USING (cluster_id) ORDER BY vec_id"""),
}


def iterative_oracle(con, name):
    pairs_sql, tail_sql = ITERATIVE_ORACLES[name]
    con.sql(f"CREATE OR REPLACE TEMP TABLE __edges AS "
            f"SELECT u, v FROM ({pairs_sql}) UNION "
            f"SELECT v, u FROM ({pairs_sql})")
    con.sql("CREATE OR REPLACE TEMP TABLE __comp AS "
            "SELECT DISTINCT u AS n, u AS lbl FROM __edges")
    rounds = 0
    while True:
        # neighbor-min step (diameter-bounded on its own) ...
        con.sql("""CREATE OR REPLACE TEMP TABLE __comp2 AS
                   SELECT n, min(lbl) AS lbl FROM (
                     SELECT n, lbl FROM __comp
                     UNION ALL
                     SELECT e.u AS n, l.lbl FROM __edges e JOIN __comp l ON l.n = e.v
                   ) GROUP BY n""")
        # ... plus a pointer jump (labels are node ids, so lbl(lbl(n))
        # is defined), which makes convergence logarithmic in the
        # longest path instead of linear
        con.sql("""CREATE OR REPLACE TEMP TABLE __comp3 AS
                   SELECT a.n, b.lbl FROM __comp2 a JOIN __comp2 b ON a.lbl = b.n""")
        changed = con.sql(
            "SELECT count(*) FROM __comp a JOIN __comp3 b USING (n) "
            "WHERE a.lbl <> b.lbl").fetchone()[0]
        con.sql("CREATE OR REPLACE TEMP TABLE __comp AS SELECT * FROM __comp3")
        rounds += 1
        if changed == 0:
            break
        if rounds > 64:  # 2^64 path halvings: unreachable unless broken
            raise RuntimeError(f"{name}: closure loop did not converge")
    return con.sql(tail_sql).df()


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
            if name in ITERATIVE_ORACLES:
                want = iterative_oracle(con, name)
            else:
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
