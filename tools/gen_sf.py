#!/usr/bin/env python3
"""Generate a larger scale factor of the driver's synthetic testdata
(TESTDATA.md) for scale validation. Distributions are measured replicas of
/root/testdata/sf0.1 (seed 42 there; we use our own seed — the correctness
gate is self-consistent, Spark vs DuckDB over the SAME files, so only the
shapes/marginals must match, not the exact rows):

  region(5)/nation(25) fixed; customer/supplier/part/orders/events scale
  linearly with sf; lineitem = Poisson(4) lines per order; documents scale
  linearly (31-word vocab, 10-100 words, ~0.16% exact-dup texts); embeddings
  grow sub-linearly like the driver's (500@sf0.01, 2000@sf0.1 -> 4x per 10x)
  as unit-norm gaussian float32[64].

Usage: python3 tools/gen_sf.py <sf> <outDir>   e.g. gen_sf.py 1 testdata/sf1
"""
import sys
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEGMENTS = ["MACHINERY", "AUTOMOBILE", "FURNITURE", "HOUSEHOLD", "BUILDING"]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
EVENT_TYPES = ["signup", "click", "purchase", "error", "view"]
VOCAB = ("the batch data column order a vector part scan slow agg key window "
         "table merge join line small group query row stream sort value hash "
         "filter big dup spark fast customer").split()
LANGS = ["en", "de", "es", "fr", "zh"]
# the driver's measured inventories (sf0.01): keeping them verbatim makes
# the name-similarity surface (q103's edit-distance pairs, e.g. red/old at
# distance 2) non-vacuous at stress SFs too
P_ADJ = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
P_NOUN = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]

DAY = 86400


def write(out, name, cols):
    for k, v in cols.items():
        if not isinstance(v, (pa.Array, pa.ChunkedArray)):
            cols[k] = pa.array(v)
    t = pa.table(cols)
    # bounded row groups: a single-row-group file cannot be split by any
    # scan (Spark assigns whole row groups to tasks), which serializes
    # every per-row kernel at stress SFs — aim for ~32 groups per table
    # like any production writer would produce
    rg = max(t.num_rows // 32, 8192)
    pq.write_table(t, f"{out}/{name}.parquet", compression="snappy",
                   row_group_size=rg)
    print(f"{name}: {t.num_rows} rows ({max(1, t.num_rows // rg)} row groups)")


def main(sf, out):
    rng = np.random.default_rng(20260812)
    n_cust = int(150000 * sf)
    n_supp = int(10000 * sf)
    n_part = int(200000 * sf)
    n_ord = int(1500000 * sf)
    n_evt = int(1000000 * sf)
    n_user = int(15000 * sf)
    n_doc = int(50000 * sf)
    # embeddings grow ~4x per 10x of sf (driver: 500@0.01, 2000@0.1)
    n_emb = int(round(2000 * (4 ** np.log10(sf / 0.1))))

    write(out, "region", {
        "r_regionkey": pa.array(range(5), pa.int32()), "r_name": REGIONS})
    write(out, "nation", {
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32())})

    write(out, "customer", {
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
        "c_mktsegment": [SEGMENTS[i] for i in rng.integers(0, 5, n_cust)]})

    write(out, "supplier", {
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2)})

    pk = np.arange(n_part)
    write(out, "part", {
        "p_partkey": pa.array(pk, pa.int64()),
        "p_name": [f"{P_ADJ[a]} {P_NOUN[b]}" for a, b in
                   zip(rng.integers(0, 8, n_part), rng.integers(0, 8, n_part))],
        "p_brand": [f"Brand#{i}" for i in rng.integers(1, 26, n_part)],
        "p_type": [PTYPES[i] for i in rng.integers(0, 6, n_part)],
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(900.0 + (pk % 20000) / 10.0, 2)})

    d0 = np.datetime64("1995-01-01")
    od_days = rng.integers(0, 2405, n_ord)  # 1995-01-01 .. 2001-08-01
    write(out, "orders", {
        "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": [("O", "P", "F")[i] for i in rng.integers(0, 3, n_ord)],
        "o_totalprice": np.round(rng.uniform(1000, 500000, n_ord), 2),
        "o_orderdate": pa.array((d0 + od_days).astype("datetime64[ms]")),
        "o_orderpriority": [PRIORITIES[i] for i in rng.integers(0, 5, n_ord)]})

    lines_per = rng.poisson(4.0, n_ord)
    lok = np.repeat(np.arange(n_ord), lines_per)
    n_li = len(lok)
    lineno = np.concatenate([np.arange(1, k + 1) for k in lines_per if k > 0])
    write(out, "lineitem", {
        "l_orderkey": pa.array(lok, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(lineno, pa.int32()),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 105000, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
        "l_returnflag": [("A", "N", "R")[i] for i in rng.integers(0, 3, n_li)],
        "l_linestatus": [("F", "O")[i] for i in rng.integers(0, 2, n_li)],
        "l_shipdate": pa.array(
            (d0 + rng.integers(1, 2500, n_li)).astype("datetime64[ms]"))})

    t0 = np.datetime64("2024-01-01T00:00:00", "ns").astype("int64")
    span_ns = 30 * DAY * 1_000_000_000
    ets = np.sort(t0 + rng.integers(0, span_ns, n_evt))
    write(out, "events", {
        "event_id": pa.array(np.arange(n_evt), pa.int64()),
        # timestamp[us] with no tz — the driver's current generation (Spark
        # reads it as TIMESTAMP_NTZ); Tables.events also accepts the older
        # TIMESTAMP(NANOS) arrival, so stress data mirrors the newer format
        "ts": pa.array((ets // 1000).astype("datetime64[us]")),
        "user_id": pa.array(rng.integers(0, n_user, n_evt), pa.int64()),
        "event_type": [EVENT_TYPES[i] for i in rng.integers(0, 5, n_evt)],
        "value": np.round(rng.exponential(50.0, n_evt), 2),
        "props": [f'{{"k": {k}}}' for k in rng.integers(0, 100, n_evt)]})

    nw = rng.integers(10, 101, n_doc)
    wsel = rng.integers(0, len(VOCAB), int(nw.sum()))
    texts = []
    off = 0
    for k in nw:
        texts.append(" ".join(VOCAB[i] for i in wsel[off:off + k]))
        off += k
    # ~0.16% of docs replicate an earlier doc's text (the driver's rate:
    # 8 dup pairs / 5000 docs at sf0.1)
    for i in rng.choice(np.arange(1, n_doc), max(1, int(0.0016 * n_doc)),
                        replace=False):
        texts[i] = texts[rng.integers(0, i)]
    lang_p = np.array([0.4, 0.15, 0.15, 0.15, 0.15])
    write(out, "documents", {
        "doc_id": pa.array(np.arange(n_doc), pa.int64()),
        "text": texts,
        "lang": [LANGS[i] for i in rng.choice(5, n_doc, p=lang_p)],
        "source": [f"src{i}" for i in rng.integers(0, 20, n_doc)],
        "n_chars": pa.array([len(t) for t in texts], pa.int64())})

    v = rng.standard_normal((n_emb, 64))
    v = (v / np.linalg.norm(v, axis=1, keepdims=True)).astype(np.float32)
    write(out, "embeddings", {
        "vec_id": pa.array(np.arange(n_emb), pa.int64()),
        "embedding": pa.array(list(v), pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, n_emb), pa.int32())})


if __name__ == "__main__":
    import os
    sf = float(sys.argv[1])
    out = sys.argv[2]
    os.makedirs(out, exist_ok=True)
    main(sf, out)
