#!/usr/bin/env python3
"""Builder-side SCALE-TEST data generator (sf1 and beyond).

The driver ships read-only fixtures at sf0.001/0.01/0.1
(/root/testdata, TESTDATA.md). The r14 verdict's top item asks for a
measured gate+bench run at sf1 (~6M lineitem) to turn the 100 TB
plan-shape argument into measured evidence. This script synthesizes
that larger tier with the SAME schema, physical parquet types, value
domains, and distribution shapes as the driver fixtures (verified
against sf0.1 via DuckDB before writing this file):

  table      sf0.1 rows   sf1 rows (10x facts, dims per TPC-H-ish sf)
  region     5            5        (fixed)
  nation     25           25       (fixed)
  customer   15,000       150,000
  supplier   1,000        10,000
  part       20,000       200,000
  orders     150,000      1,500,000
  lineitem   600,000      6,000,000  (1..7 lines per order, avg ~4)
  events     100,000      1,000,000  (10x users, ~67 events/user kept)
  documents  5,000        50,000     (31-word vocab, ~4% near-dups,
                                      ~0.3% exact dups, 5 langs en-heavy,
                                      20 sources uniform)
  embeddings 2,000        20,000     (64-dim float32, L2-normalized,
                                      10 label clusters: center std
                                      ~0.009/coord, noise std 0.125)

Deterministic (numpy PCG64 seed 1042). This data is ONLY for the
scale-proof artifacts (BENCH_SF1_r*.json / gate-at-sf1 STATUS notes);
the driver's own gate and bench keep running on /root/testdata.

Usage: python3 tools/gen_scale_data.py <outDir> [sf=1.0]
"""
import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 1042
VOCAB = ["a", "agg", "batch", "big", "column", "customer", "data", "dup",
         "fast", "filter", "group", "hash", "join", "key", "line", "merge",
         "order", "part", "query", "row", "scan", "slow", "small", "sort",
         "spark", "stream", "table", "the", "value", "vector", "window"]
SEGMENTS = ["BUILDING", "MACHINERY", "FURNITURE", "AUTOMOBILE", "HOUSEHOLD"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PTYPES = ["LARGE", "STANDARD", "MEDIUM", "ECONOMY", "PROMO", "SMALL"]
PADJ = ["large", "hot", "blue", "old", "cold", "red", "new", "dim", "soft",
        "dark"]
PNOUN = ["ring", "bolt", "plate", "gear", "tube", "cap", "rod", "disk",
         "pin", "cone"]
EVENT_TYPES = ["view", "click", "purchase", "signup", "error"]
LANGS = ["en", "de", "fr", "es", "zh"]
LANG_P = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]
US = 1_000_000  # microseconds per second


def write(out_dir, name, table):
    path = os.path.join(out_dir, f"{name}.parquet")
    pq.write_table(table, path, compression="snappy")
    print(f"  {name}: {table.num_rows} rows -> {path}", flush=True)


def ts_us(start_iso, spread_days, offsets01):
    start = np.datetime64(start_iso, "us").astype("int64")
    span = int(spread_days * 86400) * US
    return (start + (offsets01 * span).astype("int64")).astype(
        "datetime64[us]")


def gen(out_dir, sf):
    rng = np.random.default_rng(SEED)
    os.makedirs(out_dir, exist_ok=True)
    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_evt = int(1_000_000 * sf)
    n_doc = int(50_000 * sf)
    n_emb = int(20_000 * sf)
    n_user = int(15_000 * sf)

    # region / nation: fixed tiny dims, identical to the driver's
    write(out_dir, "region", pa.table({
        "r_regionkey": pa.array(np.arange(5, dtype=np.int32)),
        "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]}))
    write(out_dir, "nation", pa.table({
        "n_nationkey": pa.array(np.arange(25, dtype=np.int32)),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array(np.arange(25, dtype=np.int32) % 5)}))

    write(out_dir, "customer", pa.table({
        "c_custkey": np.arange(n_cust, dtype=np.int64),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": rng.integers(0, 25, n_cust, dtype=np.int32),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
        "c_mktsegment": np.array(SEGMENTS)[rng.integers(0, 5, n_cust)]}))

    write(out_dir, "supplier", pa.table({
        "s_suppkey": np.arange(n_supp, dtype=np.int64),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": rng.integers(0, 25, n_supp, dtype=np.int32),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2)}))

    pk = np.arange(n_part, dtype=np.int64)
    write(out_dir, "part", pa.table({
        "p_partkey": pk,
        "p_name": [f"{PADJ[a]} {PNOUN[b]}" for a, b in
                   zip(rng.integers(0, 10, n_part),
                       rng.integers(0, 10, n_part))],
        "p_brand": [f"Brand#{i}" for i in rng.integers(1, 26, n_part)],
        "p_type": np.array(PTYPES)[rng.integers(0, 6, n_part)],
        "p_size": rng.integers(1, 51, n_part, dtype=np.int32),
        "p_retailprice": 900.0 + (pk % 1000) / 10.0}))

    write(out_dir, "orders", pa.table({
        "o_orderkey": np.arange(n_ord, dtype=np.int64),
        "o_custkey": rng.integers(0, n_cust, n_ord, dtype=np.int64),
        "o_orderstatus": np.array(["O", "P", "F"])[
            rng.integers(0, 3, n_ord)],
        "o_totalprice": np.round(rng.uniform(1000, 500000, n_ord), 2),
        "o_orderdate": ts_us("1995-01-01T00:00:00", 2404,
                             rng.random(n_ord)),
        "o_orderpriority": np.array(PRIORITIES)[
            rng.integers(0, 5, n_ord)]}))

    # lineitem: 1..7 lines per order (avg 4, matching sf0.1's 4.075)
    lines_per = rng.integers(1, 8, n_ord)
    l_orderkey = np.repeat(np.arange(n_ord, dtype=np.int64), lines_per)
    n_li = l_orderkey.size
    l_linenumber = (np.arange(n_li, dtype=np.int64)
                    - np.repeat(np.cumsum(lines_per) - lines_per,
                                lines_per) + 1).astype(np.int32)
    write(out_dir, "lineitem", pa.table({
        "l_orderkey": l_orderkey,
        "l_partkey": rng.integers(0, n_part, n_li, dtype=np.int64),
        "l_suppkey": rng.integers(0, n_supp, n_li, dtype=np.int64),
        "l_linenumber": l_linenumber,
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(1000, 100000, n_li), 2),
        "l_discount": rng.integers(0, 11, n_li) / 100.0,
        "l_tax": rng.integers(0, 9, n_li) / 100.0,
        "l_returnflag": np.array(["A", "N", "R"])[
            rng.integers(0, 3, n_li)],
        "l_linestatus": np.array(["O", "F"])[rng.integers(0, 2, n_li)],
        "l_shipdate": ts_us("1995-01-02T00:00:00", 2498,
                            rng.random(n_li))}))
    print(f"  (lineitem actual rows: {n_li})")

    # events: ts ascending with event_id (like the fixture), 30 days
    ts = np.sort(ts_us("2024-01-01T00:00:00", 30, rng.random(n_evt)))
    write(out_dir, "events", pa.table({
        "event_id": np.arange(n_evt, dtype=np.int64),
        "ts": ts,
        "user_id": rng.integers(0, n_user, n_evt, dtype=np.int64),
        "event_type": np.array(EVENT_TYPES)[rng.integers(0, 5, n_evt)],
        "value": np.round(rng.uniform(0, 200, n_evt)
                          * rng.choice([1.0, 1.0, 1.0, 2.8], n_evt), 2),
        "props": [f'{{"k": {k}}}' for k in rng.integers(0, 100, n_evt)]}))

    # documents: base texts from the 31-word vocab; then a near-dup
    # tail (copy an earlier doc, substitute ~6% of words) and a small
    # exact-dup tail — mirrors the fixture's 216-prefix-dup-groups/5000
    # shape that the dedup operators key on.
    n_near = int(n_doc * 0.04)
    n_exact = int(n_doc * 0.003)
    n_base = n_doc - n_near - n_exact
    vocab = np.array(VOCAB)
    texts = []
    wc = rng.integers(8, 109, n_base)
    for i in range(n_base):
        texts.append(" ".join(vocab[rng.integers(0, len(vocab), wc[i])]))
    for src in rng.integers(0, n_base, n_near):
        w = texts[src].split()
        nmut = max(1, int(len(w) * 0.06))
        for j in rng.integers(0, len(w), nmut):
            w[j] = vocab[rng.integers(0, len(vocab))]
        texts.append(" ".join(w))
    for src in rng.integers(0, n_base, n_exact):
        texts.append(texts[src])
    order = rng.permutation(n_doc)
    texts = [texts[i] for i in order]
    write(out_dir, "documents", pa.table({
        "doc_id": np.arange(n_doc, dtype=np.int64),
        "text": texts,
        "lang": np.array(LANGS)[rng.choice(5, n_doc, p=LANG_P)],
        "source": [f"src{i}" for i in rng.integers(0, 20, n_doc)],
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64)}))

    # embeddings: 10 clusters in 64-d, unit-normalized float32 (the
    # fixture's measured shape: center coord std ~0.009, noise 0.125)
    labels = rng.integers(0, 10, n_emb, dtype=np.int32)
    centers = rng.normal(0, 0.009, (10, 64))
    emb = centers[labels] + rng.normal(0, 0.125, (n_emb, 64))
    emb = (emb / np.linalg.norm(emb, axis=1, keepdims=True)).astype(
        np.float32)
    write(out_dir, "embeddings", pa.table({
        "vec_id": np.arange(n_emb, dtype=np.int64),
        "embedding": pa.array(list(emb),
                              type=pa.list_(pa.float32())),
        "label": labels}))

    manifest = {"seed": SEED, "sf": sf, "rows": {
        "customer": n_cust, "supplier": n_supp, "part": n_part,
        "orders": n_ord, "lineitem": int(n_li), "events": n_evt,
        "documents": n_doc, "embeddings": n_emb}}
    with open(os.path.join(out_dir, "MANIFEST.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    print(json.dumps(manifest))


if __name__ == "__main__":
    out = sys.argv[1]
    sf = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    gen(out, sf)
