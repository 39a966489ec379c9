#!/usr/bin/env python3
"""Synthesize an sf directory with the same schemas and distributions as the
driver-generated /root/testdata/sf* tables (TESTDATA.md) — used for the LOCAL
sf1 scale-stress run (VERDICT r5 next-round item #1). Deterministic under
seed 42, but its values are this script's own RNG stream, not a byte replica
of the driver's generator (the driver's own sf dirs are not cross-sf
deterministic either; every query is verified against a DuckDB oracle over
the SAME files, so correctness never depends on matching the driver's bytes).

Distribution notes (measured from sf0.01/sf0.1 with DuckDB, see round-6 log):
  region/nation fixed 5/25; nation n_regionkey = n_nationkey % 5
  customer  15e4·sf  acctbal U(-1000,10000) 2dp, 5 uniform segments
  supplier  1e4·sf   acctbal U(-1000,10000) 2dp
  part      2e5·sf   name = 8 adj x 8 noun, Brand#0..24, 6 types,
                     size U{1..50}, retailprice = 900 + (key%1000)*0.1
  orders    1.5e6·sf custkey uniform, status P/O/F, totalprice U(1e3,5e5) 2dp,
                     orderdate midnight U[1995-01-01, 2001-08-01], 5 priorities
  lineitem  4 rows/order in expectation: orderkey uniform over orders (so the
                     per-order line count is Binomial≈Poisson(4), matching the
                     observed min 1 / max 17 / avg 4.075), linenumber U{1..7}
                     independent, qty U{1..50} as double, extprice U(900,105000)
                     2dp, discount U{0..10}/100, tax U{0..8}/100, flags uniform,
                     shipdate independent U[1995-01-02, 2001-11-04]
  events    1e6·sf   ts uniform micros over 2024-01-01..2024-01-31,
                     user_id uniform over customers/10 users,
                     value Exp(mean 50) 2dp, props = {"k": U{0..99}}
  documents 5e4·sf   31-word vocab salad, wordcount U{10..100}; lang weighted
                     en 0.4 / de,es,fr,zh 0.15; source = src{doc_id % 20};
                     ~1.2% near-dup (copy of an earlier doc with 2 words
                     swapped) and ~0.16% exact dup, like the driver's drops
  embeddings 2e4·sf·0.4 (observed 500/2000 at sf0.01/sf0.1): 64-dim unit
                     Gaussian float32, label U{0..9} (no cluster structure —
                     measured intra-label cosine ≈ inter-label ≈ 0)

Usage: python3 tools/gen_sf.py <sf> <outdir>
       python3 tools/gen_sf.py 1 tools/sf1
"""
import sys, os
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

def day_range(start, end):
    s = np.datetime64(start); e = np.datetime64(end)
    return s, int((e - s) / np.timedelta64(1, "D"))

def write(outdir, name, table):
    pq.write_table(table, os.path.join(outdir, f"{name}.parquet"))
    print(f"[gen_sf] {name}: {table.num_rows} rows")

def main(sf, outdir):
    os.makedirs(outdir, exist_ok=True)
    rng = np.random.default_rng(42)
    n_cust = int(150000 * sf); n_supp = int(10000 * sf); n_part = int(200000 * sf)
    n_ord = int(1500000 * sf); n_li = 4 * n_ord; n_ev = int(1000000 * sf)
    n_doc = int(50000 * sf); n_emb = int(8000 * sf)

    write(outdir, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]}))

    write(outdir, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32())}))

    segs = np.array(["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"])
    write(outdir, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
        "c_mktsegment": pa.array(segs[rng.integers(0, 5, n_cust)])}))

    write(outdir, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2)}))

    adjs = np.array(["small", "red", "blue", "green", "large", "dim", "shiny", "plain"])
    nouns = np.array(["ring", "widget", "bolt", "gear", "cog", "pin", "tube", "plate"])
    keys = np.arange(n_part)
    write(outdir, "part", pa.table({
        "p_partkey": pa.array(keys, pa.int64()),
        "p_name": pa.array(np.char.add(np.char.add(adjs[rng.integers(0, 8, n_part)], " "),
                                       nouns[rng.integers(0, 8, n_part)])),
        "p_brand": pa.array(np.char.add("Brand#", rng.integers(0, 25, n_part).astype(str))),
        "p_type": pa.array(np.array(["ECONOMY", "SMALL", "MEDIUM", "LARGE", "STANDARD",
                                     "PROMO"])[rng.integers(0, 6, n_part)]),
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": 900.0 + (keys % 1000) * 0.1}))

    od0, od_days = day_range("1995-01-01", "2001-08-01")
    odate = od0 + rng.integers(0, od_days + 1, n_ord).astype("timedelta64[D]")
    write(outdir, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": pa.array(np.array(["P", "O", "F"])[rng.integers(0, 3, n_ord)]),
        "o_totalprice": np.round(rng.uniform(1000, 500000, n_ord), 2),
        "o_orderdate": pa.array(odate.astype("datetime64[us]"), pa.timestamp("us")),
        "o_orderpriority": pa.array(np.array(
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
        )[rng.integers(0, 5, n_ord)])}))

    sd0, sd_days = day_range("1995-01-02", "2001-11-04")
    sdate = sd0 + rng.integers(0, sd_days + 1, n_li).astype("timedelta64[D]")
    write(outdir, "lineitem", pa.table({
        "l_orderkey": pa.array(rng.integers(0, n_ord, n_li), pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(rng.integers(1, 8, n_li), pa.int32()),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 105000, n_li), 2),
        "l_discount": rng.integers(0, 11, n_li) / 100.0,
        "l_tax": rng.integers(0, 9, n_li) / 100.0,
        "l_returnflag": pa.array(np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)]),
        "l_linestatus": pa.array(np.array(["F", "O"])[rng.integers(0, 2, n_li)]),
        "l_shipdate": pa.array(sdate.astype("datetime64[us]"), pa.timestamp("us"))}))

    ev0 = np.datetime64("2024-01-01T00:00:00")
    span_us = 30 * 24 * 3600 * 1_000_000
    ts = ev0 + rng.integers(0, span_us, n_ev).astype("timedelta64[us]")
    ts = np.sort(ts)  # driver drops are time-ordered within the file
    write(outdir, "events", pa.table({
        "event_id": pa.array(np.arange(n_ev), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, max(1, n_cust // 10), n_ev), pa.int64()),
        "event_type": pa.array(np.array(
            ["click", "view", "purchase", "signup", "error"])[rng.integers(0, 5, n_ev)]),
        "value": np.round(rng.exponential(50.0, n_ev), 2),
        "props": pa.array(np.char.add(np.char.add('{"k": ',
            rng.integers(0, 100, n_ev).astype(str)), "}"))}))

    vocab = np.array("a agg batch big column customer data dup fast filter group hash join key line merge order part query row scan slow small sort spark stream table the value vector window".split())
    wc = rng.integers(10, 101, n_doc)
    words = vocab[rng.integers(0, len(vocab), (n_doc, 100))]
    texts = [" ".join(words[i, :wc[i]]) for i in range(n_doc)]
    # plant near/exact duplicates of EARLIER docs, like the driver's drops
    n_near = int(0.012 * n_doc); n_exact = max(1, int(0.0016 * n_doc))
    for i in rng.choice(np.arange(n_doc // 10, n_doc), n_near + n_exact, replace=False):
        src = int(rng.integers(0, i))
        t = texts[src].split(" ")
        if n_near > 0:
            n_near -= 1
            for _ in range(2):
                t[int(rng.integers(0, len(t)))] = str(vocab[int(rng.integers(0, len(vocab)))])
        texts[i] = " ".join(t)
    langs = np.array(["en", "de", "es", "fr", "zh"])
    write(outdir, "documents", pa.table({
        "doc_id": pa.array(np.arange(n_doc), pa.int64()),
        "text": texts,
        "lang": pa.array(langs[rng.choice(5, n_doc, p=[0.4, 0.15, 0.15, 0.15, 0.15])]),
        "source": [f"src{i % 20}" for i in range(n_doc)],
        "n_chars": pa.array([len(t) for t in texts], pa.int64())}))

    emb = rng.normal(0, 1, (n_emb, 64))
    emb = (emb / np.linalg.norm(emb, axis=1, keepdims=True)).astype(np.float32)
    write(outdir, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_emb), pa.int64()),
        "embedding": pa.array(list(emb), pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, n_emb), pa.int32())}))

if __name__ == "__main__":
    main(float(sys.argv[1]), sys.argv[2])
