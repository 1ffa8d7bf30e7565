#!/usr/bin/env python
"""Generate a LARGER copy of the driver's sf-table shape for MEASUREMENT
ONLY (the driver's own sf1.0 corpus was transient; this recreates its
scale so A/Bs can run where leaves take seconds).

Distributions are mimicked from /root/testdata/sf0.1 (uniform draws, the
same 31-word doc vocab, unit-norm 64-d embeddings, Poisson-ish event
stream over the same 2024-01 span, TPC-H-flavoured dimension tables).
NOT byte-compatible with the driver's generator — never use for
correctness gates, only for relative timing. Deterministic (seeded).

Usage: python tools/make_sf_like.py OUT_DIR [mult]
  mult = row multiplier vs sf0.1 (default 10 ~ "sf1.0 scale").
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

BASE = "/root/testdata/sf0.1"

VOCAB = np.array([
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "query", "batch", "part", "line", "order", "small", "sort",
    "fast", "scan", "agg", "hash", "key", "group", "filter", "customer",
    "slow", "join", "shuffle", "cache", "disk", "row", "plan", "index",
])
LANGS = np.array(["en", "zh", "fr", "es", "de"])
LANG_P = np.array([0.41, 0.15, 0.15, 0.15, 0.14])
ETYPES = np.array(["error", "view", "signup", "purchase", "click"])
SEGS = np.array(["FURNITURE", "MACHINERY", "BUILDING", "AUTOMOBILE",
                 "HOUSEHOLD"])
PRIOS = np.array(["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
                  "5-LOW"])
PNAMES1 = np.array(["large", "hot", "small", "cold", "shiny", "dim"])
PNAMES2 = np.array(["ring", "bolt", "screw", "nut", "washer", "pin"])
PTYPES = np.array(["LARGE", "ECONOMY", "STANDARD", "SMALL", "PROMO"])


def write(out_dir, name, cols):
    t = pa.table(cols)
    pq.write_table(t, os.path.join(out_dir, name + ".parquet"))
    print(f"  {name}: {t.num_rows} rows", flush=True)


def main():
    out = sys.argv[1]
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    rng = np.random.default_rng(42)
    os.makedirs(out, exist_ok=True)

    n_cust, n_supp = 15000 * mult, 1000 * mult
    n_ord, n_li = 150000 * mult, 600000 * mult
    n_part, n_doc = 20000 * mult, 5000 * mult
    n_ev, n_emb = 100000 * mult, 2000 * mult

    # dimension copies
    for small in ("nation", "region"):
        t = pq.read_table(os.path.join(BASE, small + ".parquet"))
        pq.write_table(t, os.path.join(out, small + ".parquet"))

    write(out, "customer", {
        "c_custkey": np.arange(n_cust, dtype=np.int64),
        "c_name": np.char.add("Customer#", np.char.zfill(
            np.arange(n_cust).astype(str), 9)),
        "c_nationkey": rng.integers(0, 25, n_cust, dtype=np.int32),
        "c_acctbal": np.round(rng.uniform(-999, 9999, n_cust), 2),
        "c_mktsegment": SEGS[rng.integers(0, len(SEGS), n_cust)],
    })
    write(out, "supplier", {
        "s_suppkey": np.arange(n_supp, dtype=np.int64),
        "s_name": np.char.add("Supplier#", np.char.zfill(
            np.arange(n_supp).astype(str), 9)),
        "s_nationkey": rng.integers(0, 25, n_supp, dtype=np.int32),
        "s_acctbal": np.round(rng.uniform(-999, 9999, n_supp), 2),
    })
    write(out, "part", {
        "p_partkey": np.arange(n_part, dtype=np.int64),
        "p_name": np.char.add(np.char.add(
            PNAMES1[rng.integers(0, len(PNAMES1), n_part)], " "),
            PNAMES2[rng.integers(0, len(PNAMES2), n_part)]),
        "p_brand": np.char.add("Brand#", rng.integers(
            1, 25, n_part).astype(str)),
        "p_type": PTYPES[rng.integers(0, len(PTYPES), n_part)],
        "p_size": rng.integers(1, 50, n_part, dtype=np.int32),
        "p_retailprice": np.round(900 + 0.1 * np.arange(n_part) % 1000, 2),
    })

    day = 86_400_000_000  # us
    o_dates = (np.datetime64("1995-01-01", "us")
               + rng.integers(0, 2404, n_ord) * day)
    write(out, "orders", {
        "o_orderkey": np.arange(n_ord, dtype=np.int64),
        "o_custkey": rng.integers(0, n_cust, n_ord, dtype=np.int64),
        "o_orderstatus": np.array(["O", "F", "P"])[
            rng.integers(0, 3, n_ord)],
        "o_totalprice": np.round(rng.uniform(1000, 500000, n_ord), 2),
        "o_orderdate": o_dates,
        "o_orderpriority": PRIOS[rng.integers(0, len(PRIOS), n_ord)],
    })
    write(out, "lineitem", {
        "l_orderkey": rng.integers(0, n_ord, n_li, dtype=np.int64),
        "l_partkey": rng.integers(0, n_part, n_li, dtype=np.int64),
        "l_suppkey": rng.integers(0, n_supp, n_li, dtype=np.int64),
        "l_linenumber": rng.integers(1, 8, n_li, dtype=np.int32),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 100000, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) / 100, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) / 100, 2),
        "l_returnflag": np.array(["N", "R", "A"])[rng.integers(0, 3, n_li)],
        "l_linestatus": np.array(["F", "O"])[rng.integers(0, 2, n_li)],
        "l_shipdate": (np.datetime64("1995-01-02", "us")
                       + rng.integers(0, 2499, n_li) * day),
    })

    # documents: word-salad from the 31-word vocab, 10-100 words
    lens = rng.integers(10, 101, n_doc)
    flat = VOCAB[rng.integers(0, len(VOCAB), int(lens.sum()))]
    offs = np.concatenate(([0], np.cumsum(lens)))
    texts = np.array([" ".join(flat[offs[i]:offs[i + 1]])
                      for i in range(n_doc)], dtype=object)
    # a handful of exact duplicates, like the source corpus (~0.16 %)
    n_dup = max(1, n_doc // 625)
    dup_to = rng.integers(0, n_doc, n_dup)
    dup_from = rng.integers(0, n_doc, n_dup)
    texts[dup_to] = texts[dup_from]
    write(out, "documents", {
        "doc_id": np.arange(n_doc, dtype=np.int64),
        "text": texts.astype(str),
        "lang": LANGS[rng.choice(len(LANGS), n_doc, p=LANG_P)],
        "source": np.char.add("src", rng.integers(0, 20, n_doc).astype(str)),
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
    })

    # events: sorted uniform timestamps over the same 30-day 2024-01 span
    span = 30 * day
    ts = (np.datetime64("2024-01-01", "us")
          + np.sort(rng.integers(0, span, n_ev)))
    write(out, "events", {
        "event_id": np.arange(n_ev, dtype=np.int64),
        "ts": ts,
        "user_id": rng.integers(0, n_cust // 10, n_ev, dtype=np.int64),
        "event_type": ETYPES[rng.integers(0, len(ETYPES), n_ev)],
        "value": np.round(rng.uniform(0, 561, n_ev), 2),
        "props": np.char.add(np.char.add(
            '{"k": ', rng.integers(0, 100, n_ev).astype(str)), "}"),
    })

    vec = rng.normal(0, 1, (n_emb, 64)).astype(np.float32)
    vec /= np.linalg.norm(vec, axis=1, keepdims=True)
    write(out, "embeddings", {
        "vec_id": np.arange(n_emb, dtype=np.int64),
        "embedding": pa.array(list(vec), type=pa.list_(pa.float32())),
        "label": rng.integers(0, 10, n_emb, dtype=np.int32),
    })
    print("done:", out, flush=True)


if __name__ == "__main__":
    main()
