"""Generate a schema-compatible synthetic SF dir for PERFORMANCE
measurement beyond the committed testdata (the committed
/root/testdata/sf* dirs are driver-owned and read-only; correctness
gates run ONLY on those).

Distributions mirror the committed sf0.1 tables (domains sampled with
duckdb: categorical values, key ranges, value ranges, document vocab and
length profile, ~0.16% exact-dup documents) so per-row work is
comparable; exact per-value equality with the driver's generator is NOT
a goal — this data feeds wall-clock scaling ratios (SCALE.md), never the
oracle gate.

Usage: python tools/gen_sf.py <out_dir> [sf]   (default sf=1.0)
  sf=1.0 → lineitem 6,000,000 rows (10× the committed sf0.1)
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window",
]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
EVENT_TYPES = ["view", "click", "purchase", "signup", "error"]
LANGS = ["en", "de", "es", "fr", "zh"]
P_TYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
P_ADJ = ["large", "hot", "blue", "old", "new", "red", "small", "cold"]
P_NOUN = ["ring", "bolt", "plate", "wheel", "cog", "pin", "rod", "cap"]


def _write(out_dir: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"))
    print(f"{name}: {table.num_rows} rows")


def main() -> int:
    out_dir = sys.argv[1]
    sf = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(42)
    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_li = int(6_000_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_doc = int(50_000 * sf)
    n_emb = int(20_000 * sf)

    _write(out_dir, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"],
    }))
    _write(out_dir, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))
    _write(out_dir, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_mktsegment": pa.array(np.array(SEGMENTS)[rng.integers(0, 5, n_cust)]),
        "c_acctbal": np.round(rng.uniform(-999.0, 9999.0, n_cust), 2),
    }))
    _write(out_dir, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-999.0, 9999.0, n_supp), 2),
    }))
    adj = np.array(P_ADJ)[rng.integers(0, len(P_ADJ), n_part)]
    noun = np.array(P_NOUN)[rng.integers(0, len(P_NOUN), n_part)]
    _write(out_dir, "part", pa.table({
        "p_partkey": pa.array(np.arange(n_part), pa.int64()),
        "p_name": [f"{a} {b}" for a, b in zip(adj, noun)],
        "p_brand": [f"Brand#{i}" for i in rng.integers(1, 26, n_part)],
        "p_type": pa.array(np.array(P_TYPES)[rng.integers(0, 6, n_part)]),
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(rng.uniform(900.0, 2000.0, n_part), 2),
    }))
    base = np.datetime64("1995-01-01")
    span_days = int((np.datetime64("2001-08-01") - base) / np.timedelta64(1, "D"))
    odate = base + rng.integers(0, span_days + 1, n_ord).astype("timedelta64[D]")
    _write(out_dir, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": pa.array(
            np.array(["F", "O", "P"])[rng.choice(3, n_ord, p=[0.49, 0.49, 0.02])]
        ),
        "o_totalprice": np.round(rng.uniform(1000.0, 500000.0, n_ord), 2),
        "o_orderdate": pa.array(odate.astype("datetime64[us]")),
        "o_orderpriority": pa.array(np.array(PRIORITIES)[rng.integers(0, 5, n_ord)]),
    }))
    sdate = base + rng.integers(0, span_days + 95, n_li).astype("timedelta64[D]")
    _write(out_dir, "lineitem", pa.table({
        "l_orderkey": pa.array(rng.integers(0, n_ord, n_li), pa.int64()),
        "l_linenumber": pa.array(rng.integers(1, 8, n_li), pa.int32()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900.0, 105000.0, n_li), 2),
        "l_discount": np.round(rng.uniform(0.0, 0.1, n_li), 2),
        "l_tax": np.round(rng.uniform(0.0, 0.08, n_li), 2),
        "l_returnflag": pa.array(
            np.array(["A", "N", "R"])[rng.choice(3, n_li, p=[0.25, 0.5, 0.25])]
        ),
        "l_linestatus": pa.array(np.array(["F", "O"])[rng.integers(0, 2, n_li)]),
        "l_shipdate": pa.array(sdate.astype("datetime64[us]")),
    }))
    ev_base = np.datetime64("2024-01-01T00:00:00.000000")
    month_us = 30 * 24 * 3600 * 1_000_000
    ts = ev_base + np.sort(rng.integers(0, month_us, n_ev)).astype("timedelta64[us]")
    _write(out_dir, "events", pa.table({
        "event_id": pa.array(np.arange(n_ev), pa.int64()),
        "ts": pa.array(ts),
        "user_id": pa.array(rng.integers(0, int(1500 * sf * 10), n_ev), pa.int64()),
        "event_type": pa.array(
            np.array(EVENT_TYPES)[rng.choice(5, n_ev, p=[0.4, 0.3, 0.1, 0.1, 0.1])]
        ),
        "value": np.round(rng.uniform(0.0, 560.0, n_ev), 2),
        "props": [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, n_ev)],
    }))
    lens = rng.integers(10, 101, n_doc)
    vocab = np.array(VOCAB)
    texts = [
        " ".join(vocab[rng.integers(0, len(vocab), ln)]) for ln in lens
    ]
    # exact-dup rate ≈ committed corpus (8 dup groups / 5k docs at sf0.1)
    n_dups = max(1, n_doc // 625)
    dup_src = rng.integers(0, n_doc, n_dups)
    dup_dst = rng.integers(0, n_doc, n_dups)
    for s, d in zip(dup_src, dup_dst):
        if s != d:
            texts[d] = texts[s]
    _write(out_dir, "documents", pa.table({
        "doc_id": pa.array(np.arange(n_doc), pa.int64()),
        "text": texts,
        "lang": pa.array(
            np.array(LANGS)[rng.choice(5, n_doc, p=[0.5, 0.15, 0.15, 0.1, 0.1])]
        ),
        "source": [f"src{i}" for i in rng.integers(0, 20, n_doc)],
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))
    centers = rng.normal(0.0, 1.0, (10, 64))
    labels = rng.integers(0, 10, n_emb)
    emb = (centers[labels] + rng.normal(0.0, 0.5, (n_emb, 64))).astype(np.float32)
    _write(out_dir, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_emb), pa.int64()),
        "embedding": pa.array(list(emb), pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
