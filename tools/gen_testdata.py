"""Deterministic scale-parameterized twin of the driver's synthetic tables.

The driver generates /root/testdata/sf{0.001,0.01,0.1} (read-only, seed=42)
and the largest SF it ships is 0.1 — but the robustness-sweep protocol
(SURVEY round-13 third act) needs the NEXT decade: regime assumptions
(sketch capacity vs key cardinality, nlist vs corpus size, rounding grid
vs summation noise) break one scale up from wherever they were tuned.
This generator reproduces the driver tables' schemas and distribution
families at any SF so the full DuckDB oracle harness
(tools/check_correctness.py) can run beyond the shipped data.

Distribution families were characterized from the shipped sf0.01/sf0.1
parquet (row-count scaling, uniform grids, Poisson(4) lines/order,
Exp-arrival events spanning ~30 days, Exp(50) values, 31-word document
vocab, iid unit-norm 64-dim embeddings).  The oracle harness compares
Spark vs DuckDB on the SAME files, so hash-parity never depends on
matching the driver's RNG — only the schemas and value REGIMES matter,
and those are matched.

Usage:  python tools/gen_testdata.py SF OUTDIR [SEED]
        python tools/gen_testdata.py 0.3 .scratch/sf0.3
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
ADJS = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
NOUNS = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_P = [0.44, 0.14, 0.14, 0.14, 0.14]

EPOCH_1995 = np.datetime64("1995-01-01")
EPOCH_2024 = np.datetime64("2024-01-01", "us")
EVENT_SPAN_S = 30 * 24 * 3600  # shipped data spans ~30 days at every SF


def _write(out_dir: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"))
    print(f"  {name:12s} {table.num_rows:>9,} rows")


def generate(sf: float, out_dir: str, seed: int = 42) -> None:
    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)
    n_cust = round(150_000 * sf)
    n_supp = round(10_000 * sf)
    n_part = round(200_000 * sf)
    n_ord = round(1_500_000 * sf)
    n_ev = round(1_000_000 * sf)
    n_users = round(15_000 * sf)
    n_doc = round(50_000 * sf)
    n_emb = max(500, round(20_000 * sf))

    _write(out_dir, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
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
        "c_acctbal": np.round(rng.uniform(-1000, 10_000, n_cust), 2),
        "c_mktsegment": pa.array(
            np.array(SEGMENTS)[rng.integers(0, 5, n_cust)]
        ),
    }))
    _write(out_dir, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-1000, 10_000, n_supp), 2),
    }))
    _write(out_dir, "part", pa.table({
        "p_partkey": pa.array(np.arange(n_part), pa.int64()),
        "p_name": [
            f"{ADJS[a]} {NOUNS[b]}"
            for a, b in zip(
                rng.integers(0, 8, n_part), rng.integers(0, 8, n_part)
            )
        ],
        "p_brand": [f"Brand#{b}" for b in rng.integers(1, 26, n_part)],
        "p_type": pa.array(np.array(PTYPES)[rng.integers(0, 6, n_part)]),
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(900.0 + 0.1 * (np.arange(n_part) % 1000), 1),
    }))

    o_date = EPOCH_1995 + rng.integers(0, 2405, n_ord).astype(
        "timedelta64[D]"
    )
    _write(out_dir, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": pa.array(
            np.array(["F", "O", "P"])[rng.integers(0, 3, n_ord)]
        ),
        "o_totalprice": np.round(rng.uniform(1000, 500_000, n_ord), 2),
        "o_orderdate": pa.array(o_date.astype("datetime64[us]")),
        "o_orderpriority": pa.array(
            np.array(PRIORITIES)[rng.integers(0, 5, n_ord)]
        ),
    }))

    lines_per = rng.poisson(4.0, n_ord)
    l_orderkey = np.repeat(np.arange(n_ord), lines_per)
    n_li = int(l_orderkey.size)
    linenumber = (
        np.arange(n_li)
        - np.repeat(np.cumsum(lines_per) - lines_per, lines_per)
        + 1
    )
    s_date = EPOCH_1995 + rng.integers(1, 2500, n_li).astype("timedelta64[D]")
    _write(out_dir, "lineitem", pa.table({
        "l_orderkey": pa.array(l_orderkey, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(linenumber, pa.int32()),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 105_000, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
        "l_returnflag": pa.array(
            np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)]
        ),
        "l_linestatus": pa.array(
            np.array(["F", "O"])[rng.integers(0, 2, n_li)]
        ),
        "l_shipdate": pa.array(s_date.astype("datetime64[us]")),
    }))

    gaps_us = rng.exponential(EVENT_SPAN_S / n_ev * 1e6, n_ev)
    ts = EPOCH_2024 + np.cumsum(gaps_us).astype("timedelta64[us]")
    _write(out_dir, "events", pa.table({
        "event_id": pa.array(np.arange(n_ev), pa.int64()),
        "ts": pa.array(ts),
        "user_id": pa.array(rng.integers(0, n_users, n_ev), pa.int64()),
        "event_type": pa.array(
            np.array(EVENT_TYPES)[rng.integers(0, 5, n_ev)]
        ),
        "value": np.round(rng.exponential(50.0, n_ev), 2),
        "props": [
            json.dumps({"k": int(k)}) for k in rng.integers(0, 100, n_ev)
        ],
    }))

    n_words = rng.integers(10, 101, n_doc)
    flat = np.array(VOCAB)[rng.integers(0, len(VOCAB), int(n_words.sum()))]
    offs = np.concatenate([[0], np.cumsum(n_words)])
    texts = [
        " ".join(flat[offs[i]:offs[i + 1]]) for i in range(n_doc)
    ]
    langs = np.array(LANGS)[rng.choice(5, n_doc, p=LANG_P)]
    # Planted near-duplicates (the shipped corpora carry them: sf0.01
    # holds 6 same-lang pairs at 2-gram Jaccard 0.95-0.99 — near-copies
    # with a few word edits — which the near-dup/cluster families need
    # to be non-vacuous).  A SEPARATE rng stream keeps the main stream's
    # draw count untouched, so regenerating with/without plants leaves
    # every OTHER table byte-identical.
    prng = np.random.default_rng(seed + 1_000_003)
    n_plant = max(6, round(0.015 * n_doc))
    victims = prng.choice(np.arange(n_doc // 2, n_doc), n_plant, False)
    for v in victims:
        src_doc = int(prng.integers(0, n_doc // 2))
        words = texts[src_doc].split()
        for _ in range(int(prng.integers(1, 4))):
            words[int(prng.integers(0, len(words)))] = VOCAB[
                int(prng.integers(0, len(VOCAB)))
            ]
        texts[int(v)] = " ".join(words)
        langs[int(v)] = langs[src_doc]
    _write(out_dir, "documents", pa.table({
        "doc_id": pa.array(np.arange(n_doc), pa.int64()),
        "text": texts,
        "lang": pa.array(langs),
        "source": [f"src{s}" for s in rng.integers(0, 20, n_doc)],
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))

    vecs = rng.standard_normal((n_emb, 64)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    _write(out_dir, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_emb), pa.int64()),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, n_emb), pa.int32()),
    }))


if __name__ == "__main__":
    sf = float(sys.argv[1])
    out = sys.argv[2]
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 42
    print(f"generating sf={sf} seed={seed} -> {out}")
    generate(sf, out, seed)
