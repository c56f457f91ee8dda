"""Deterministic synthetic testdata generator for SFs the driver doesn't
ship (the driver's own /root/testdata is read-only and stops at sf0.1).

Reproduces the SHAPE of the driver's tables (TESTDATA.md): same schemas,
same value domains/distributions, row counts extrapolated from the
sf0.01 -> sf0.1 growth (relational tables x10/SF-decade; documents x10;
embeddings x4 — matching the driver's sublinear embedding growth). The
data is NOT bit-identical to a hypothetical driver sf1 (different
generator), which is fine: sf1 exists for MEASURED scaling evidence
(SCALING.md), not oracle comparison — the oracle gate runs at sf0.01.

Usage: python tools/gen_testdata.py [--sf 1.0] [--out /tmp/finporter_testdata]
Writes <out>/sf<sf>/<table>.parquet for the ten catalog tables.
Seed is fixed (42) -> identical bytes across runs.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
P_NAMES_A = ["large", "hot", "blue", "small", "red", "green", "dark", "light"]
P_NAMES_B = ["ring", "bolt", "screw", "nut", "washer", "gear", "pin", "rod"]
P_TYPES = ["LARGE", "ECONOMY", "SMALL", "STANDARD", "PROMO", "MEDIUM"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
# the driver corpus's 31-word vocabulary (engine-themed tokens)
VOCAB = (
    "batch part spark line column order small sort fast value scan slow "
    "hash group agg filter query big key window row table stream merge "
    "data a vector join index page block"
).split()
LANGS = ["en", "de", "zh", "es", "fr"]
LANG_P = [0.4, 0.15, 0.15, 0.15, 0.15]

DAY_US = 86_400_000_000


def _ts_day(rng, n, lo="1995-01-01", hi="2001-08-01"):
    lo_d = np.datetime64(lo, "D").astype(int)
    hi_d = np.datetime64(hi, "D").astype(int)
    days = rng.integers(lo_d, hi_d + 1, n)
    return days.astype("datetime64[D]").astype("datetime64[us]")


def gen(sf: float, out_dir: str) -> None:
    rng = np.random.default_rng(42)
    n_cust = int(150_000 * sf / 10) * 10 or 150
    n_supp = int(10_000 * sf) or 10
    n_part = int(200_000 * sf) or 200
    n_ord = int(1_500_000 * sf) or 1500
    n_li = int(6_000_000 * sf) or 6000
    n_ev = int(1_000_000 * sf) or 1000
    n_doc = int(50_000 * sf) or 500
    n_emb = int(8_000 * sf) or 500
    os.makedirs(out_dir, exist_ok=True)

    def w(name, table):
        pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"))
        print(f"{name}: {table.num_rows} rows")

    w("region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    }))
    w("nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))
    w("customer", pa.table({
        "c_custkey": pa.array(range(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-999, 9999, n_cust), 2),
        "c_mktsegment": pa.array(np.array(SEGMENTS)[rng.integers(0, 5, n_cust)]),
    }))
    w("supplier", pa.table({
        "s_suppkey": pa.array(range(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-999, 9999, n_supp), 2),
    }))
    w("part", pa.table({
        "p_partkey": pa.array(range(n_part), pa.int64()),
        "p_name": [
            f"{P_NAMES_A[i % 8]} {P_NAMES_B[(i // 8) % 8]}" for i in range(n_part)
        ],
        "p_brand": [f"Brand#{int(b)}" for b in rng.integers(1, 26, n_part)],
        "p_type": pa.array(np.array(P_TYPES)[rng.integers(0, len(P_TYPES), n_part)]),
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(900 + np.arange(n_part) * 0.1 % 1100, 2),
    }))
    w("orders", pa.table({
        "o_orderkey": pa.array(range(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": pa.array(np.array(["O", "F", "P"])[
            rng.choice(3, n_ord, p=[0.49, 0.49, 0.02])]),
        "o_totalprice": np.round(rng.uniform(1000, 500_000, n_ord), 2),
        "o_orderdate": _ts_day(rng, n_ord),
        "o_orderpriority": pa.array(np.array(PRIORITIES)[rng.integers(0, 5, n_ord)]),
    }))
    w("lineitem", pa.table({
        "l_orderkey": pa.array(rng.integers(0, n_ord, n_li), pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(rng.integers(1, 8, n_li), pa.int32()),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 105_000, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) * 0.01, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) * 0.01, 2),
        "l_returnflag": pa.array(np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)]),
        "l_linestatus": pa.array(np.array(["O", "F"])[rng.integers(0, 2, n_li)]),
        "l_shipdate": _ts_day(rng, n_li, "1995-01-02", "2001-11-04"),
    }))
    # events: sequential ids, ts monotone over ~30 days (stream shape)
    gaps = rng.exponential(30 * DAY_US / n_ev, n_ev).astype(np.int64)
    ts = np.datetime64("2024-01-01", "us") + np.cumsum(gaps)
    w("events", pa.table({
        "event_id": pa.array(range(n_ev), pa.int64()),
        "ts": ts,
        "user_id": pa.array(rng.integers(0, n_cust, n_ev), pa.int64()),
        "event_type": pa.array(np.array(EVENT_TYPES)[rng.integers(0, 5, n_ev)]),
        "value": np.round(rng.exponential(90, n_ev).clip(0, 560.21), 2),
        "props": [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, n_ev)],
    }))
    # documents: uniform word draws; ~3% near-dup copies (few words
    # perturbed) + ~0.3% exact copies, mirroring the driver's dup rates
    vocab = np.array(VOCAB)
    lens = rng.integers(10, 101, n_doc)
    texts: list[str] = []
    for i in range(n_doc):
        r = rng.random()
        if i > 10 and r < 0.003:
            texts.append(texts[int(rng.integers(0, i))])
        elif i > 10 and r < 0.03:
            src = texts[int(rng.integers(0, i))].split()
            for _ in range(max(1, len(src) // 20)):
                src[int(rng.integers(0, len(src)))] = vocab[
                    int(rng.integers(0, len(vocab)))]
            texts.append(" ".join(src))
        else:
            texts.append(" ".join(vocab[rng.integers(0, len(vocab), lens[i])]))
    w("documents", pa.table({
        "doc_id": pa.array(range(n_doc), pa.int64()),
        "text": texts,
        "lang": pa.array(np.array(LANGS)[rng.choice(len(LANGS), n_doc, p=LANG_P)]),
        "source": [f"src{int(s)}" for s in rng.integers(0, 20, n_doc)],
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))
    # embeddings: 10 unit-norm clusters in R^64, float32, unit-normalized
    centers = rng.normal(size=(10, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, 10, n_emb)
    pts = centers[labels] + rng.normal(scale=0.35, size=(n_emb, 64))
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    w("embeddings", pa.table({
        "vec_id": pa.array(range(n_emb), pa.int64()),
        "embedding": pa.array(list(pts.astype(np.float32)), pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    }))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--out", default="/tmp/finporter_testdata")
    a = ap.parse_args()
    sf_name = f"sf{a.sf:g}"
    gen(a.sf, os.path.join(a.out, sf_name))
