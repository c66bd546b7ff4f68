"""Generate a distribution-matched synthetic scale factor for PERFORMANCE
measurement only.

The driver's own testdata generator is private; /root/testdata/sf* is
read-only and each sf draws a fresh RNG stream, so larger scales cannot be
reproduced byte-exactly.  This tool reproduces the *distributions* observed
in /root/testdata/sf0.1 (schemas, value ranges, duplicate structure, the
5%-'dup'-marker documents, unit-gaussian embeddings, sorted event
timestamps) at an arbitrary scale so that sf1.0-class measurements stress
the same code paths with the same skew shape.  NOT for correctness grading
— oracle validation stays on the driver-generated small SFs.

Usage: python tools/gen_sf.py [sf] [outdir]
       (defaults: 1.0 /tmp/testdata_synth/sf1.0)
"""
from __future__ import annotations

import os
import shutil
import sys

import numpy as np
import pandas as pd

VOCAB = [
    "key", "agg", "row", "scan", "slow", "fast", "table", "value", "part",
    "hash", "a", "the", "line", "sort", "window", "merge", "batch", "spark",
    "order", "data", "column", "join", "small", "filter", "big", "customer",
    "group", "query", "stream", "vector",
]  # 30 uniform words; 'dup' is the rare marker word (5% of docs)


def _write(df: pd.DataFrame, outdir: str, name: str) -> None:
    df.to_parquet(os.path.join(outdir, f"{name}.parquet"), index=False)
    print(f"  {name}: {len(df)} rows")


def generate(sf: float, outdir: str, seed: int = 43) -> None:
    os.makedirs(outdir, exist_ok=True)
    rng = np.random.default_rng(seed)

    # region + nation are constant across scale factors — copy verbatim.
    for t in ("region", "nation"):
        shutil.copy(f"/root/testdata/sf0.1/{t}.parquet", f"{outdir}/{t}.parquet")
        print(f"  {t}: copied from sf0.1")

    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_line = int(6_000_000 * sf)
    n_evt = int(1_000_000 * sf)
    n_doc = int(50_000 * sf)
    # embeddings grow ~x4 per decade in the driver data (500 @0.01, 2000 @0.1)
    n_emb = int(round(2000 * (10.0 * sf) ** 0.60206))

    # ---- customer -----------------------------------------------------
    _write(pd.DataFrame({
        "c_custkey": np.arange(n_cust, dtype=np.int64),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": rng.integers(0, 25, n_cust).astype(np.int32),
        "c_acctbal": np.round(rng.uniform(-999.99, 9999.99, n_cust), 2),
        "c_mktsegment": rng.choice(
            ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"], n_cust),
    }), outdir, "customer")

    # ---- supplier -----------------------------------------------------
    _write(pd.DataFrame({
        "s_suppkey": np.arange(n_supp, dtype=np.int64),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": rng.integers(0, 25, n_supp).astype(np.int32),
        "s_acctbal": np.round(rng.uniform(-999.99, 9999.99, n_supp), 2),
    }), outdir, "supplier")

    # ---- part ---------------------------------------------------------
    adjectives = ["large", "hot", "small", "cold", "shiny", "dull", "new", "old"]
    nouns = ["ring", "bolt", "nut", "gear", "pin", "rod", "cap", "disk"]
    _write(pd.DataFrame({
        "p_partkey": np.arange(n_part, dtype=np.int64),
        "p_name": [f"{adjectives[i % 8]} {nouns[(i // 8) % 8]}" for i in range(n_part)],
        "p_brand": [f"Brand#{i % 25}" for i in rng.integers(0, 25, n_part)],
        "p_type": rng.choice(["LARGE", "ECONOMY", "STANDARD", "SMALL", "MEDIUM", "PROMO"], n_part),
        "p_size": rng.integers(1, 51, n_part).astype(np.int32),
        "p_retailprice": np.round(900.0 + 0.1 * (np.arange(n_part) % 1000), 2),
    }), outdir, "part")

    # ---- orders -------------------------------------------------------
    base95 = np.datetime64("1995-01-01")
    _write(pd.DataFrame({
        "o_orderkey": np.arange(n_ord, dtype=np.int64),
        "o_custkey": rng.integers(0, max(n_cust, 1), n_ord).astype(np.int64),
        "o_orderstatus": rng.choice(["F", "O", "P"], n_ord),
        "o_totalprice": np.round(rng.uniform(900.0, 450_000.0, n_ord), 2),
        "o_orderdate": base95 + rng.integers(0, 2404, n_ord).astype("timedelta64[D]"),
        "o_orderpriority": rng.choice(
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"], n_ord),
    }), outdir, "orders")

    # ---- lineitem -----------------------------------------------------
    _write(pd.DataFrame({
        "l_orderkey": rng.integers(0, max(n_ord, 1), n_line).astype(np.int64),
        "l_partkey": rng.integers(0, max(n_part, 1), n_line).astype(np.int64),
        "l_suppkey": rng.integers(0, max(n_supp, 1), n_line).astype(np.int64),
        "l_linenumber": rng.integers(1, 8, n_line).astype(np.int32),
        "l_quantity": rng.integers(1, 51, n_line).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900.0, 105_000.0, n_line), 2),
        "l_discount": np.round(rng.integers(0, 11, n_line) * 0.01, 2),
        "l_tax": np.round(rng.integers(0, 9, n_line) * 0.01, 2),
        "l_returnflag": rng.choice(["A", "N", "R"], n_line),
        "l_linestatus": rng.choice(["F", "O"], n_line),
        "l_shipdate": base95 + rng.integers(0, 2500, n_line).astype("timedelta64[D]"),
    }), outdir, "lineitem")

    # ---- events (ts sorted over 30 days; value ~ Exp(50); users = cust/10)
    ts0 = np.datetime64("2024-01-01T00:00:00.000000")
    offs = np.sort(rng.uniform(0, 30 * 86400.0, n_evt))
    _write(pd.DataFrame({
        "event_id": np.arange(n_evt, dtype=np.int64),
        "ts": ts0 + (offs * 1e6).astype("timedelta64[us]"),
        "user_id": rng.integers(0, max(n_cust // 10, 1), n_evt).astype(np.int64),
        "event_type": rng.choice(["signup", "purchase", "view", "click", "error"], n_evt),
        "value": np.round(rng.exponential(50.0, n_evt), 2),
        "props": [f'{{"k": {k}}}' for k in rng.integers(0, 100, n_evt)],
    }), outdir, "events")

    # ---- documents ----------------------------------------------------
    lens = rng.integers(10, 101, n_doc)
    words = rng.integers(0, len(VOCAB), lens.sum())
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    is_dup_doc = rng.random(n_doc) < 0.05          # 5% carry the marker word
    texts: list[str] = []
    dup_pool: list[str] = []
    for i in range(n_doc):
        if is_dup_doc[i] and dup_pool and rng.random() < 0.064:
            texts.append(dup_pool[rng.integers(0, len(dup_pool))])  # exact copy
            continue
        ws = [VOCAB[w] for w in words[starts[i]: starts[i] + lens[i]]]
        if is_dup_doc[i]:
            ws[rng.integers(0, len(ws))] = "dup"
            t = " ".join(ws)
            dup_pool.append(t)
        else:
            t = " ".join(ws)
        texts.append(t)
    _write(pd.DataFrame({
        "doc_id": np.arange(n_doc, dtype=np.int64),
        "text": texts,
        "lang": rng.choice(["en", "zh", "es", "fr", "de"], n_doc,
                           p=[0.4, 0.15, 0.15, 0.15, 0.15]),
        "source": [f"src{i % 20}" for i in range(n_doc)],
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
    }), outdir, "documents")

    # ---- embeddings (unit-normalised gaussians, labels 0..9) ----------
    emb = rng.standard_normal((n_emb, 64)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    _write(pd.DataFrame({
        "vec_id": np.arange(n_emb, dtype=np.int64),
        "embedding": list(emb),
        "label": rng.integers(0, 10, n_emb).astype(np.int64),
    }), outdir, "embeddings")

    open(os.path.join(outdir, "_DONE"), "w").close()


if __name__ == "__main__":
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    out = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/testdata_synth/sf{sf}"
    print(f"generating sf={sf} -> {out}")
    generate(sf, out)
