"""Similarity search over an embedding column (array<float>).

Brute-force cosine top-k is the exactness baseline; the LSH-bucketed
variant (random-hyperplane signs) is the 100 TB scale path — bucket
equi-join prunes the candidate set, exact cosine re-ranks.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import DoubleType, LongType, StructField, StructType


def _cosine_col(a, b):
    """Cosine similarity between two array<double> columns, sequential
    left-fold (matches the oracle's list-reduction order)."""
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)
    na = F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))
    nb = F.sqrt(F.aggregate(F.transform(b, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))
    return dot / (na * nb)


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    qid: str = "qid",
    cid: str = "cid",
    q_emb: str = "embedding",
    c_emb: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: broadcast the queries, scan the corpus once
    (at 100 TB this is the right plan: one pass, no shuffle of the big
    side; the window is per-query, partitioned on qid)."""
    q = queries.select(
        F.col(qid).alias("__qid"), F.transform(F.col(q_emb), lambda v: v.cast("double")).alias("__qe")
    )
    c = corpus.select(
        F.col(cid).alias("__cid"), F.transform(F.col(c_emb), lambda v: v.cast("double")).alias("__ce")
    )
    pairs = c.crossJoin(F.broadcast(q)).withColumn(
        "sim", F.round(_cosine_col(F.col("__qe"), F.col("__ce")), 6)
    )
    w = Window.partitionBy("__qid").orderBy(F.col("sim").desc(), F.col("__cid").asc())
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(F.col("__qid").alias(qid), F.col("__cid").alias(cid), "sim", "rank")
    )


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    qid: str = "qid",
    cid: str = "cid",
    q_emb: str = "embedding",
    c_emb: str = "embedding",
    dim: int = 64,
    seed: int = 7,
) -> DataFrame:
    """Approximate top-k: random-hyperplane sign buckets (deterministic
    planes from the seed), candidates = same bucket in ≥1 of 2 bands,
    exact cosine re-rank within candidates."""
    rng = np.random.RandomState(seed)
    planes = rng.normal(size=(n_planes, dim)).astype(np.float64)

    @F.pandas_udf(LongType())
    def bucket(emb: pd.Series) -> pd.Series:
        m = np.stack([np.asarray(e, dtype=np.float64) for e in emb])
        signs = (m @ planes.T) > 0
        out = np.zeros(len(m), dtype=np.int64)
        for i in range(n_planes):
            out |= signs[:, i].astype(np.int64) << i
        return pd.Series(out)

    half = n_planes // 2
    lo_mask = (1 << half) - 1

    q = queries.select(
        F.col(qid).alias("__qid"),
        F.transform(F.col(q_emb), lambda v: v.cast("double")).alias("__qe"),
        bucket(F.col(q_emb)).alias("__bk"),
    ).withColumn("__b_lo", F.col("__bk").bitwiseAND(F.lit(lo_mask))).withColumn(
        "__b_hi", F.shiftright("__bk", half)
    )
    c = corpus.select(
        F.col(cid).alias("__cid"),
        F.transform(F.col(c_emb), lambda v: v.cast("double")).alias("__ce"),
        bucket(F.col(c_emb)).alias("__bk"),
    ).withColumn("__b_lo", F.col("__bk").bitwiseAND(F.lit(lo_mask))).withColumn(
        "__b_hi", F.shiftright("__bk", half)
    )
    cand_lo = q.select("__qid", "__qe", "__b_lo").join(
        c.select("__cid", "__ce", "__b_lo"), "__b_lo"
    ).select("__qid", "__qe", "__cid", "__ce")
    cand_hi = q.select("__qid", "__qe", "__b_hi").join(
        c.select("__cid", "__ce", "__b_hi"), "__b_hi"
    ).select("__qid", "__qe", "__cid", "__ce")
    cand = cand_lo.unionAll(cand_hi).dropDuplicates(["__qid", "__cid"])
    cand = cand.withColumn("sim", F.round(_cosine_col(F.col("__qe"), F.col("__ce")), 6))
    w = Window.partitionBy("__qid").orderBy(F.col("sim").desc(), F.col("__cid").asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(F.col("__qid").alias(qid), F.col("__cid").alias(cid), "sim", "rank")
    )
