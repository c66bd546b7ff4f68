"""Scan-parallelism helper for small-but-expensive inputs.

Parquet scan parallelism is bounded by row-group count: a table written
as one row group (typical for the few-MB documents/embeddings tables)
scans as ONE task no matter how many cores the session has, which
serializes any expensive per-row stage that follows (Python kernels,
regexp batteries, per-row matmuls).  `spread_small_scan` hash-spreads
such an input across the core count; the exchange moves a few MB and
buys back a full stage of parallelism.  It is a no-op when the scan is
already at least core-count-wide (large inputs at scale keep their
natural partitioning), and it uses an EXPLICIT partition count so AQE
does not coalesce the tiny partitions back into one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_small_scan(df: DataFrame, key: str) -> DataFrame:
    """Hash-repartition `df` to the default parallelism when its scan
    would run narrower than that; identity otherwise."""
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par, key)
    return df
