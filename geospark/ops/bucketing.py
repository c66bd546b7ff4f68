"""Bucketed (co-located) joins — the shuffle-elimination path for
repeated large×large joins on the same key.

At 100 TB the dominant join cost is the shuffle of both sides.  When a
table is joined on the same key repeatedly (cell-keyed features joined
against cell-keyed features or rollups every batch), pre-bucketing
both sides by that key at write time makes every subsequent join a
zero-exchange sort-merge join: each task reads matching bucket files
from both tables, nothing moves over the network.  This is the Spark
analogue of co-partitioned storage in the reference's single-process
world (where everything is trivially "co-located").

Usage shape:
    write_bucketed(features, "features_b", "cell_id", 64, path=...)
    write_bucketed(rollup,   "rollup_b",   "cell_id", 64, path=...)
    joined = bucketed_join(spark, "features_b", "rollup_b", "cell_id")
    # .explain() shows SortMergeJoin with NO Exchange on either side

The bucket count is a layout contract: both tables must use the same
count for exchange-free joins (Spark plans a shuffle for mismatched
counts).  Choose it like shuffle partitions — total data / target
partition size — and keep it stable across writes.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int,
    path: Optional[str] = None,
    mode: str = "overwrite",
    sort: bool = True,
) -> None:
    """Write `df` as a parquet table bucketed (and by default sorted)
    by `bucket_col`.  `path` makes it external — REQUIRED for anything
    long-lived; the default warehouse is a temp dir (session.py)."""
    w = df.write.format("parquet").mode(mode).bucketBy(n_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str,
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucket-count tables on their bucket column.  The
    merge hint pins sort-merge so the plan is the zero-exchange
    bucketed SMJ rather than a broadcast (which would re-plan the
    small side and hide the layout win being exercised)."""
    left = spark.table(left_table).hint("merge")
    right = spark.table(right_table)
    return left.join(right, on, how)
