"""Structured Streaming surface.

The reference has no streaming (SURVEY.md §2.K) — its analogue is
batch resumability (geospark.run.pipeline).  A 100 TB training-data
pipeline still wants incremental ingest, so the engine exposes the
standard streaming shapes over the same operators:

  stream_pages → geocode (same mapInPandas kernel works on streams) →
  windowed tile counts with watermarks.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, functions as F


def windowed_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 hour",
    watermark: str = "2 hours",
    value_col: Optional[str] = None,
) -> DataFrame:
    """Tumbling-window counts (+ optional sum) with late-data
    watermarking; works identically on batch and streaming frames."""
    d = events
    if d.isStreaming:
        # watermarks need TIMESTAMP (parquet often lands TIMESTAMP_NTZ)
        d = d.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        d = d.withWatermark(ts_col, watermark)
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if value_col is not None:
        aggs.append(
            F.sum(F.round(F.col(value_col) * 100).cast("long")).alias("cents_sum")
        )
    return d.groupBy(F.window(F.col(ts_col), window).alias("w"), F.col(key_col)).agg(
        *aggs
    ).select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        key_col,
        *[c for c in ("n_events", "cents_sum") if value_col is not None or c == "n_events"],
    )


def stream_tile_counts(
    points_stream: DataFrame,
    ts_col: str,
    level: int = 14,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
    grid=None,
) -> DataFrame:
    """Streaming hypertable-style rollup: points → Z-order cell →
    windowed per-cell counts."""
    from ..ops.tiling import assign_tiles

    kwargs = {"grid": grid} if grid is not None else {}
    d = assign_tiles(points_stream, level=level, **kwargs)
    if d.isStreaming:
        d = d.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        d = d.withWatermark(ts_col, watermark)
    return (
        d.groupBy(F.window(F.col(ts_col), window).alias("w"), F.col("cell_id"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            "cell_id",
            "n",
        )
    )
