"""Streaming deduplication — first-arrival exact dedup over a
document stream.

The batch analogue is text.dedup.exact_dedup (hash-groupBy keeping
the canonical row); on a stream the same contract is "emit a document
the FIRST time its text hash is seen, drop re-arrivals", with state
bounded by a watermark horizon so the dedup map does not grow without
bound over an unbounded stream.  This is the standard ingest shape for
a training-data pipeline: crawl batches arrive continuously, exact
re-crawls within the horizon are dropped before any downstream
(quality / near-dup / tokenize) work runs.

Scale posture: dropDuplicatesWithinWatermark keys state by the md5
hash only (not the document text), so per-key state is tiny and
partitioned by hash — the same hash-bucketed layout as the batch
groupBy; the watermark bounds total state at (arrival rate × horizon)
keys per partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def dedup_stream(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Keep the first arrival per exact text hash within the watermark
    horizon.  Streaming frames use dropDuplicatesWithinWatermark
    (state expires with the watermark); batch frames fall back to
    plain dropDuplicates on the hash — the batch twin used for parity
    testing."""
    d = docs.withColumn("__h", F.md5(F.col(text_col)))
    if d.isStreaming:
        d = d.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        d = d.withWatermark(ts_col, watermark)
        out = d.dropDuplicatesWithinWatermark(["__h"])
    else:
        out = d.dropDuplicates(["__h"])
    return out.drop("__h")
