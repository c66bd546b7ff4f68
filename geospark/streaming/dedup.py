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
    (state expires with the watermark); batch frames keep the
    DETERMINISTIC first arrival — earliest ts, remaining columns as
    tiebreak.

    Parity contract between the two modes: the SET of surviving text
    hashes is identical (both drop every duplicate within the
    horizon), but the surviving ROW per hash can differ when event
    time disagrees with arrival order — the stream keeps the first
    PROCESSING-TIME arrival, the batch twin the min-event-ts row, so
    a late-arriving duplicate with an earlier ts survives in batch
    but not in the stream (same text, possibly different doc_id).
    Row-level parity holds exactly when event-time order == arrival
    order.  Tests assert the text-set contract."""
    d = docs.withColumn("__h", F.md5(F.col(text_col)))
    if d.isStreaming:
        d = d.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        d = d.withWatermark(ts_col, watermark)
        out = d.dropDuplicatesWithinWatermark(["__h"])
    else:
        from pyspark.sql import Window

        tiebreak = [c for c in sorted(docs.columns) if c != ts_col]
        w = Window.partitionBy("__h").orderBy(F.col(ts_col), *tiebreak)
        out = (
            d.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__rn")
        )
    return out.drop("__h")
