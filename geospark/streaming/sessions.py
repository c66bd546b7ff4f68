"""Custom stateful streaming: per-key session windows via
applyInPandasWithState (the engine's example of a non-windowed
stateful operator; reference has no streaming — SURVEY.md §2.K).

A session closes after `gap_seconds` of silence; closed sessions are
emitted with (user_id, session_start, session_end, n_events).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
    ]
)
STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n", LongType()),
    ]
)


def sessionize(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap_seconds: int = 1800,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming session windows; on a batch DataFrame use
    `sessionize_batch` (same semantics, exercised by the same tests)."""
    from pyspark.sql import functions as F

    d = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    if d.isStreaming:
        d = d.withWatermark(ts_col, watermark)

    gap_us = gap_seconds * 1_000_000

    def fn(
        key: Tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (uid,) = key
        if state.hasTimedOut:
            start_us, last_us, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [uid],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(last_us, unit="us")],
                    "n_events": [n],
                }
            )
            return
        ts_list = []
        for pdf in pdfs:
            ts_list.extend(pdf[ts_col].astype("datetime64[us]").astype("int64").tolist())
        if not ts_list:
            return
        ts_list.sort()
        if state.exists:
            start_us, last_us, n = state.get
        else:
            start_us, last_us, n = ts_list[0], ts_list[0], 0
        out = []
        for t in ts_list:
            if t - last_us > gap_us:
                out.append((uid, start_us, last_us, n))
                start_us, n = t, 0
            last_us = max(last_us, t)
            n += 1
        state.update((start_us, last_us, n))
        state.setTimeoutDuration(gap_seconds * 1000)
        if out:
            yield pd.DataFrame(
                {
                    "user_id": [r[0] for r in out],
                    "session_start": [pd.Timestamp(r[1], unit="us") for r in out],
                    "session_end": [pd.Timestamp(r[2], unit="us") for r in out],
                    "n_events": [r[3] for r in out],
                }
            )

    return d.groupBy(user_col).applyInPandasWithState(
        fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def sessionize_batch(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap_seconds: int = 1800,
    tiebreaker: str = None,
) -> DataFrame:
    """Batch session windows (closed-form with window functions) —
    the oracle-comparable twin of `sessionize`.

    tiebreaker: optional unique column appended to the window ordering
    so runs are deterministic when timestamps tie (required for exact
    cross-engine comparison)."""
    from pyspark.sql import Window, functions as F

    order = [ts_col] + ([tiebreaker] if tiebreaker else [])
    w = Window.partitionBy(user_col).orderBy(*order)
    d = (
        events.withColumn("__prev", F.lag(ts_col).over(w))
        .withColumn(
            "__new",
            (
                F.col("__prev").isNull()
                | (
                    # NTZ timestamps can't cast straight to long in
                    # Spark 4 — route through TimestampType first
                    F.col(ts_col).cast("timestamp").cast("long")
                    - F.col("__prev").cast("timestamp").cast("long")
                    > gap_seconds
                )
            ).cast("int"),
        )
        .withColumn("__sid", F.sum("__new").over(w))
    )
    return d.groupBy(user_col, "__sid").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    ).drop("__sid")
