"""Structured Streaming tests: file-source stream with availableNow,
watermarked windowed aggregation, batch/stream parity."""

import os
import time

import pandas as pd
import pytest
from pyspark.sql import functions as F


def test_windowed_counts_stream_matches_batch(spark, tmp_path):
    from geospark.streaming.windows import windowed_counts

    src = str(tmp_path / "events_src")
    os.makedirs(src)
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    events.write.mode("overwrite").parquet(src)

    batch = windowed_counts(
        spark.read.parquet(src), ts_col="ts", key_col="event_type", value_col="value"
    ).toPandas()

    stream_df = spark.readStream.schema(events.schema).parquet(src)
    out = windowed_counts(stream_df, ts_col="ts", key_col="event_type", value_col="value")
    q = (
        out.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from win_counts").toPandas()

    key = ["window_start", "event_type"]
    b = batch.sort_values(key).reset_index(drop=True)
    g = got.sort_values(key).reset_index(drop=True)
    assert len(b) == len(g) and len(b) > 0
    assert (b["n_events"].to_numpy() == g["n_events"].to_numpy()).all()
    assert (b["cents_sum"].to_numpy() == g["cents_sum"].to_numpy()).all()


def test_stream_tile_counts(spark, tmp_path):
    from geospark.streaming.windows import stream_tile_counts

    src = str(tmp_path / "pts_src")
    pdf = pd.DataFrame(
        {
            "ts": pd.to_datetime([1700000000 + i * 60 for i in range(100)], unit="s"),
            "x": [float((i * 37) % 1000) for i in range(100)],
            "y": [float((i * 91) % 1000) for i in range(100)],
        }
    )
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    out = stream_tile_counts(stream, ts_col="ts", level=10)
    q = (
        out.writeStream.format("memory")
        .queryName("tile_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from tile_counts").toPandas()
    assert got["n"].sum() == 100
    assert (got["cell_id"] >= 0).all()
