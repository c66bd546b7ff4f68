"""Distributed noding wrapper + sessionization tests."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from geospark.geom import core as C, ops as O
from tests.conftest import wkt_set


def test_node_df_exact_mode(spark):
    from geospark.ops.noding_ops import node_df

    lines = pd.DataFrame(
        {
            "line_id": [0, 1],
            "geom": [
                C.to_wkb(C.line_string([[-1, 0], [1, 0]])),
                C.to_wkb(C.line_string([[0, -1], [0, 1]])),
            ],
        }
    )
    out = node_df(spark.createDataFrame(lines)).toPandas()
    assert len(out) == 4
    geoms = [C.from_wkb(b) for b in out["geom"]]
    eps = set()
    for g in geoms:
        for p in O.endpoints_of(g):
            eps.add((p.parts[0, 0], p.parts[0, 1]))
    assert eps == {(-1, 0), (1, 0), (0, 1), (0, -1), (0, 0)}
    # both input lines contribute to segments through the crossing
    assert all(len(s) == 1 for s in out["sources"])


def test_node_df_grouped(spark):
    from geospark.ops.noding_ops import node_df

    lines = pd.DataFrame(
        {
            "net": ["a", "a", "b"],
            "line_id": [0, 1, 2],
            "geom": [
                C.to_wkb(C.line_string([[-1, 0], [1, 0]])),
                C.to_wkb(C.line_string([[0, -1], [0, 1]])),
                C.to_wkb(C.line_string([[100, 100], [101, 101]])),
            ],
        }
    )
    out = node_df(spark.createDataFrame(lines), group_col="net").toPandas()
    # network a noded into 4, network b untouched
    assert len(out) == 5


def test_node_df_tiled_finds_cross_tile_intersections(spark):
    from geospark.cells.cellid import CellGrid
    from geospark.ops.noding_ops import node_df

    grid = CellGrid(0.0, 0.0, 1024.0)  # level 2 → 256-unit tiles
    lines = pd.DataFrame(
        {
            "line_id": [0, 1],
            "geom": [
                # long diagonal crossing several tiles
                C.to_wkb(C.line_string([[10, 300], [700, 300]])),
                C.to_wkb(C.line_string([[400, 10], [400, 600]])),
            ],
        }
    )
    out = node_df(
        spark.createDataFrame(lines), tiled=True, tile_level=2, grid=grid
    ).toPandas()
    geoms = [C.from_wkb(b) for b in out["geom"]]
    # the crossing at (400,300) must be a node: no output segment passes
    # through it as an interior point
    for g in geoms:
        c = g.parts
        for i in range(1, len(c) - 1):
            assert not (c[i, 0] == 400.0 and c[i, 1] == 300.0)
    # union of pieces covers both input lines' length
    total = sum(O.length(g) for g in geoms)
    assert abs(total - (690 + 590)) < 1e-6


def test_sessionize_batch(spark):
    from geospark.streaming.sessions import sessionize_batch

    ev = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 2, 2],
            "ts": pd.to_datetime(
                [0, 600, 10_000, 100, 200], unit="s"
            ),
        }
    )
    out = (
        sessionize_batch(spark.createDataFrame(ev), gap_seconds=1800)
        .orderBy("user_id", "session_start")
        .toPandas()
    )
    assert len(out) == 3  # user1: two sessions (gap 9400s), user2: one
    assert list(out["n_events"]) == [2, 1, 2]


def test_sessionize_streaming(spark, tmp_path):
    from geospark.streaming.sessions import sessionize

    src = str(tmp_path / "sess_src")
    ev = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 2],
            "ts": pd.to_datetime([0, 600, 10_000, 100], unit="s"),
        }
    )
    spark.createDataFrame(ev).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    out = sessionize(stream, gap_seconds=1800)
    q = (
        out.writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from sessions").toPandas()
    # within one micro-batch, user1's first session (2 events) closes
    assert len(got) >= 1
    u1 = got[got["user_id"] == 1]
    assert (u1["n_events"] == 2).any()
