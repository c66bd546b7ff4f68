"""Physical-plan shape assertions — the 100 TB posture, checked in CI:

- the flagship pipeline has ZERO exchanges before its aggregate
  (scan → codegen'd regex → one python stage against a broadcast index)
- parquet scans receive pushed filters and pruned schemas
- the small-dim side of the candidate join broadcasts
- pure-Catalyst operators stay inside WholeStageCodegen
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from geospark.geom import core as C


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_of(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_flagship_plan_has_no_shuffle(spark):
    from geospark.io.pages import generate_districts, generate_pages
    from geospark.ops.flagship import geocode_pip_tile_jvm

    pages = generate_pages(spark, 1000)
    districts = generate_districts(spark, 50)
    out = geocode_pip_tile_jvm(pages, districts, tile_level=14)
    p = plan_of(out)
    assert "Exchange" not in p, p
    assert "MapInPandas" in p
    # exactly ONE python stage (fused geocode+cells+PIP+tile refine);
    # the pages generator itself is a second MapInPandas upstream
    assert p.count("MapInPandas") <= 2


def test_parquet_scan_pushdown_and_pruning(spark, sf_dir_001):
    d = (
        spark.read.parquet(f"{sf_dir_001}/documents.parquet")
        .where(F.col("doc_id") < 100)
        .select("doc_id", "lang")
    )
    p = plan_of(d)
    assert "PushedFilters: [" in p and "LessThan(doc_id,100)" in p, p
    # column pruning: text (the wide column) must not be read
    assert "ReadSchema" in p and "text" not in p.split("ReadSchema")[1][:200], p


def test_candidate_join_broadcasts_small_dim(spark, sf_dir_001):
    # the cell equi-join in pip_join's shuffle-free broadcast=False
    # variant: Catalyst must still broadcast the (tiny) build side
    from geospark.ops.joins import pip_join
    from geospark.queries import customer_points, nation_boxes

    pts = customer_points(spark, sf_dir_001)
    polys = nation_boxes(spark, sf_dir_001)
    out = pip_join(
        pts, polys, point_id="c_custkey", x_col="x", y_col="y",
        poly_id="poly_id", poly_geom="geom", broadcast=False,
    )
    p = plan_of(out)
    assert "BroadcastHashJoin" in p or "BroadcastExchange" in p, p


def test_make_grid_is_pure_codegen(spark):
    from geospark.ops.tiling import make_grid_df

    g = make_grid_df(spark, 0.0, 0.0, 10000.0, 10000.0, 1000.0)
    p = plan_of(g)
    # pure Catalyst: no python stage, no shuffle (the Range×Range cross
    # join broadcasts; AQE hides codegen spans until the final plan)
    assert "MapInPandas" not in p, p
    assert "hashpartitioning" not in p, p
    assert "Range" in p


@pytest.fixture(scope="module")
def sf_dir_001():
    return "/root/testdata/sf0.001"
