"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  → flagship pipeline on /root/testdata/sf0.001:
  synthetic CC-style pages → vectorized geocode → cell-join PIP vs
  districts → Z-order tile assignment.
queries()     → operator surface (SURVEY.md §2 + training-data ops);
oracle_sql()  → DuckDB equivalents (omitted only for genuinely
  non-SQL-expressible geometric/approximate ops → rows-only check).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from pyspark.sql import functions as F

    from geospark.extract.geocode import geocode_pages
    from geospark.io.pages import generate_districts, generate_pages
    from geospark.ops.joins import pip_join
    from geospark.ops.tiling import assign_tiles

    sf_dir = "/root/testdata/sf0.001"
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    pages = generate_pages(spark, n_docs * 40)
    geo = geocode_pages(pages)
    pts = geo.where(F.col("kind") == 1).select("page_id", "url", "x", "y")
    districts = generate_districts(spark, 100)
    joined = pip_join(
        pts,
        districts,
        point_id="page_id",
        x_col="x",
        y_col="y",
        poly_id="poly_id",
        poly_geom="geom",
        broadcast=True,
        keep_cols=["url", "x", "y"],
    )
    tiled = assign_tiles(joined, level=14)
    return tiled.select("url", "poly_id", "cell_id")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from geospark.queries import registry

    return registry()


def oracle_sql() -> dict[str, str]:
    from geospark.queries import oracles

    return oracles()
