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
    from geospark.io.pages import generate_districts, generate_pages
    from geospark.ops.flagship import geocode_pip_tile

    sf_dir = "/root/testdata/sf0.001"
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    pages = generate_pages(spark, n_docs * 40)
    districts = generate_districts(spark, 100)
    out = geocode_pip_tile(pages, districts, tile_level=14)
    return out.select("url", "poly_id", "cell_id")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from geospark.queries import registry

    return registry()


def oracle_sql() -> dict[str, str]:
    from geospark.queries import oracles

    return oracles()
