"""Flagship stage decomposition at the bench's pages table (guide §1).

Times, with the noop sink:
  A. parquet scan of (page_id, html) only
  B. A + JVM regex extraction to (page_id, x, y)
  C. full flagship (extract + broadcast CSR cell join + PIP + tile)
  D. C variant: extraction expression evaluated once vs filter+project

Usage: python tools/profile_flagship_r6.py [n_pages]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def t(fn, runs=3):
    fn()  # warmup
    rs = []
    for _ in range(runs):
        t0 = time.time()
        fn()
        rs.append(round(time.time() - t0, 3))
    return rs


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 160_000_000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from pyspark.sql import functions as F

    from geospark.io.pages import generate_districts
    from geospark.ops.flagship import _extract_points_jvm, geocode_pip_tile_jvm
    from geospark.ops.joins import choose_level
    from geospark.cells.cellid import DEFAULT_GRID
    from geospark.session import build_session

    os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
    spark = build_session("profile-flagship", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    pages_path = f"/tmp/geospark_bench_pages_{n_pages}.parquet"
    out = {}

    districts = generate_districts(spark, 2000)
    districts.persist().count()
    level = choose_level(districts, "geom", DEFAULT_GRID)

    spark.sparkContext.setJobDescription("A: scan html only")
    out["A_scan"] = t(lambda: noop(spark.read.parquet(pages_path).select("page_id", "html")))

    spark.sparkContext.setJobDescription("B: scan+regex extract")
    out["B_extract"] = t(
        lambda: noop(_extract_points_jvm(spark.read.parquet(pages_path), include_url=False))
    )

    spark.sparkContext.setJobDescription("C: full flagship")
    out["C_full"] = t(
        lambda: geocode_pip_tile_jvm(
            spark.read.parquet(pages_path), districts, level=level,
            tile_level=14, include_url=False,
        ).count()
    )

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
