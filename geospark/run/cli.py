"""spark-submit entry point.

Usage:
  spark-submit --py-files geospark.zip -m geospark.run.cli \
      --pages <parquet dir> --districts-n 2000 --out <dir> \
      [--run-id myrun] [--tile-level 14] [--resume]

Runs the flagship pipeline as a resumable staged run (snapshot
checkpoints + lineage); re-invoking with the same --run-id resumes
after the last committed stage.
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", help="pages parquet path (default: synthesize)")
    ap.add_argument("--pages-n", type=int, default=1_000_000)
    ap.add_argument("--districts-n", type=int, default=2000)
    ap.add_argument("--out", required=True, help="catalog root directory")
    ap.add_argument("--run-id", default="flagship")
    ap.add_argument("--tile-level", type=int, default=14)
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    # absolute imports: spark-submit runs this file as a plain script
    # (no parent package); the --py-files zip provides `geospark`
    from geospark.io.pages import generate_districts, generate_pages
    from geospark.ops.flagship import geocode_pip_tile
    from geospark.run.pipeline import Pipeline, catalog_for

    spark = SparkSession.builder.appName("geospark-flagship").getOrCreate()
    # real Iceberg catalog when the runtime jar + config exist (cluster
    # deployments); parquet + atomic-manifest fallback otherwise
    catalog = catalog_for(spark, args.out)
    pipe = Pipeline(spark, catalog, args.run_id)

    def stage_pages(s, outputs):
        if args.pages:
            return s.read.parquet(args.pages)
        return generate_pages(s, args.pages_n)

    def stage_districts(s, outputs):
        return generate_districts(s, args.districts_n)

    def stage_join(s, outputs):
        return geocode_pip_tile(
            outputs["pages"], outputs["districts"], tile_level=args.tile_level
        )

    def stage_tile_counts(s, outputs):
        from pyspark.sql import functions as F

        return outputs["join"].groupBy("cell_id").agg(F.count(F.lit(1)).alias("pages"))

    pipe.stage("pages", stage_pages)
    pipe.stage("districts", stage_districts)
    pipe.stage("join", stage_join)
    pipe.stage("tile_counts", stage_tile_counts)
    out = pipe.run()
    print(f"done: {out['join'].count()} join rows, "
          f"{out['tile_counts'].count()} tiles")
    spark.stop()


if __name__ == "__main__":
    main()
