"""32-way profiling harness for the flagship python stage (VERDICT.md
round-1 ask: attribute the 8→32 efficiency residual).  Sweeps one knob
per invocation over the cached 16M-page table and prints JSON lines.

Usage: python tools/profile_flagship.py <arrow_batch> [n_pages] [cpus]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    n_pages = int(sys.argv[2]) if len(sys.argv) > 2 else 16_000_000
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("profile-flagship")
        .master(f"local[{cpus}]")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(batch))
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from geospark.cells.cellid import DEFAULT_GRID
    from geospark.io.pages import generate_districts
    from geospark.ops.flagship import geocode_pip_tile_jvm
    from geospark.ops.joins import choose_level

    pages_path = f"/tmp/geospark_bench_pages_{n_pages}.parquet"
    districts = generate_districts(spark, 2000)
    districts.persist().count()
    level = choose_level(districts, "geom", DEFAULT_GRID)

    def run():
        pages = spark.read.parquet(pages_path)
        return geocode_pip_tile_jvm(
            pages, districts, level=level, tile_level=14, include_url=False
        ).count()

    run()  # warm
    runs = []
    for _ in range(3):
        t0 = time.time()
        n = run()
        runs.append(round(time.time() - t0, 3))
    print(
        json.dumps(
            {
                "arrow_batch": batch,
                "cpus": cpus,
                "pages": n_pages,
                "join_rows": n,
                "runs": runs,
                "best": min(runs),
                "pages_per_sec": round(n_pages / min(runs), 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
