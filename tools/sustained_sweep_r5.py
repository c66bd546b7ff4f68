"""Round-5 sustained sweep at >=512M pages (VERDICT r4 #5).

The driver metric names a 1e9-row sample; disk holds 41 GB free and
512M pages of parquet would need ~48 GB, so the sweep scans the
cached 256M-page parquet K times via a UNION of page_id-shifted
aliases — a true K*256M-row pipeline execution (every row scanned,
geocoded, joined, tiled) without K*24 GB of disk.  Row content
repeats; per-row work and shuffle/state behavior (there is none —
the flagship plan is shuffle-free) are identical to distinct rows.

Usage: taskset -c 0-31 python tools/sustained_sweep_r5.py [K ...]
Prints one JSON line per K (K=1 is the 256M reference point).
"""

from __future__ import annotations

import json
import os
import resource
import sys
import time
from functools import reduce

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = 256_000_000
PARQUET = f"/tmp/geospark_bench_pages_{BASE}.parquet"


def main():
    ks = [int(a) for a in sys.argv[1:]] or [1, 2, 4]
    from pyspark.sql import functions as F

    from geospark.cells.cellid import DEFAULT_GRID
    from geospark.io.pages import generate_districts, generate_pages
    from geospark.ops.flagship import geocode_pip_tile_jvm
    from geospark.ops.joins import choose_level
    from geospark.session import build_session

    spark = build_session("sustained-r5", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.isdir(PARQUET):
        generate_pages(spark, BASE).repartition(256).write.mode("overwrite").parquet(PARQUET)
    districts = generate_districts(spark, 2000)
    districts.persist().count()
    level = choose_level(districts, "geom", DEFAULT_GRID)

    # warm the python worker pool + JIT on a small slice
    base = spark.read.parquet(PARQUET)
    geocode_pip_tile_jvm(
        base.limit(2_000_000), districts, level=level, tile_level=14, include_url=False
    ).count()

    for k in ks:
        parts = [base] + [
            base.withColumn("page_id", F.col("page_id") + F.lit(i * BASE))
            for i in range(1, k)
        ]
        pages = reduce(lambda x, y: x.unionByName(y), parts)
        t0 = time.time()
        n_out = geocode_pip_tile_jvm(
            pages, districts, level=level, tile_level=14, include_url=False
        ).count()
        wall = time.time() - t0
        rss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
        print(
            json.dumps(
                {
                    "pages": k * BASE,
                    "wall_sec": round(wall, 2),
                    "pages_per_sec": round(k * BASE / wall, 0),
                    "join_rows": n_out,
                    "driver_py_maxrss_gb": round(rss_gb, 2),
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
