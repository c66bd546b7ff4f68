"""Round-6 scale demo: rtree-windowed GPKG read vs full scan, composed
with pip_join downstream (VERDICT item 7's measurement half; no new
declared query — optimization rounds do not add features).

Writes a 5M-point GPKG with a spatial index (exercising the round-6
build-scoped rtree page cache), then times read_gpkg(bbox=...) ->
count and read_gpkg(bbox=...) -> pip_join at two window sizes against
the full-scan equivalents.  Output: BENCH/round6_bbox_window.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 5_000_000
GPKG = "/tmp/geospark_r6_bbox_demo.gpkg"


def main():
    from pyspark.sql import functions as F

    from geospark.io.gpkg import read_gpkg, write_gpkg
    from geospark.io.pages import generate_districts
    from geospark.ops.joins import pip_join
    from geospark.session import build_session

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_session("bbox-demo", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    out = {"n_rows": N, "cpus": cpus}

    if os.path.exists(GPKG):
        os.unlink(GPKG)
    # deterministic points over the OSGB-ish plane used by the bench
    pts = spark.range(N).select(
        F.col("id").alias("pid"),
        (F.pmod(F.xxhash64("id"), 700000) + 0.5).cast("double").alias("x"),
        (F.pmod(F.xxhash64("id", F.lit(1)), 1300000) + 0.5).cast("double").alias("y"),
    )
    from geospark.functions import st_point

    wkb = pts.select("pid", st_point(F.col("x"), F.col("y")).alias("geom"), "x", "y")
    t0 = time.time()
    write_gpkg(wkb, GPKG, "pts", geom_col="geom", srid=27700, add_spatial_index=True)
    out["write_with_rtree_sec"] = round(time.time() - t0, 2)

    districts = generate_districts(spark, 2000)
    districts.persist().count()

    def timed(label, fn):
        fn()  # warm
        t0 = time.time()
        r = fn()
        out[label] = round(time.time() - t0, 2)
        return r

    full = lambda: read_gpkg(spark, GPKG, "pts").count()  # noqa: E731
    out["full_rows"] = read_gpkg(spark, GPKG, "pts").count()
    timed("full_scan_count_sec", full)
    # ~1% and ~10% area windows
    for frac, (x1, y1) in {"1pct": (70000, 130000), "10pct": (221500, 411000)}.items():
        bbox = (0.0, 0.0, float(x1), float(y1))
        cnt = read_gpkg(spark, GPKG, "pts", bbox=bbox).count()
        out[f"window_{frac}_rows"] = cnt
        timed(f"window_{frac}_count_sec", lambda: read_gpkg(spark, GPKG, "pts", bbox=bbox).count())
        # composed: windowed read -> pip_join vs full read -> pip_join
        def composed(src_bbox=bbox):
            src = read_gpkg(spark, GPKG, "pts", bbox=src_bbox).select("pid", "x", "y")
            return pip_join(src, districts, point_id="pid", x_col="x", y_col="y").count()
        timed(f"window_{frac}_pip_join_sec", composed)
    def composed_full():
        src = read_gpkg(spark, GPKG, "pts").select("pid", "x", "y")
        return pip_join(src, districts, point_id="pid", x_col="x", y_col="y").count()
    timed("full_pip_join_sec", composed_full)

    spark.stop()
    os.unlink(GPKG)
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH", "round6_bbox_window.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
