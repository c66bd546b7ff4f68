"""Round-4 per-query scaling — same queries as scaling_queries_r3 but
4× the input so the ~1.5-2 s fixed stage floor stays <10% of the
32-way wall (the r4 code is ~2× faster than r3, which had shrunk the
r3 sizes into the floor).

Usage: taskset -c 0-(N-1) python tools/scaling_queries_r4.py <cpus>

  pip_join      256 M points vs 2 000 district polygons
  knn           800 k queries vs 16 M build points (n=5)
  minhash       4 M synthetic docs, 15 % boilerplate, max_bucket=2000
  winnow        4 M docs fingerprint stage
Inputs are deterministic functions of ids; each job runs twice after a
warm-up and the best is reported.  One JSON line out.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32

    from pyspark.sql import functions as F

    from geospark.session import build_session

    spark = build_session("scaling-q-r4", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    out = {"cpus": cpus}

    def best_of(fn, runs=2):
        fn()  # warm
        b = None
        for _ in range(runs):
            t0 = time.time()
            fn()
            dt = time.time() - t0
            b = dt if b is None else min(b, dt)
        return round(b, 3)

    # ---- pip_join: 256M points vs 2000 districts ----------------------
    from geospark.io.pages import generate_districts
    from geospark.ops.joins import pip_join

    districts = generate_districts(spark, 2000)
    districts.persist().count()
    pts_path = "/tmp/geospark_scaling_pts_256M.parquet"
    if not os.path.isdir(pts_path):
        spark.range(256_000_000).select(
            F.col("id").alias("point_id"),
            ((F.col("id") * 9973) % 99_000_000 / 100.0).alias("x"),
            ((F.col("id") * 7919) % 99_000_000 / 100.0).alias("y"),
        ).repartition(256).write.mode("overwrite").parquet(pts_path)
    pts = spark.read.parquet(pts_path)

    out["pip_join_256M"] = best_of(
        lambda: pip_join(pts, districts, broadcast=True)
        .write.format("noop").mode("overwrite").save()
    )

    # ---- knn: 800k queries vs 16M build points ------------------------
    from geospark.ops.knn import knn_join

    build_path = "/tmp/geospark_scaling_knn_16M.parquet"
    if not os.path.isdir(build_path):
        spark.range(16_000_000).select(
            F.col("id").alias("bid"),
            ((F.col("id") * 6151) % 10_000_000 / 100.0).alias("x"),
            ((F.col("id") * 4093) % 10_000_000 / 100.0).alias("y"),
        ).repartition(64).write.mode("overwrite").parquet(build_path)
    bpts = spark.read.parquet(build_path)
    qpts = spark.range(800_000).select(
        F.col("id").alias("qid"),
        ((F.col("id") * 3571) % 10_000_000 / 100.0).alias("x"),
        ((F.col("id") * 2903) % 10_000_000 / 100.0).alias("y"),
    )
    out["knn_800k_vs_16M"] = best_of(
        lambda: knn_join(qpts, bpts, n=5, rng=100.0)
        .write.format("noop").mode("overwrite").save()
    )

    # ---- minhash: 4M docs, 15% boilerplate, capped --------------------
    from geospark.text.dedup import minhash_lsh_pairs

    docs = spark.range(4_000_000).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.col("id") % 20 < 3,
            F.lit("standard licence page all rights reserved copyright notice terms of use"),
        ).otherwise(
            F.format_string(
                "article %d body alpha%d beta%d gamma%d delta%d epsilon%d",
                "id", "id", "id", "id", "id", "id",
            )
        ).alias("text"),
    )
    out["minhash_4M_capped"] = best_of(
        lambda: minhash_lsh_pairs(docs, max_bucket=2000)
        .write.format("noop").mode("overwrite").save()
    )

    # ---- winnowing fingerprints, same 4M docs -------------------------
    from geospark.text.fingerprint import winnow_fingerprints

    out["winnow_4M"] = best_of(
        lambda: winnow_fingerprints(docs)
        .write.format("noop").mode("overwrite").save()
    )

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
