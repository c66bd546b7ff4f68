"""Per-query scaling at inputs large enough to out-run the ~1-2 s
fixed stage floor (the sf0.1 driver inputs finish in 1-3 s, which
measures setup, not scaling).

Usage: taskset -c 0-(N-1) python tools/scaling_queries_r3.py <cpus>

  pip_join      64 M points vs 2 000 district polygons
  knn           200 k queries vs 4 M build points (n=5)
  minhash_pairs 1 M synthetic docs, 15 % boilerplate,
                max_bucket=2000 (the production skew-guard mode)
Inputs are deterministic functions of ids; each job runs twice and
reports the best. One JSON line out.
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

    spark = build_session("scaling-q-r3", master=f"local[{cpus}]", shuffle_partitions=cpus)
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

    # ---- pip_join: 64M points vs 2000 districts ----------------------
    from geospark.io.pages import generate_districts
    from geospark.ops.joins import pip_join

    districts = generate_districts(spark, 2000)
    districts.persist().count()
    pts_path = "/tmp/geospark_scaling_pts_64M.parquet"
    if not os.path.isdir(pts_path):
        spark.range(64_000_000).select(
            F.col("id").alias("point_id"),
            ((F.col("id") * 9973) % 99_000_000 / 100.0).alias("x"),
            ((F.col("id") * 7919) % 99_000_000 / 100.0).alias("y"),
        ).repartition(128).write.mode("overwrite").parquet(pts_path)
    pts = spark.read.parquet(pts_path)

    out["pip_join_64M"] = best_of(
        lambda: pip_join(pts, districts, broadcast=True)
        .write.format("noop").mode("overwrite").save()
    )

    # ---- knn: 200k queries vs 4M build points -------------------------
    from geospark.ops.knn import knn_join

    build_path = "/tmp/geospark_scaling_knn_4M.parquet"
    if not os.path.isdir(build_path):
        spark.range(4_000_000).select(
            F.col("id").alias("bid"),
            ((F.col("id") * 6151) % 10_000_000 / 100.0).alias("x"),
            ((F.col("id") * 4093) % 10_000_000 / 100.0).alias("y"),
        ).repartition(64).write.mode("overwrite").parquet(build_path)
    bpts = spark.read.parquet(build_path)
    qpts = spark.range(200_000).select(
        F.col("id").alias("qid"),
        ((F.col("id") * 3571) % 10_000_000 / 100.0).alias("x"),
        ((F.col("id") * 2903) % 10_000_000 / 100.0).alias("y"),
    )
    if os.environ.get("SKIP_KNN") != "1":
        out["knn_200k_vs_4M"] = best_of(
            lambda: knn_join(qpts, bpts, n=5, rng=200.0)
            .write.format("noop").mode("overwrite").save()
        )

    # ---- minhash: 200k docs, 15% boilerplate, capped -------------------
    from geospark.text.dedup import minhash_lsh_pairs

    docs = spark.range(1_000_000).select(
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
    out["minhash_1M_capped"] = best_of(
        lambda: minhash_lsh_pairs(docs, max_bucket=2000)
        .write.format("noop").mode("overwrite").save()
    )

    # ---- winnowing fingerprints, same 1M docs --------------------------
    # (only the fingerprint stage: pair explosion scaling is the same
    # posexplode/repartition/slice shape minhash_1M_capped already
    # measures, and THIS corpus — a template with tiny varying parts —
    # legitimately shares long substrings across most doc pairs, which
    # makes overlap-pair volume quadratic by construction, a corpus
    # property rather than a plan property)
    from geospark.text.fingerprint import winnow_fingerprints

    out["winnow_1M"] = best_of(
        lambda: winnow_fingerprints(docs)
        .write.format("noop").mode("overwrite").save()
    )

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
