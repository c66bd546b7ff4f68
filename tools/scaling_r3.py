"""Round-3 scaling evidence: the same jobs at two pinned parallelism
levels (the sandbox proxy for N vs 4N executors per BASELINE.json's
north rule — no real cluster exists here).

Usage: taskset -c 0-(N-1) python tools/scaling_r3.py <cpus> [n_pages]

Measures, at local[cpus]:
  flagship  — geocode+PIP+tile over the cached n_pages table
  minhash_pairs / knn / pip_join — the three most expensive sf0.1
    driver queries (VERDICT round-2 ask: per-query scaling, not just
    the flagship)
Prints one JSON line; pair two invocations (8, 32) to compute
T(N)/(4*T(4N)) efficiency.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    n_pages = int(sys.argv[2]) if len(sys.argv) > 2 else 64_000_000
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from geospark.session import build_session

    spark = build_session("scaling-r3", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    from geospark.cells.cellid import DEFAULT_GRID
    from geospark.io.pages import generate_districts
    from geospark.ops.flagship import geocode_pip_tile_jvm
    from geospark.ops.joins import choose_level
    from geospark.queries import registry

    out = {"cpus": cpus, "pages": n_pages}

    pages_path = f"/tmp/geospark_bench_pages_{n_pages}.parquet"
    districts = generate_districts(spark, 2000)
    districts.persist().count()
    level = choose_level(districts, "geom", DEFAULT_GRID)

    def flagship():
        return geocode_pip_tile_jvm(
            spark.read.parquet(pages_path), districts, level=level,
            tile_level=14, include_url=False,
        ).count()

    flagship()  # warm
    runs = []
    for _ in range(2):
        t0 = time.time()
        flagship()
        runs.append(time.time() - t0)
    out["flagship_best"] = round(min(runs), 3)
    out["flagship_pages_per_sec"] = round(n_pages / min(runs), 1)

    qs = registry()
    for name in ("minhash_pairs", "knn", "pip_join"):
        best = None
        for _ in range(3):
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 3)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
