"""Extra benchmark harness (round 6) — NOT the driver contract.

bench.py is frozen for measurement; this file carries the additional
evidence the round-5 verdict asked for:

  1. In-process hardware controls (verdict item 2): a ~2s pure-CPU row
     and a memory-stream row timed in the SAME process and session
     window as the query timings, so every sample self-calibrates —
     a query row that drifts 2x while the controls stay flat is a real
     regression; if the controls drift proportionally it is the host.
  2. Per-query noop-sink isolation runs (guide §1.4) at a chosen SF
     with warm medians, runs and spread, written to
     BENCH/bench_r6_runs.json instead of the driver's stdout line.

Usage:
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python bench_extra.py [out.json]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "pip_join", "tile_assign", "knn", "dedup_exact", "minhash_pairs",
    "ann_cosine", "text_quality", "events_hourly", "geocode",
    "simhash_dups", "cosine_dups", "ann_lsh", "ann_ivf", "sessions",
    "range_query", "media_features", "audio_features", "frame_sample",
    "fingerprint_winnow", "fingerprint_dups", "fingerprint_dups_capped",
    "token_stats", "corpus_clean",
]


def _cpu_task(n: int) -> int:
    acc = 0
    for i in range(n):
        acc = (acc * 6364136223846793005 + i) & ((1 << 64) - 1)
    return acc


def _mem_task(n_copies: int) -> float:
    import numpy as np

    a = np.arange(25_000_000 // 8, dtype=np.float64)  # 25 MB working set
    b = np.empty_like(a)
    for _ in range(n_copies):
        np.copyto(b, a)
        np.copyto(a, b)
    return float(b[-1])


def controls(cpus: int) -> dict:
    """~2s single-process CPU row + parallel memory-stream row, timed
    in-process (the hw_controls.py logic, inlined per verdict item 2)."""
    t0 = time.time()
    _cpu_task(30_000_000)
    cpu_1 = time.time() - t0
    with mp.Pool(cpus) as pool:
        t0 = time.time()
        pool.map(_mem_task, [20] * cpus)
        mem_par = time.time() - t0
    return {"cpu_single_sec": round(cpu_1, 3), "mem_stream_sec": round(mem_par, 3)}


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    q_runs = int(os.environ.get("BENCH_QUERY_RUNS", "5"))
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH", "bench_r6_runs.json"
    )

    from geospark.queries import registry
    from geospark.session import build_session

    os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
    res = {"sf_dir": sf_dir, "cpus": cpus, "controls_pre": controls(cpus)}

    spark = build_session("geospark-bench-extra", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry()
    runs: dict = {}
    med: dict = {}
    spread: dict = {}
    for name in HEADLINE:
        try:
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()  # warmup
            rs = []
            for _ in range(max(q_runs, 1)):
                t0 = time.time()
                qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
                rs.append(time.time() - t0)
            m = sorted(rs)[len(rs) // 2]
            med[name] = round(m, 3)
            runs[name] = [round(r, 3) for r in rs]
            spread[name] = round((max(rs) - min(rs)) / m, 3) if m else 0.0
        except Exception as e:  # pragma: no cover - diagnostic path
            med[name] = f"FAIL:{type(e).__name__}"
        finally:
            spark.sparkContext.setJobDescription(None)
    spark.stop()

    res["controls_post"] = controls(cpus)
    res["queries"] = med
    res["query_runs"] = runs
    res["query_spread"] = spread
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps({"written": out_path, "queries": med,
                      "controls_pre": res["controls_pre"],
                      "controls_post": res["controls_post"]}))


if __name__ == "__main__":
    main()
