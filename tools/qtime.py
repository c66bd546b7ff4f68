"""Quick per-query noop-sink timer for optimization iteration (guide §1.4).

Usage: SPARK_GRAFT_SF_DIR=... python tools/qtime.py q1 q2 ... [--runs N] [--explain]
Prints one JSON line: {query: {"median": s, "runs": [...]}}
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    args = [a for a in sys.argv[1:]]
    runs_n = 3
    explain = False
    if "--runs" in args:
        i = args.index("--runs")
        runs_n = int(args[i + 1])
        del args[i:i + 2]
    if "--explain" in args:
        explain = True
        args.remove("--explain")
    names = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from geospark.queries import registry
    from geospark.session import build_session

    os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
    spark = build_session("geospark-qtime", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry()
    out = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"qtime:{name}")
        if explain:
            print(f"==== {name} ====", file=sys.stderr)
            print(qs[name](spark, sf_dir)._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            ), file=sys.stderr)
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()  # warmup
        rs = []
        for _ in range(runs_n):
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            rs.append(round(time.time() - t0, 3))
        out[name] = {"median": sorted(rs)[len(rs) // 2], "runs": rs}
        spark.sparkContext.setJobDescription(None)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
