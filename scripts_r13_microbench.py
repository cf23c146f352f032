#!/usr/bin/env python
"""Round-12 micro-bench: time a subset of headline queries with the exact
bench.py methodology (sf0.001 warmup, best-of-2 at sf0.1, noop sink).
Usage: python scripts_r13_microbench.py q1 q2 ... [--runs N]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from big_data_project_jan_2026_tick_data__spark import get_spark  # noqa: E402
from big_data_project_jan_2026_tick_data__spark.registry import QUERIES  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    runs = 2
    for a in sys.argv[1:]:
        if a.startswith("--runs="):
            runs = int(a.split("=")[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warm_dir = "/root/testdata/sf0.001"
    spark = get_spark(app_name="microbench_r13")
    timings = {}
    for name in args:
        spark.sparkContext.setJobDescription(f"warm:{name}")
        QUERIES[name](spark, warm_dir).write.format("noop").mode("overwrite").save()
    for name in args:
        best = None
        all_runs = []
        for i in range(runs):
            spark.sparkContext.setJobDescription(f"timed:{name}:{i}")
            t0 = time.perf_counter()
            df = QUERIES[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            all_runs.append(round(dt, 3))
            best = dt if best is None else min(best, dt)
        timings[name] = {"best": round(best, 3), "runs": all_runs}
    print(json.dumps(timings, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
