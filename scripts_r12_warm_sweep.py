#!/usr/bin/env python
"""Round-12 registry-wide warm-run sweep: noop-time every registry query
twice at sf0.01 and report (cold, warm) seconds sorted by warm time.
A warm time far below cold is plan/JIT amortization; a warm time near a
large cold one means real recomputation — the signal that found the four
re-execution defects fixed this round.
Usage: python scripts_r12_warm_sweep.py [--sf=/root/testdata/sf0.01] [--top=40]
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
    sf_dir = "/root/testdata/sf0.01"
    top = 40
    for a in sys.argv[1:]:
        if a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]
        elif a.startswith("--top="):
            top = int(a.split("=", 1)[1])
    spark = get_spark(app_name="warm_sweep_r12")
    out = {}
    for name in sorted(QUERIES):
        times = []
        for i in range(2):
            spark.sparkContext.setJobDescription(f"sweep:{name}:{i}")
            t0 = time.perf_counter()
            try:
                QUERIES[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
            except Exception as exc:  # noqa: BLE001
                times.append(f"ERROR:{type(exc).__name__}")
                break
            times.append(round(time.perf_counter() - t0, 3))
        out[name] = times
        print(f"{name}: {times}", flush=True)
    ranked = sorted(
        (
            (v[-1], k, v)
            for k, v in out.items()
            if isinstance(v[-1], float)
        ),
        reverse=True,
    )
    print("\n== top by warm time ==")
    for warm, name, v in ranked[:top]:
        print(f"{warm:8.3f}  {name}  cold={v[0]}")
    print(json.dumps({k: v for _, k, v in ranked[:top]}))
    spark.stop()


if __name__ == "__main__":
    main()
