#!/usr/bin/env python
"""Round-13 demo (judge r12 #8): the BPE batch-merge path at a
production-sized vocabulary, vs the sequential oracle path.

`_bpe_train(batch_size=1)` is EXACT sequential greedy BPE — the
semantics the registry queries pin and the DuckDB oracles replay; it
costs one top-pair collect + one merge-apply checkpoint per merge.
`batch_size=m` applies up to m symbol-disjoint merges per pass — a
deliberately different (vocab-scale) training schedule whose exact
semantics are property-tested against a driver-local Python reference
in tests/test_properties.py::test_bpe_batched_matches_python_reference
— cutting the pass count ~m-fold for the production regime
(num_merges in the thousands). This script measures
both at a production-shaped num_merges on the sf0.1 corpus and prints
pass counts + wall time. It does NOT change any registry default — the
oracle-pinned sequential semantics stay the registry surface.

Usage: python scripts_r13_bpe_batch_demo.py [num_merges] [batch_size]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from big_data_project_jan_2026_tick_data__spark import get_spark  # noqa: E402
from big_data_project_jan_2026_tick_data__spark.registry._base import _td  # noqa: E402
from big_data_project_jan_2026_tick_data__spark.operators import text  # noqa: E402


def main() -> None:
    num_merges = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    batch_size = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="bpe_batch_demo")
    docs = _td(spark, sf_dir, "documents")

    def job_count() -> int:
        # DAGScheduler's monotonically increasing job-id counter: the
        # delta across a run is the number of Spark jobs it launched
        return spark.sparkContext._jsc.sc().dagScheduler().nextJobId()

    results = {}
    for label, bs in (("sequential", 1), (f"batch[{batch_size}]", batch_size)):
        j0 = job_count()
        t0 = time.perf_counter()
        merges, words, state, ckpts = text._bpe_train(
            docs, "text", num_merges, batch_size=bs
        )
        dt = time.perf_counter() - t0
        n_jobs = job_count() - j0
        results[label] = (merges, dt, n_jobs)
        ckpts.release_all()
        print(
            f"{label:14s} merges={len(merges)} spark_jobs={n_jobs} "
            f"wall={dt:.1f}s"
        )

    seq = [(a, b) for _, a, b, _, _ in results["sequential"][0]]
    bat = [(a, b) for _, a, b, _, _ in results[f"batch[{batch_size}]"][0]]
    print("merge multiset identical:", sorted(seq) == sorted(bat))
    print("merge sequence identical:", seq == bat)
    spark.stop()


if __name__ == "__main__":
    main()
