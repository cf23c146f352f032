#!/usr/bin/env python
"""Capture .explain('formatted') for headline queries into plans/r13/."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from big_data_project_jan_2026_tick_data__spark import get_spark  # noqa: E402
from big_data_project_jan_2026_tick_data__spark.registry import QUERIES  # noqa: E402

SUFFIX = sys.argv[1] if len(sys.argv) > 1 else "before"
NAMES = sys.argv[2:] or [
    "tpch_q1",
    "tpch_q3_top10",
    "tpch_q5_region_revenue",
    "tpch_q9_product_profit",
    "tpch_q21_sole_fault_supplier",
    "ticks_downsample_1min",
    "ticks_ohlc_bars",
    "ticks_rolling_stats",
    "ticks_daily_window_counts",
    "ticks_sessionize",
    "window_lag_lead_rank",
    "asof_purchase_last_click",
    "doc_exact_dedup",
    "doc_minhash_pairs",
    "emb_lsh_topk",
    "emb_ivf_topk",
    "doc_quality_scores",
    "doc_line_dedup",
    "doc_lm_perplexity",
    "events_mann_whitney",
]

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r13")
os.makedirs(OUT, exist_ok=True)

spark = get_spark(app_name="plan-capture-r13")
for name in NAMES:
    try:
        df = QUERIES[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
    except Exception as exc:  # noqa: BLE001
        plan = f"ERROR: {type(exc).__name__}: {exc}"
    with open(os.path.join(OUT, f"{name}_{SUFFIX}.txt"), "w") as fh:
        fh.write(plan)
    print(f"{name}: {len(plan)} chars")
spark.stop()
