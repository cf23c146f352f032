"""Exact (order-independent) aggregation of fixed-decimal doubles.

The money/measure columns in this engine's tables are exact at a known
decimal scale (prices/discounts/balances 2 dp, o_totalprice 4 dp, the
events value 2 dp — verified against the testdata), so their sums can
be EXACT integer arithmetic instead of order-sensitive float sums:
snap each term to its decimal grid (recovers the true decimal — the
double is within ~1e-11 of it, far inside the 0.5 snap margin), sum as
decimal(38,0) (Spark) / auto-HUGEINT (DuckDB), and divide back once.

Why: a float SUM over a large group differs between engines (and
between partitionings) by ~sqrt(n)·eps relative — at sf0.1 a
revenue-sum cell lands within a ROUND(,2) boundary with non-trivial
probability, the same cross-engine flip class the detmath migration
eliminated for transcendentals.  Integer sums are exact in any order,
so the quantized output cannot flip, by construction.

Spark/DuckDB pairs are emitted from one recipe (cf. detmath): the
Spark Column and the oracle SQL string perform structurally identical
arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _pow10(k: int) -> float:
    return float(10**k)


def exact_sum(col: Column, k: int) -> Column:
    """Σ col as exact integer arithmetic on the 10^-k grid, returned as
    DOUBLE.  decimal(38,0) accumulation — no silent BIGINT wrap at any
    corpus size."""
    snapped = F.floor(col * F.lit(_pow10(k)) + F.lit(0.5)).cast("decimal(38,0)")
    return F.sum(snapped).cast("double") / F.lit(_pow10(k))


def exact_sum_sql(expr: str, k: int) -> str:
    """DuckDB mirror of :func:`exact_sum` (SUM(BIGINT) auto-widens to
    HUGEINT — exact)."""
    return (
        f"(CAST(SUM(CAST(FLOOR({expr} * 1e{k} + 0.5) AS BIGINT)) AS DOUBLE)"
        f" / 1e{k})"
    )


def exact_avg(col: Column, k: int) -> Column:
    """Mean over the 10^-k grid: exact sum divided by the non-null
    count — order-independent."""
    snapped = F.floor(col * F.lit(_pow10(k)) + F.lit(0.5)).cast("decimal(38,0)")
    return (F.sum(snapped).cast("double") / F.lit(_pow10(k))) / F.count(col)


def exact_avg_sql(expr: str, k: int) -> str:
    return (
        f"(CAST(SUM(CAST(FLOOR({expr} * 1e{k} + 0.5) AS BIGINT)) AS DOUBLE)"
        f" / 1e{k} / COUNT({expr}))"
    )
