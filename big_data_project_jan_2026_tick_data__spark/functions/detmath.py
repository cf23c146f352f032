"""Cross-engine deterministic transcendental math.

Problem this solves: libm ``log``/``log2``/``pow`` are NOT correctly
rounded and differ by 1-2 ulp between the JVM (Spark executors) and
DuckDB (the correctness oracle).  Any query that snaps such a value to
an integer grid — ``FLOOR(f(x) * 1e9 + 0.5)`` — can flip a grid cell on
a 1-ulp disagreement and hash-mismatch the oracle (the r4/r5
``doc_token_entropy`` / ``doc_mixture_weights`` / ``doc_distinctive_terms``
failures).  Quantizing more coarsely only shrinks the probability; it
never removes it.

Fix: evaluate the logarithm with ONLY operations IEEE-754 requires to
be correctly rounded — ``+ - * /`` on doubles, integer bit shifts,
string length of an exact binary rendering, and comparisons.  Both
engines then produce BIT-IDENTICAL doubles, so a grid snap can never
flip, by construction rather than by probability.

Recipe (classic argument reduction + atanh series):

    x = 2^e * m,  m in [1, 2)       e from length(bin(floor(x))) - 1
    z = (m - 1) / (m + 1)           z in [0, 1/3)
    ln(m)  = 2 * atanh(z) = 2 * z * P(z^2)
    P(u)   = 1 + u/3 + u^2/5 + ... (Horner, fixed literal coefficients)
    ln(x)  = e * ln(2) + ln(m)
    log2(x)= e + 2 * z * P(z^2) * (1/ln 2)

Every step is one of the exact ops above; the series truncation error
with 13 terms is < 7e-15 at z = 1/3 (m -> 2), i.e. libm-grade accuracy,
and — the actual point — the SAME error on both engines.

The expressions are emitted as SQL text from ONE shared recipe with
engine-specific spellings only for the power-of-two shift, so the
evaluation order (and hence every intermediate double) is structurally
identical.  The Spark side consumes them via ``F.expr``.

Why this is in scope for a 100 TB engine, not just oracle pedantry:
deterministic scoring makes retries/speculative re-execution and
incremental recomputation idempotent — a re-run task that re-derives a
quality score must land in the same sample/bucket, or downstream
dedup/split decisions churn.

No counterpart in the reference (its single-process pandas/numpy stack
never faces cross-engine float drift); motivated by its determinism
posture (fixed seeds throughout, e.g. ML Model/Scripts/train.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Correctly-rounded double literals; rendered with _dlit() so both
# engines parse the identical string to the identical double.
LN2 = 0.6931471805599453
INV_LN2 = 1.4426950408889634


def _dlit(x: float) -> str:
    """Render a float as a scientific-notation literal.  Plain decimal
    literals (``0.3333333333333333``) parse as DECIMAL in DuckDB and
    reach the double lane through a decimal->double conversion whose
    rounding is an implementation detail; scientific notation parses
    directly as DOUBLE via a correctly-rounded strtod in both engines,
    so the literal's bits are identical by spec, not by luck.  17
    significant digits guarantee an exact double round-trip."""
    return f"{x:.17e}"


# Public alias: registry oracles use it to render constants (e.g. the
# Dirichlet alpha) as the exact same double Spark's F.lit() produces.
dlit = _dlit

# Terms of atanh(z) = z * sum_k z^(2k) / (2k+1), k = 0..N_TERMS-1.
# z <= 1/3 so truncation < (1/3)^(2N+1) / (2N+1) / (1 - 1/9) ~ 7e-15.
N_TERMS = 13

_ENGINES = ("spark", "duckdb")


def _shl1(e_sql: str, engine: str) -> str:
    """``CAST(1 AS BIGINT) << e`` in each engine's spelling (exact)."""
    if engine == "spark":
        return f"shiftleft(CAST(1 AS BIGINT), {e_sql})"
    return f"(CAST(1 AS BIGINT) << {e_sql})"


def _horner(z2_sql: str) -> str:
    """P(z2) = 1 + z2/3 + z2^2/5 + ... evaluated innermost-first; the
    scientific-notation coefficient literals parse to the same double in
    both engines, and the multiply/add chain is written (hence
    evaluated) in the same order in both."""
    coeffs = [1.0 / (2 * k + 1) for k in range(N_TERMS)]
    expr = _dlit(coeffs[-1])
    for c in reversed(coeffs[:-1]):
        expr = f"({_dlit(c)} + {z2_sql} * {expr})"
    return expr


def _log2_mantissa(m_sql: str) -> str:
    """log2(m) for m in [1, 2) as ``2 * z * P(z^2) * (1/ln2)``."""
    z = f"(({m_sql} - 1.0) / ({m_sql} + 1.0))"
    z2 = f"({z} * {z})"
    return f"((2.0 * {z} * {_horner(z2)}) * {_dlit(INV_LN2)})"


def _ln_mantissa(m_sql: str) -> str:
    """ln(m) for m in [1, 2) as ``2 * z * P(z^2)``."""
    z = f"(({m_sql} - 1.0) / ({m_sql} + 1.0))"
    z2 = f"({z} * {z})"
    return f"(2.0 * {z} * {_horner(z2)})"


def det_log2_int_sql(x_sql: str, engine: str) -> str:
    """SQL text for log2(x) where ``x_sql`` is an INTEGER expression
    >= 1 (token counts, vocab sizes).  Keep ``x_sql`` a short column
    reference — it is textually repeated by the expansion."""
    if engine not in _ENGINES:
        raise ValueError(f"engine must be one of {_ENGINES}, got {engine!r}")
    e = f"(length(bin(CAST({x_sql} AS BIGINT))) - 1)"
    m = f"(CAST({x_sql} AS DOUBLE) / CAST({_shl1(e, engine)} AS DOUBLE))"
    return f"(CAST({e} AS DOUBLE) + {_log2_mantissa(m)})"


def det_ln_pos_sql(q_sql: str, engine: str, assume_ge_1: bool = False) -> str:
    """SQL text for ln(q) where ``q_sql`` is a strictly positive DOUBLE
    expression.  Domain: q in [~1e-18, 9.2e18) — q (or 1/q) must floor
    into a BIGINT.  ``assume_ge_1=True`` skips the 1/q inversion branch
    (smaller expression) when the caller guarantees q >= 1.

    Keep ``q_sql`` a short column reference — it is textually repeated
    ~60 times by the expansion."""
    if engine not in _ENGINES:
        raise ValueError(f"engine must be one of {_ENGINES}, got {engine!r}")
    if assume_ge_1:
        q1 = f"(CAST({q_sql} AS DOUBLE))"
        sign = None
    else:
        q1 = (
            f"(CASE WHEN {q_sql} >= 1.0 THEN CAST({q_sql} AS DOUBLE) "
            f"ELSE 1.0 / {q_sql} END)"
        )
        sign = f"(CASE WHEN {q_sql} >= 1.0 THEN 1.0 ELSE -1.0 END)"
    e = f"(length(bin(CAST(FLOOR({q1}) AS BIGINT))) - 1)"
    m = f"({q1} / CAST({_shl1(e, engine)} AS DOUBLE))"
    ln1 = f"(CAST({e} AS DOUBLE) * {_dlit(LN2)} + {_ln_mantissa(m)})"
    return ln1 if sign is None else f"({sign} * {ln1})"


def det_log2_int(col_name: str) -> Column:
    """Spark Column: deterministic log2 of integer column >= 1."""
    return F.expr(det_log2_int_sql(col_name, "spark"))


def det_ln_pos(col_name: str, assume_ge_1: bool = False) -> Column:
    """Spark Column: deterministic ln of a positive double column."""
    return F.expr(det_ln_pos_sql(col_name, "spark", assume_ge_1=assume_ge_1))


# Terms of exp(r) = sum_n r^n / n!, r in [0, ln2): r^17/17! < 6e-18,
# so 17 terms reach double precision with margin.
EXP_TERMS = 17


def _exp_reduced(r_sql: str) -> str:
    """exp(r) for r in [0, ln 2) as a Horner factorial series."""
    coeffs = []
    fact = 1.0
    for n in range(EXP_TERMS):
        coeffs.append(1.0 / fact)
        fact *= n + 1
    expr = _dlit(coeffs[-1])
    for c in reversed(coeffs[:-1]):
        expr = f"({_dlit(c)} + {r_sql} * {expr})"
    return expr


def det_exp2_sql(h_sql: str, engine: str) -> str:
    """SQL text for 2^h where ``h_sql`` is a DOUBLE expression with
    |h| <= 60 (the integer part is materialized via exact bit shifts;
    callers with wider domains clamp first — by 2^±60 every consumer
    here has saturated anyway).  h = k + f with k = FLOOR(h) and
    f in [0, 1): 2^h = 2^k * exp(f * ln 2) — shift, multiply, and a
    factorial Horner series, all IEEE-exact-or-identically-written ops.

    Keep ``h_sql`` a short column reference — it is textually repeated
    ~40 times by the expansion."""
    if engine not in _ENGINES:
        raise ValueError(f"engine must be one of {_ENGINES}, got {engine!r}")
    k = f"(CAST(FLOOR({h_sql}) AS BIGINT))"
    # 2^k for k in [-60, 60]: exact shifts; negative k divides (powers
    # of two divide exactly in binary floating point)
    p2k = (
        f"(CASE WHEN {k} >= 0 THEN CAST({_shl1(k, engine)} AS DOUBLE) "
        f"ELSE 1.0 / CAST({_shl1(f'(0 - {k})', engine)} AS DOUBLE) END)"
    )
    r = f"(({h_sql} - CAST({k} AS DOUBLE)) * {_dlit(LN2)})"
    return f"({p2k} * {_exp_reduced(r)})"


def det_exp_sql(x_sql: str, engine: str) -> str:
    """SQL text for e^x via 2^(x / ln 2); |x| <= 41 (consumers clamp —
    the logistic sigmoid saturates to 0/1 far before that)."""
    return det_exp2_sql(f"({x_sql} * {_dlit(INV_LN2)})", engine)


def det_exp2(col_name: str) -> Column:
    """Spark Column: deterministic 2^h of a double column, |h| <= 60."""
    return F.expr(det_exp2_sql(col_name, "spark"))


def det_exp(col_name: str) -> Column:
    """Spark Column: deterministic e^x of a double column, |x| <= 41."""
    return F.expr(det_exp_sql(col_name, "spark"))


def det_log2_pos_sql(q_sql: str, engine: str, assume_ge_1: bool = False) -> str:
    """SQL text for log2(q) of a strictly positive DOUBLE expression:
    detmath ln(q) scaled by the 1/ln2 literal (same domain/caveats as
    ``det_ln_pos_sql``)."""
    return f"({det_ln_pos_sql(q_sql, engine, assume_ge_1=assume_ge_1)} * {_dlit(INV_LN2)})"


def det_log2_pos(col_name: str, assume_ge_1: bool = False) -> Column:
    """Spark Column: deterministic log2 of a positive double column."""
    return F.expr(det_log2_pos_sql(col_name, "spark", assume_ge_1=assume_ge_1))
