"""Plain-SQL function surface: the engine's scalar text/dedup/tick
expressions as Spark SQL UDFs (``CREATE TEMPORARY FUNCTION ... RETURN
<expr>``), so a pure-``spark.sql`` user gets the same operators without
touching the DataFrame API — the engine's answer to the reference's
SQL-first Trino surface (`Apache Iceberg/metadata_layer.py`, where every
capability is reachable from SQL alone).

SQL UDFs are expression macros, not Python UDFs: the body inlines into
the caller's plan at analysis time and stays inside whole-stage codegen
(verified by the plan test in tests/test_sql_macros.py), so the SQL
surface has ZERO overhead over the Column builders it mirrors.

Parity discipline: bodies are either generated from the same SQL-string
builders the DataFrame operators use (``dedup.minhash_sig_sql``) or
asserted equal to the Column implementations row-for-row on real
testdata (tests/test_sql_macros.py) — the macro surface cannot drift
silently.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..operators.dedup import minhash_sig_sql

from ..operators.text import normalize_sql

# regex fragments at the SQL-literal level (default Spark escaping:
# '\\w' in SQL text means the two chars backslash-w, i.e. regex \w)
_WORD_RE = "[A-Za-z0-9]+"
_STOP_EN = r"'\\b(the|and|of|to|is|that|with)\\b'"

# quality components over lower(t) — term-for-term the formula of
# text.with_quality_score (and of the shared DuckDB oracle CTE in
# registry/q_docs.py)
_NW = f"coalesce(regexp_count(lower(t), '{_WORD_RE}'), -1)"
_QUALITY_BODY = f"""floor((
    0.35 * least(length(lower(t)) / 2000.0, 1.0)
  + 0.25 * (1.0 - least(coalesce(regexp_count(lower(t), '[^\\\\w\\\\s]'), -1)
                        / greatest(length(lower(t)), 1) * 4.0, 1.0))
  + 0.25 * least(least(coalesce(regexp_count(lower(t), {_STOP_EN}), -1)
                       / greatest({_NW}, 1), 1.0) * 5.0, 1.0)
  + 0.15 * (CASE WHEN coalesce(regexp_count(lower(t), '[A-Za-z0-9]'), -1)
                      / greatest({_NW}, 1) BETWEEN 3.0 AND 10.0
            THEN 1.0 ELSE 0.5 END)) * 1e6 + 0.5) / 1e6"""


def _lang_id_body() -> str:
    """argmax over per-language marker scores via array_max on
    (score, lang) structs — identical tie-breaking to
    text.with_lang_id. The lambda binds the winning struct so it is
    evaluated once (the same 1-element-transform trick as
    dedup.minhash_sig_sql)."""
    markers = {
        "en": "the|and|of|to|is|that|with",
        "de": "der|die|und|das|ist|nicht|mit",
        "fr": "le|la|les|et|est|que|pour",
        "es": "el|los|las|es|una|para|como",
    }
    structs = ", ".join(
        f"named_struct('score', "
        f"coalesce(regexp_count(lower(t), '\\\\b({alts})\\\\b'), -1)"
        f" / greatest({_NW}, 1), 'lang', '{lang}')"
        for lang, alts in markers.items()
    )
    return (
        f"transform(array(array_max(array({structs}))), "
        f"b -> CASE WHEN b.score > 0 THEN b.lang ELSE 'und' END)[0]"
    )


def sql_function_ddls() -> dict[str, str]:
    """name -> CREATE OR REPLACE TEMPORARY FUNCTION statement."""
    norm_t = normalize_sql("t")
    defs = {
        # text analysis (operators/text.py twins)
        "norm_text": ("(t STRING) RETURNS STRING", norm_t),
        "token_count": (
            "(t STRING) RETURNS INT",
            r"CASE WHEN length(trim(t)) = 0 THEN 0 "
            r"ELSE size(split(trim(t), '\\s+')) END",
        ),
        "word_count": (
            "(t STRING) RETURNS INT",
            # outer coalesce is historical; legacy size(NULL) was -1, kept
            f"coalesce(coalesce(regexp_count(t, '{_WORD_RE}'), -1), 0)",
        ),
        "quality_score": ("(t STRING) RETURNS DOUBLE", _QUALITY_BODY),
        "lang_id": ("(t STRING) RETURNS STRING", _lang_id_body()),
        # dedup keys (operators/dedup.py twins)
        "content_key": ("(t STRING) RETURNS STRING", f"md5({norm_t})"),
        "minhash_sig8": (
            "(t STRING) RETURNS ARRAY<BIGINT>",
            minhash_sig_sql("t", num_hashes=8, shingle_n=3),
        ),
        # deterministic sampling predicate (text._md5_bucket_pred twin;
        # rate >= 1 keeps everything — 65536 has no 4-hex-char form)
        "md5_keep": (
            "(k STRING, r DOUBLE) RETURNS BOOLEAN",
            "CASE WHEN r >= 1.0 THEN true ELSE substring(md5(k), 1, 4) < "
            "lower(lpad(hex(cast(floor(r * 65536) AS BIGINT)), 4, '0')) END",
        ),
        # sliding-window chunking (text.chunk_windows twin) — chunk/stride
        # arrive as runtime arguments, proving macros can be parameterized
        "chunk_text": (
            "(t STRING, chunk INT, overlap INT) RETURNS ARRAY<STRING>",
            # assert_true mirrors chunk_windows' ValueError guard: without
            # it chunk==overlap divides by zero mid-query (ANSI) and
            # overlap>chunk silently drops trailing tokens
            f"""CASE WHEN assert_true(chunk > 0 AND overlap >= 0 AND overlap < chunk,
                         'chunk_text: require 0 <= overlap < chunk') IS NULL
            THEN transform(array(split({norm_t}, ' ')), tk ->
              transform(
                sequence(0, CASE WHEN size(tk) <= chunk THEN 0
                         ELSE cast(ceil((size(tk) - chunk)
                                   / cast(chunk - overlap AS DOUBLE)) AS INT) END),
                i -> array_join(slice(tk, i * (chunk - overlap) + 1, chunk), ' ')))[0]
            END""",
        ),
        # tick scalars (functions/scalars.py twins)
        "clamped_spread": (
            "(ask DOUBLE, bid DOUBLE) RETURNS DOUBLE",
            "greatest(ask - bid, cast(0.0 AS DOUBLE))",
        ),
        "session_id": (
            "(ts TIMESTAMP) RETURNS STRING",
            "concat_ws('_', cast(cast(ts AS DATE) AS STRING), "
            "CASE WHEN hour(ts) < 12 THEN 'morning' ELSE 'afternoon' END)",
        ),
    }
    return {
        name: f"CREATE OR REPLACE TEMPORARY FUNCTION {name}{sig} RETURN {body}"
        for name, (sig, body) in defs.items()
    }


def register_sql_functions(spark: SparkSession) -> list[str]:
    """Register (or refresh) every macro in the session; idempotent.
    Returns the registered names."""
    ddls = sql_function_ddls()
    for stmt in ddls.values():
        spark.sql(stmt)
    return sorted(ddls)
