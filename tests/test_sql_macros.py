"""Plain-SQL function surface: row-for-row parity with the Column
operators it mirrors, codegen residency (no Python UDF in the plan),
and idempotent registration."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_project_jan_2026_tick_data__spark.functions import scalars, sql_macros
from big_data_project_jan_2026_tick_data__spark.operators import dedup, text
from big_data_project_jan_2026_tick_data__spark.sources.catalog import (
    register_testdata_views,
)


def _setup(spark, sf_dir):
    register_testdata_views(spark, sf_dir)
    sql_macros.register_sql_functions(spark)


def test_text_macros_match_column_operators(spark, sf_dir):
    _setup(spark, sf_dir)
    sql_rows = spark.sql(
        """SELECT doc_id, token_count(text) AS ws_tokens,
                  word_count(text) AS word_tokens, quality_score(text) AS quality,
                  lang_id(text) AS lang_pred, norm_text(text) AS norm,
                  content_key(text) AS ck,
                  md5_keep(cast(doc_id AS STRING), 0.25) AS keep,
                  minhash_sig8(text) AS sig
           FROM documents"""
    ).collect()
    docs = spark.table("documents")
    df_rows = (
        text.with_lang_id(text.with_quality_score(text.with_token_count(docs)))
        .withColumn("norm", text.normalize_text(F.col("text")))
        .withColumn("ck", F.md5(text.normalize_text(F.col("text"))))
        .withColumn("keep", text._md5_bucket_pred(0.25, "doc_id"))
        .withColumn("sig", dedup.minhash_signature_col("text", 8, 3))
        .collect()
    )
    assert len(sql_rows) == len(df_rows) > 0
    by_id = {r["doc_id"]: r for r in sql_rows}
    for r in df_rows:
        s = by_id[r["doc_id"]]
        assert s["ws_tokens"] == r["ws_tokens"]
        assert s["word_tokens"] == r["word_tokens"]
        assert s["quality"] == r["quality"]
        assert s["lang_pred"] == r["lang_pred"]
        assert s["norm"] == r["norm"]
        assert s["ck"] == r["ck"]
        assert s["keep"] == r["keep"]
        assert s["sig"] == r["sig"]


def test_tick_macros_match_scalars(spark, sf_dir):
    _setup(spark, sf_dir)
    sql_rows = spark.sql(
        """SELECT user_id, session_id(ts) AS sid,
                  clamped_spread(value * 1.01, value) AS sp
           FROM events ORDER BY user_id, ts LIMIT 200"""
    ).collect()
    ev = spark.table("events")
    df_rows = (
        ev.select(
            "user_id",
            "ts",
            scalars.window_id_str(F.col("ts")).alias("sid"),
            scalars.clamped_spread(
                F.col("value") * 1.01, F.col("value")
            ).alias("sp"),
        )
        .orderBy("user_id", "ts")
        .limit(200)
        .collect()
    )
    assert [(r["sid"], r["sp"]) for r in sql_rows] == [
        (r["sid"], r["sp"]) for r in df_rows
    ]


def test_md5_keep_edge_rates(spark, sf_dir):
    _setup(spark, sf_dir)
    row = spark.sql(
        """SELECT sum(CASE WHEN md5_keep(cast(doc_id AS STRING), 1.0) THEN 1 ELSE 0 END) AS all_kept,
                  sum(CASE WHEN md5_keep(cast(doc_id AS STRING), 0.0) THEN 1 ELSE 0 END) AS none_kept,
                  count(*) AS n
           FROM documents"""
    ).first()
    assert row["all_kept"] == row["n"] and row["none_kept"] == 0
    # monotone: every 0.1-kept key is also 0.3-kept
    bad = spark.sql(
        """SELECT count(*) AS c FROM documents
           WHERE md5_keep(cast(doc_id AS STRING), 0.1)
             AND NOT md5_keep(cast(doc_id AS STRING), 0.3)"""
    ).first()["c"]
    assert bad == 0


def test_macros_stay_in_codegen(spark, sf_dir):
    """SQL UDFs must inline as expressions — a BatchEvalPython/ArrowEval
    node would mean the surface silently fell off the JVM fast path."""
    _setup(spark, sf_dir)
    plan = (
        spark.sql("SELECT quality_score(text) AS q, lang_id(text) AS l FROM documents")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan, plan
    # codegen spans render as "*(n)" in executedPlan().toString(); the
    # higher-order-function (lang_id argmax) projection stays
    # expression-interpreted but JVM-side — no Arrow/py4j boundary
    assert "*(1)" in plan, plan


def test_registration_is_idempotent(spark, sf_dir):
    _setup(spark, sf_dir)
    names = sql_macros.register_sql_functions(spark)  # second registration
    assert "quality_score" in names
    assert spark.sql("SELECT quality_score('the cat and the hat') AS q").first()[
        "q"
    ] is not None


def test_chunk_text_macro_matches_operator(spark, sf_dir):
    _setup(spark, sf_dir)
    sql_rows = spark.sql(
        "SELECT doc_id, chunk_text(text, 32, 8) AS chunks FROM documents"
    ).collect()
    op_rows = text.chunk_windows(
        spark.table("documents"), chunk_tokens=32, overlap=8
    ).collect()
    by_doc: dict = {}
    for r in op_rows:
        by_doc.setdefault(r["doc_id"], []).append((r["chunk_idx"], r["chunk_text"]))
    for r in sql_rows:
        expected = [c for _, c in sorted(by_doc[r["doc_id"]])]
        assert list(r["chunks"]) == expected


def test_chunk_text_macro_rejects_bad_window(spark, sf_dir):
    """chunk==overlap used to DIVIDE_BY_ZERO mid-query and overlap>chunk
    silently dropped trailing tokens — the macro now asserts like its
    operator twin."""
    import pytest

    _setup(spark, sf_dir)
    with pytest.raises(Exception) as exc:
        spark.sql("SELECT chunk_text(text, 3, 3) FROM documents LIMIT 1").collect()
    assert "overlap" in str(exc.value)
