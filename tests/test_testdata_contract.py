"""Testdata schema canary.

The driver regenerates /root/testdata between rounds and has already
changed physical types once (events.ts: int64-nanos → timestamp[us]),
which silently broke 36 queries. This test reads every table through the
same adapter the registry uses and asserts the LOGICAL dtypes every
query depends on — so the next silent regeneration fails here, loudly
and by name, instead of as 44 cascading query errors.
"""

from __future__ import annotations

import pytest
from pyspark.sql.types import (
    ArrayType,
    ByteType,
    DateType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
    TimestampNTZType,
    TimestampType,
)

from big_data_project_jan_2026_tick_data__spark.registry import _td
from big_data_project_jan_2026_tick_data__spark.sources.io import TESTDATA_TABLES

# Logical type classes queries treat interchangeably.
INT = (ByteType, ShortType, IntegerType, LongType)
NUM = INT + (FloatType, DoubleType)
# date-valued columns: queries only to_date/compare them, so any temporal
# type works — but a silent switch to int64-epoch would not.
TEMPORAL = (DateType, TimestampType, TimestampNTZType)

# column -> required logical type(s), per table; only the columns queries
# actually touch (extra columns are fine, missing/retyped ones are not).
CONTRACT = {
    "events": {
        "event_id": INT,
        # the _td adapter must normalize ANY physical ts to session-TZ
        # TimestampType — NTZ or raw int64 leaking through here is the
        # exact bug that broke 36 queries in round 2.
        "ts": (TimestampType,),
        "user_id": INT,
        "event_type": (StringType,),
        "value": NUM,
        "props": (StringType,),
    },
    "orders": {
        "o_orderkey": INT,
        "o_custkey": INT,
        "o_orderstatus": (StringType,),
        "o_totalprice": NUM,
        "o_orderdate": TEMPORAL,
        "o_orderpriority": (StringType,),
    },
    "lineitem": {
        "l_orderkey": INT,
        "l_partkey": INT,
        "l_suppkey": INT,
        "l_linenumber": INT,
        "l_quantity": NUM,
        "l_extendedprice": NUM,
        "l_discount": NUM,
        "l_tax": NUM,
        "l_returnflag": (StringType,),
        "l_linestatus": (StringType,),
        "l_shipdate": TEMPORAL,
    },
    "customer": {
        "c_custkey": INT,
        "c_name": (StringType,),
        "c_nationkey": INT,
        "c_acctbal": NUM,
        "c_mktsegment": (StringType,),
    },
    "supplier": {
        "s_suppkey": INT,
        "s_name": (StringType,),
        "s_nationkey": INT,
        "s_acctbal": NUM,
    },
    "part": {
        "p_partkey": INT,
        "p_name": (StringType,),
        "p_brand": (StringType,),
        "p_type": (StringType,),
        "p_size": INT,
        "p_retailprice": NUM,
    },
    "nation": {"n_nationkey": INT, "n_name": (StringType,), "n_regionkey": INT},
    "region": {"r_regionkey": INT, "r_name": (StringType,)},
    "documents": {
        "doc_id": INT,
        "text": (StringType,),
        "lang": (StringType,),
        "source": (StringType,),
        "n_chars": INT,
    },
    "embeddings": {
        "vec_id": INT,
        "embedding": (ArrayType,),
        "label": INT,
    },
}


@pytest.mark.parametrize("table", TESTDATA_TABLES)
def test_table_schema_contract(spark, sf_dir, table):
    df = _td(spark, sf_dir, table)
    fields = {f.name: f.dataType for f in df.schema.fields}
    for col, want in CONTRACT[table].items():
        assert col in fields, f"{table}.{col} missing — testdata regenerated?"
        assert isinstance(fields[col], want), (
            f"{table}.{col} is {fields[col]} but queries require one of "
            f"{[t.__name__ for t in want]} — testdata physical schema changed; "
            f"fix the adapter, not 44 tests"
        )
    # one cheap row read so decode errors (not just schema) surface here too
    assert df.limit(1).count() in (0, 1)
