from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from big_data_project_jan_2026_tick_data__spark import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    # Partition-layout knobs for the order-independence audit: a
    # different shuffle-partition count and scan-split size reorder
    # every partial aggregate — any query whose result moves under them
    # is a latent driver-environment hash-FAIL (the r4 failure class).
    # Defaults match the historical suite layout.
    parts = int(os.environ.get("SPARK_GRAFT_TEST_SHUFFLE_PARTITIONS", "8"))
    extra = {}
    if os.environ.get("SPARK_GRAFT_TEST_MAX_PARTITION_BYTES"):
        extra["spark.sql.files.maxPartitionBytes"] = os.environ[
            "SPARK_GRAFT_TEST_MAX_PARTITION_BYTES"
        ]
    s = get_spark(app_name="tests", shuffle_partitions=parts, extra_conf=extra)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
