"""Shared fixtures: one local SparkSession for the whole test run."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wnv_etl_lab2_spark import get_spark  # noqa: E402

# Small SF by default so the suite is fast while iterating; the driver's
# own t2 gate runs at sf0.01 (override: SPARK_GRAFT_TEST_SF_DIR).
TEST_SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="wnv-etl-lab2-tests", cpus=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return TEST_SF_DIR
