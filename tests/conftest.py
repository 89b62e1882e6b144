"""Shared Spark fixture — one local session for the whole test run."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from flink_crawler_spark.session import get_spark

    # small core count: tests use tiny data; 4 threads beats 32 on startup
    spark = get_spark("tests", cpus=4)
    spark.sparkContext.setLogLevel("ERROR")
    yield spark


SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
