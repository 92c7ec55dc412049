"""Shared pytest fixtures: one SparkSession per test session, sf0.001 data."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lakeshed.session import get_spark

SF_SMALL = os.environ.get("LAKESHED_TEST_SF", "/root/testdata/sf0.001")
SF_ORACLE = os.environ.get("LAKESHED_ORACLE_SF", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        "lakeshed-tests",
        master="local[8]",
        extra_conf={"spark.sql.shuffle.partitions": "8"},
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMALL


@pytest.fixture()
def tmp_warehouse(tmp_path) -> str:
    return str(tmp_path / "warehouse")
