"""Shared fixtures: one SparkSession per test run, small testdata dirs."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMALL = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from lakehouse_spark.session import get_spark

    # Small core/partition counts: test datasets are tiny and session startup
    # dominates; production sizing is exercised via env in bench runs.
    spark = get_spark(
        app_name="lakehouse_spark_tests",
        master="local[4]",
        shuffle_partitions=4,
    )
    yield spark


@pytest.fixture()
def tmp_store_dir(tmp_path):
    return str(tmp_path / "store")
