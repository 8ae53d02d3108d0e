"""Shared fixtures: one SparkSession per test session."""

from __future__ import annotations

import pytest

from engine.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("engine-tests", cores=4, shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def docs_small(spark):
    return spark.read.parquet(f"{SF_SMOKE}/documents.parquet")


@pytest.fixture(scope="session")
def docs_mid(spark):
    return spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
