from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lens_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("LENS_SPARK_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    session = get_spark("lens_spark-tests", shuffle_partitions=8)
    yield session
    session.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def people(spark):
    """The reference test-suite's canonical input shape
    (tests/integration/cli/simple_test.go): {Name, Age} documents."""
    return spark.createDataFrame(
        [("John", 30), ("Fred", 31), ("Orpheus", 32)], "Name string, Age long"
    )
