from __future__ import annotations

import os

import pytest

from connect_spark.session import get_spark

SF_SMALL = "/root/testdata/sf0.001"
SF_MEDIUM = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("connect_spark_tests")
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    # SPARK_GRAFT_TEST_SF=/root/testdata/sf0.01 runs the parity gate at
    # the driver's correctness scale factor.
    return os.environ.get("SPARK_GRAFT_TEST_SF", SF_SMALL)
