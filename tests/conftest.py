from __future__ import annotations

import os

import pytest

from polar_spark.session import get_spark

SF_SMOKE = os.environ.get("POLAR_SPARK_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="polar_spark_tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMOKE
