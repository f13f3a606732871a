from __future__ import annotations

import os

import pytest

from flight_delay_prediction_using_pyspark_spark.session import get_spark

SF_CORRECTNESS_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")
SF_SMOKE_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="spark-graft-tests", shuffle_partitions=8)
    yield spark
