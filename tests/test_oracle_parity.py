"""The most important test in the repo: every catalog query with an
oracle must match the DuckDB oracle at sf0.01 — this is a local replica
of the driver's correctness gate (CORRECTNESS_r{N}.json)."""

from __future__ import annotations

import pytest

from flight_delay_prediction_using_pyspark_spark.plans.queries import ORACLES, QUERIES
from tests.conftest import SF_CORRECTNESS_DIR
from tests.oracle_util import compare_frames, duckdb_connection


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb_connection(SF_CORRECTNESS_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, oracle_con, name):
    sdf = QUERIES[name](spark, SF_CORRECTNESS_DIR)
    spark_pdf = sdf.toPandas()
    oracle_pdf = oracle_con.execute(ORACLES[name]).fetchdf()
    problems = compare_frames(spark_pdf, oracle_pdf)
    assert not problems, f"{name}: " + "; ".join(problems)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    sdf = QUERIES[name](spark, SF_CORRECTNESS_DIR)
    assert sdf.count() >= 0
    assert len(sdf.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
