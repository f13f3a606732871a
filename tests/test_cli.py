"""End-to-end CLI tests: fixture CSV → train → artifacts + metrics;
count-only and no-spark modes (the reference's three entry modes,
/root/reference/src/main/main.py:33-77)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from flight_delay_prediction_using_pyspark_spark.app.cli import run
from flight_delay_prediction_using_pyspark_spark.sources.schemas import FLIGHTS_SCHEMA
from flight_delay_prediction_using_pyspark_spark.sources.synthetic import flights_df
from flight_delay_prediction_using_pyspark_spark.sources.writers import write_single_csv


@pytest.fixture(scope="module")
def flights_csv(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("cli") / "flights.csv")
    cols = [f.name for f in FLIGHTS_SCHEMA.fields]
    write_single_csv(flights_df(spark, 3000).select(*cols), path)
    return path


def test_cli_no_spark_smoke(spark, flights_csv, tmp_path):
    result = run([flights_csv, str(tmp_path / "out"), "--no-spark"])
    assert result["rows"] == 3000
    # pandas mean must agree with the Spark-side mean (the independent
    # load-path oracle the reference's --no-spark mode provides)
    spark_mean = (
        spark.read.option("header", "true")
        .option("nullValue", "NA")
        .option("inferSchema", "true")
        .csv(flights_csv)
        .agg(F.avg("ArrDelay"))
        .first()[0]
    )
    assert result["mean_arrdelay"] == pytest.approx(spark_mean, rel=1e-9)


def test_cli_count_only(spark, flights_csv, tmp_path):
    result = run([flights_csv, str(tmp_path / "out"), "--count-only"])
    assert result["raw_rows"] == 3000
    assert 0 < result["prepared_rows"] < 3000  # cleaning drops rows


def test_cli_train_and_score(spark, flights_csv, tmp_path):
    out = tmp_path / "out"
    result = run([flights_csv, str(out), "--test-file", flights_csv])
    assert result["mae"] >= 0 and result["rmse"] >= result["mae"]
    assert result["validation_rows"] > 0
    assert result["test_rows"] > 0
    assert os.path.exists(out / "predictions.csv")
    assert os.path.isdir(out / "predictions.parquet")
    assert os.path.exists(out / "test_predictions.csv")
    preds = spark.read.parquet(str(out / "test_predictions.parquet"))
    labels = {r.predicted_label for r in preds.select("predicted_label").distinct().collect()}
    assert labels <= {"early", "on time", "delayed"}
