"""Source/sink tests: bz2-compressed CSV (S2), nullValue handling,
explicit-schema reads, CSV-safe projection."""

from __future__ import annotations

import bz2
import os

from pyspark.sql import functions as F

from flight_delay_prediction_using_pyspark_spark.sources.readers import (
    read_csv,
    read_flights_csv,
)
from flight_delay_prediction_using_pyspark_spark.sources.schemas import FLIGHTS_SCHEMA
from flight_delay_prediction_using_pyspark_spark.sources.synthetic import flights_df
from flight_delay_prediction_using_pyspark_spark.sources.writers import (
    csv_safe_columns,
    write_single_csv,
)


def test_bz2_csv_roundtrip(spark, tmp_path):
    """S2: Spark decompresses .csv.bz2 natively by extension
    (/root/reference/src/main/helper_methods.py:376-377)."""
    cols = [f.name for f in FLIGHTS_SCHEMA.fields]
    plain = str(tmp_path / "flights.csv")
    write_single_csv(flights_df(spark, 500).select(*cols), plain)
    compressed = str(tmp_path / "flights.csv.bz2")
    with open(plain, "rb") as src, bz2.open(compressed, "wb") as dst:
        dst.write(src.read())

    df = read_flights_csv(spark, compressed)
    assert df.count() == 500
    assert dict(df.dtypes)["ArrDelay"] == "int"
    # decompressed content matches the plain read exactly
    plain_sum = read_flights_csv(spark, plain).agg(F.sum("DepDelay")).first()[0]
    assert df.agg(F.sum("DepDelay")).first()[0] == plain_sum


def test_null_value_na(spark, tmp_path):
    p = str(tmp_path / "na.csv")
    with open(p, "w") as f:
        f.write("a,b\n1,NA\nNA,x\n")
    df = read_csv(spark, p, infer_schema=True)
    rows = df.collect()
    assert rows[0].b is None and rows[1].a is None


def test_explicit_schema_skips_inference(spark, tmp_path):
    """S1: declared schema ⇒ typed columns without the inferSchema
    double-scan (SURVEY.md §4 anti-pattern 6)."""
    cols = [f.name for f in FLIGHTS_SCHEMA.fields]
    p = str(tmp_path / "typed.csv")
    write_single_csv(flights_df(spark, 100).select(*cols), p)
    df = read_flights_csv(spark, p)
    assert df.schema == FLIGHTS_SCHEMA


def test_csv_safe_projection(spark):
    df = spark.createDataFrame(
        [(1, "x", [1.0, 2.0])], "id long, s string, arr array<double>"
    )
    assert csv_safe_columns(df) == ["id", "s"]  # array dropped (S6)


def test_orc_roundtrip(spark, tmp_path):
    """ORC is the other columnar format Spark ships natively —
    write/read preserves schema and values (vectorized reader,
    predicate pushdown like parquet)."""
    path = str(tmp_path / "orc_rt")
    df = spark.range(0, 100).select(
        F.col("id"), (F.col("id") % 7).cast("double").alias("v")
    )
    df.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    assert back.count() == 100
    assert dict(back.dtypes) == dict(df.dtypes)
    assert back.agg(F.sum("v")).first()[0] == df.agg(F.sum("v")).first()[0]


def test_json_lines_roundtrip(spark, tmp_path):
    """JSON-lines source with an explicit schema (never inferSchema —
    SURVEY.md §4 anti-pattern 6 applies to JSON's sampling scan too)."""
    path = str(tmp_path / "json_rt")
    df = spark.range(0, 50).select(
        F.col("id"), F.concat(F.lit("u"), F.col("id")).alias("name")
    )
    df.write.mode("overwrite").json(path)
    back = spark.read.schema("id long, name string").json(path)
    assert back.count() == 50
    assert back.filter(F.col("name") == "u7").first()["id"] == 7


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """Schema evolution across parquet files: an old file without a
    column and a new file with it read together under mergeSchema —
    the added column backfills NULL for old rows. The standard
    long-lived-table read path."""
    path = str(tmp_path / "evo")
    spark.createDataFrame([(1, "a")], "id long, name string").write.parquet(path)
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, name string, score double"
    ).write.mode("append").parquet(path)
    df = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(df.columns) == {"id", "name", "score"}
    rows = {r.id: r.score for r in df.collect()}
    assert rows == {1: None, 2: 9.5}


def test_custom_python_datasource(spark):
    """Spark 4 Python DataSource: the detrange format generates its
    rows across the declared reader partitions, deterministically."""
    import hashlib

    from flight_delay_prediction_using_pyspark_spark.sources import pysource

    pysource.register(spark)
    df = (
        spark.read.format("detrange")
        .option("n", 100)
        .option("partitions", 5)
        .load()
    )
    rows = {r.id: (r.val, r.part) for r in df.collect()}
    assert len(rows) == 100
    assert df.rdd.getNumPartitions() == 5
    for ident in (0, 37, 99):
        val = int(hashlib.md5(str(ident).encode()).hexdigest()[:8], 16) % 1000
        assert rows[ident][0] == val
    # contiguous 20-row slices per partition
    assert rows[0][1] == 0 and rows[19][1] == 0 and rows[20][1] == 1 and rows[99][1] == 4
