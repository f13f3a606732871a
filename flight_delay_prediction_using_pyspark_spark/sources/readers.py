"""Sources (SURVEY.md §2a: S1-S3 plus the driver-testdata parquet).

All readers are declarative `spark.read` plans: Catalyst gets predicate
pushdown / column pruning for free, and for parquet the vectorized
reader + row-group pruning. CSV readers take explicit schemas by
default (no `inferSchema` double-scan); `.bz2` inputs decompress
natively by file extension, covering the reference's compressed path
(/root/reference/src/main/helper_methods.py:372-380, notebook cell 2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from flight_delay_prediction_using_pyspark_spark.sources.schemas import (
    FLIGHTS_SCHEMA,
    PLANE_DATA_SCHEMA,
)

#: Tables materialized by the driver at /root/testdata/sf*/ (TESTDATA.md).
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    header: bool = True,
    null_value: str = "NA",
    infer_schema: bool = False,
) -> DataFrame:
    """CSV scan (S1/S2): typed when a schema is given, inferred only on
    explicit opt-in. `nullValue="NA"` mirrors the DOT data convention
    (/root/reference/src/main/helper_methods.py:375)."""
    reader = (
        spark.read.option("header", str(header).lower())
        .option("nullValue", null_value)
    )
    if schema is not None:
        reader = reader.schema(schema)
    elif infer_schema:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_flights_csv(spark: SparkSession, path: str, infer_schema: bool = False) -> DataFrame:
    """Flights fact source (S1/S2) with the declared 29-column schema."""
    schema = None if infer_schema else FLIGHTS_SCHEMA
    return read_csv(spark, path, schema=schema, infer_schema=infer_schema)


def read_plane_data_csv(spark: SparkSession, path: str, infer_schema: bool = False) -> DataFrame:
    """Aircraft dimension source (S3),
    /root/reference/src/main/helper_methods.py:215-221."""
    schema = None if infer_schema else PLANE_DATA_SCHEMA
    return read_csv(spark, path, schema=schema, infer_schema=infer_schema)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """One driver-testdata parquet table as a lazy scan."""
    if name == "events":
        return load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events table, with its nanosecond parquet timestamp.

    Spark 4 rejects TIMESTAMP(NANOS) parquet outright
    (PARQUET_TYPE_ILLEGAL); the supported path is the runtime-settable
    `spark.sql.legacy.parquet.nanosAsLong` conf, after which we floor
    to microseconds — exactly what DuckDB does when reading the same
    file, so oracle comparisons stay exact.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(raw.dtypes)["ts"] == "bigint":
        raw = raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return raw


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TESTDATA_TABLES) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def read_jsonl(spark: SparkSession, path: str, schema: str | None = None) -> DataFrame:
    """Newline-delimited JSON source. Always pass an explicit schema in
    production: schema inference is a full extra pass over the data —
    at 100 TB that is a second 100 TB scan before the first real job
    runs. (Same discipline as read_csv's explicit-schema default.)"""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — columnar like parquet, with predicate pushdown and
    column pruning through the same DataSource V1/V2 machinery; the
    interchange format when the lakehouse's other tenants are
    Hive/Trino-first."""
    return spark.read.orc(path)
