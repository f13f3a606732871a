"""SparkSession factory with scale-oriented defaults.

Engine counterpart of the reference's ``initialize_spark_session``
(/root/reference/src/main/helper_methods.py:224-249). Differences are
deliberate physical-layer improvements (SURVEY.md §4): AQE on (runtime
shuffle-partition coalescing + skew-join splitting), explicit shuffle
partitioning sized to the core count, Arrow-accelerated Python interop,
and a pinned UTC session timezone so timestamp semantics are stable
across drivers and match the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _cpus() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


def get_spark(
    app_name: str = "spark-graft",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for this engine.

    On a real cluster ``master`` comes from spark-submit; locally we
    default to ``local[$SPARK_GRAFT_CPUS]``. Shuffle partitioning
    defaults to 2x the core count — at 100 TB scale callers should
    instead size partitions via ``spark.sql.files.maxPartitionBytes``
    and let AQE coalesce post-shuffle partitions.
    """
    cpus = _cpus()
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or 2 * cpus))
        # Pin ANSI mode ON explicitly (round-10 hardening sweep): it is
        # the Spark 4 default and the whole catalog is verified green
        # under it (ANSI_SWEEP.md), but a Spark 3.5 cluster defaults it
        # OFF — pinning keeps error semantics (cast overflow,
        # div-by-zero, element_at misses throw instead of silently
        # nulling) identical across deployments. Queries use the
        # try_* / guarded idioms wherever a null is the intent.
        .config("spark.sql.ansi.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    if master is not None:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_GRAFT_NO_MASTER"):
        builder = builder.master(f"local[{cpus}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def ensure_utc(spark: SparkSession) -> SparkSession:
    """Pin the session timezone to UTC (runtime-settable).

    Called defensively at the top of timestamp-sensitive queries so
    results are identical regardless of which session the driver built.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark
