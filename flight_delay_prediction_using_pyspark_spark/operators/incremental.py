"""Incremental aggregate maintenance: keep a grouped rollup current by
merging DELTAS instead of recomputing from all history — the pattern
that turns a daily 100 TB full-table aggregation into an
O(today's data + touched state) job.

Correctness rests on mergeability: the maintained aggregates
(count, integer sum) are associative+commutative, so
    agg(history ∪ delta) == merge(agg(history), agg(delta))
exactly — no approximation, no float order-dependence (callers pass
integer-scaled measures). The target parquet is hash-bucketed on the
key (same scheme as streaming.ops.cdc_merge_sink) and a merge rewrites
ONLY the buckets its delta keys touch via dynamic partition overwrite;
unrelated state files are never read or written.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flight_delay_prediction_using_pyspark_spark.operators.layout import md5_key_bucket

#: partition column of the rollup target
BUCKET_COL = "__bucket"


def merge_rollup_delta(
    spark: SparkSession,
    target_dir: str,
    delta: DataFrame,
    key_cols: Sequence[str],
    sum_cols: Sequence[str],
    n_buckets: int = 16,
    batch_id: str | None = None,
    sign: int = 1,
) -> None:
    """Fold one delta batch into the rollup target: pre-aggregate the
    delta (map-side partials + one shuffle on the keys), read ONLY the
    target buckets those keys touch (partition-pruned scan), re-merge,
    and dynamic-overwrite those buckets. State schema:
    (key_cols..., n_rows long, <sum_col> long ...).

    `sum_cols` must be integer-valued (scale floats to cents first) so
    the maintained sums are exact under any merge order.

    COUNTER MERGES ARE NOT IDEMPOTENT: re-delivering the same delta
    double-counts (unlike the CDC max-wins upsert, which is). Under
    at-least-once delivery, pass a stable `batch_id` — a ledger file
    in the target records applied ids and a replayed batch becomes a
    no-op, the same offsets-log discipline foreachBatch relies on.
    The ledger write happens after the data commit: a crash between
    the two re-applies the batch on retry, so ids must be stable
    across retries (e.g. source partition/offset, never a timestamp).

    `sign=-1` RETRACTS: the delta's counts and sums merge negated —
    the standard retractable-counter MV maintenance for deletes and
    corrections (upstream rows withdrawn, late-arriving fixes).
    Groups whose row counter reaches zero are dropped from the
    maintained state, so a fully-retracted key disappears exactly as
    if it had never been inserted."""
    import os

    ledger = os.path.join(target_dir, "_applied_batches")
    if batch_id is not None and os.path.exists(ledger):
        with open(ledger) as fh:
            if batch_id in {line.strip() for line in fh}:
                return
    aggs = [(F.count(F.lit(1)) * sign).cast("long").alias("n_rows")] + [
        (F.sum(c) * sign).cast("long").alias(c) for c in sum_cols
    ]
    partial = (
        delta.groupBy(*key_cols)
        .agg(*aggs)
        .withColumn(BUCKET_COL, md5_key_bucket(key_cols, n_buckets))
    )

    if os.path.isdir(target_dir):
        touched = [r[0] for r in partial.select(BUCKET_COL).distinct().collect()]
        existing = spark.read.parquet(target_dir).filter(
            F.col(BUCKET_COL).isin(touched)
        )
        merged = (
            existing.unionByName(partial)
            .groupBy(*key_cols, BUCKET_COL)
            .agg(
                F.sum("n_rows").cast("long").alias("n_rows"),
                *[F.sum(c).cast("long").alias(c) for c in sum_cols],
            )
            # fully-retracted groups leave the state entirely
            .filter(F.col("n_rows") != 0)
        )
    else:
        merged = partial
    (
        merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(BUCKET_COL)
        .parquet(target_dir)
    )
    if batch_id is not None:
        with open(ledger, "a") as fh:
            fh.write(batch_id + "\n")


def read_rollup(spark: SparkSession, target_dir: str) -> DataFrame:
    """The current rollup, bucket column dropped."""
    return spark.read.parquet(target_dir).drop(BUCKET_COL)
