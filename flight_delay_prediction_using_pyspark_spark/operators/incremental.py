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
    Groups whose row counter reaches zero stay in the files as
    zero-count TOMBSTONES (dynamic partition overwrite cannot write an
    empty partition, so dropping them would silently skip the rewrite
    of a bucket whose every group was retracted, leaving stale state
    on disk); `read_rollup` filters them, so a fully-retracted key is
    invisible exactly as if it had never been inserted, and a later
    insert merges against the 0-counter correctly."""
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
            # fully-retracted groups stay as zero-count tombstones so
            # the touched bucket is still rewritten (see docstring);
            # read_rollup hides them.
        )
    else:
        # A retraction against missing state is a delivery-order
        # violation (the insert it retracts was never applied): writing
        # it through would seed the state with negative-count groups
        # that read_rollup then exposes. Reject it loudly — the caller
        # must replay the insert first (round-4 advice).
        if sign < 0:
            raise ValueError(
                "merge_rollup_delta: retraction (sign=-1) against a "
                f"missing rollup target {target_dir!r}; apply the "
                "original insert batch first"
            )
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
    """The current rollup, bucket column dropped and fully-retracted
    tombstone groups (n_rows = 0) hidden."""
    return (
        spark.read.parquet(target_dir)
        .filter(F.col("n_rows") != 0)
        .drop(BUCKET_COL)
    )
