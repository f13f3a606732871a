"""Temporal join operators: as-of join and range join.

The reference has no temporal joins (SURVEY.md §2c notes the gap);
these are the §7-step-10 relational extensions a time-series/event
workload needs.

**As-of join — the union trick, not a range join.** The naive as-of
(`l.ts >= r.ts`, keep latest r) explodes into an O(n·m) range join.
The scalable plan: union both sides tagged, sort within each key by
(ts, side), and carry the most recent right-side payload forward with
`last(ignorenulls=True)` over a running window. One shuffle on the
key, state bounded by the window frame — this survives 100 TB where
any range-join formulation dies. (Same algorithm pandas.merge_asof
uses after its sort, distributed per key group.)

**Range join** stays for genuinely banded predicates (value ∈
[lo, hi)) against a *small broadcast* band table — Spark plans
BroadcastNestedLoopJoin; never use it big×big (pre-bucket instead).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def epoch_seconds(c: Column | str) -> Column:
    """Epoch seconds from a TIMESTAMP or TIMESTAMP_NTZ column.

    Parquet timestamps without UTC adjustment load as TIMESTAMP_NTZ
    in Spark 4, which cannot cast straight to BIGINT. Casting through
    TIMESTAMP first is a no-op for LTZ and a session-timezone
    conversion for NTZ — either way the result matches DuckDB's
    ``epoch(ts)`` on the same parquet.

    PRECONDITION: for NTZ inputs the caller must have pinned the
    session timezone to UTC (``session.ensure_utc(spark)`` — every
    catalog query that touches timestamps does) or the NTZ→LTZ cast
    shifts the epoch by the session offset. Do NOT pass raw integer
    epoch columns: ``cast('timestamp')`` interprets numerics as epoch
    SECONDS, so a micros/nanos long yields garbage — convert with
    ``F.timestamp_micros`` first (see sources.readers.load_events).
    """
    c = F.col(c) if isinstance(c, str) else c
    return c.cast("timestamp").cast("long")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    time_col: str,
    payload_cols: Sequence[str],
    suffix: str = "_asof",
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the payload of the nearest right row
    within the same key: `direction="backward"` (default) takes the
    most recent right row with `right.time <= left.time`,
    `direction="forward"` the next right row with `right.time >=
    left.time` (both: ties match). Right-side payload columns come
    back as `<col><suffix>`, null when no matching right row exists.

    Plan: union(tagged) → window per key ordered by time with the
    right side tie-ordered onto the matching side of simultaneous
    left rows → running `last(payload, ignorenulls)` over the
    preceding frame (backward) or `first(...)` over the following
    frame (forward) → filter to left rows. Exactly one hash shuffle
    on `key` either way.
    """
    lcols = left.columns
    l_tagged = left.select(
        *lcols,
        F.lit(1).alias("__is_left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in payload_cols],
    )
    def r_col(c: str) -> Column:
        if c in (key, time_col):
            return F.col(c).alias(c)
        return F.lit(None).cast(left.schema[c].dataType).alias(c)

    r_tagged = right.select(
        *[r_col(c) for c in lcols],
        F.lit(0).alias("__is_left"),
        *[F.col(c).alias(f"__r_{c}") for c in payload_cols],
    )
    unioned = l_tagged.unionByName(r_tagged)
    if direction == "backward":
        # right (0) sorts before simultaneous left (1): same-ts right
        # rows land inside the left row's preceding frame (ties match)
        w = (
            Window.partitionBy(key)
            .orderBy(F.col(time_col), F.col("__is_left"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carry = lambda c: F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w)  # noqa: E731
    elif direction == "forward":
        # mirrored: right sorts AFTER simultaneous left, so the
        # same-ts right row is inside the left row's following frame
        w = (
            Window.partitionBy(key)
            .orderBy(F.col(time_col), F.desc("__is_left"))
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        carry = lambda c: F.first(F.col(f"__r_{c}"), ignorenulls=True).over(w)  # noqa: E731
    else:
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    carried = unioned.select(
        *lcols,
        F.col("__is_left"),
        *[carry(c).alias(f"{c}{suffix}") for c in payload_cols],
    )
    return carried.filter(F.col("__is_left") == 1).drop("__is_left")


def range_join_broadcast(
    fact: DataFrame,
    bands: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
) -> DataFrame:
    """Banded non-equi join: fact rows matched to [lo, hi) bands from
    a SMALL band table (broadcast; BroadcastNestedLoopJoin). For
    big×big banded joins, bucket both sides first."""
    cond = (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
    return fact.join(F.broadcast(bands), cond, "left")


def resample_ffill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    tie_col: str,
    unit: str = "hour",
    step: str = "1 hour",
) -> DataFrame:
    """Regular-grid resample + forward fill (LOCF) — the gap-filling
    operator every time-series store ships (timescale/influx style),
    absent from Spark's builtins. Per key: bucket timestamps to the
    grid, keep each bucket's LATEST value (max over struct(ts, tie,
    value) — struct order makes intra-bucket ties deterministic),
    explode the key's [min, max] bucket range into a dense grid, and
    carry the last observation forward across empty buckets.

    Plan shape: one hash agg (bucketing) + one key-partitioned window,
    then a shuffle-free explode of each observed bucket into its gap
    range — no self-join, no grid/observed recompute. Per observed
    bucket: LOCF the sparse values (observed-but-null buckets inherit
    the previous non-null, matching `last_value IGNORE NULLS` on the
    dense grid), take lead(bucket), and emit
    sequence(bucket, next - step) all carrying this bucket's value.
    Grid rows ∝ time span / step, independent of event count.
    """
    stepi = F.expr(f"INTERVAL {step}")
    bucket = F.date_trunc(unit, F.col(ts_col)).alias("bucket")
    latest = (
        df.groupBy(F.col(key_col), bucket)
        .agg(F.max(F.struct(ts_col, tie_col, value_col)).alias("__b"))
        .select(key_col, "bucket", F.col(f"__b.{value_col}").alias("__v"))
    )
    w = Window.partitionBy(key_col).orderBy("bucket")
    locf = F.last("__v", ignorenulls=True).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    nxt = F.lead("bucket").over(w)
    sparse = latest.select(
        key_col, "bucket", locf.alias("__v2"), nxt.alias("__nxt")
    )
    return sparse.select(
        key_col,
        F.explode(
            F.sequence(
                "bucket",
                F.coalesce(F.col("__nxt") - stepi, F.col("bucket")),
                stepi,
            )
        ).alias("bucket"),
        F.col("__v2").alias(value_col),
    )


def sessionize(
    df: DataFrame,
    key: str,
    sec_col: str,
    tie_col: str,
    gap_sec: int = 1800,
) -> DataFrame:
    """Gaps-and-islands sessionization: assign a per-key `session_id`
    (0-based running count of gap breaks) ordered by (sec_col,
    tie_col). A new session starts when the gap since the previous
    event STRICTLY exceeds `gap_sec`. One shuffle on the key; any
    downstream groupBy on (key, session_id) or (key) reuses that
    partitioning. All-integer arithmetic — deterministic under any
    partitioning or engine."""
    from pyspark.sql import Window

    w = Window.partitionBy(key).orderBy(sec_col, tie_col)
    prev = F.lag(sec_col).over(w)
    flag = F.when(prev.isNull() | (F.col(sec_col) - prev > gap_sec), 1).otherwise(0)
    return df.withColumn(
        "session_id",
        F.sum(flag).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
