"""Window operators (SURVEY.md §2e) and the scalar-broadcast rewrite.

The reference's one global window
(`Window().rowsBetween(unboundedPreceding, unboundedFollowing)`,
/root/reference/src/main/dataset_utils.py:55-66) collapses the whole
dataset into a single task — the canonical anti-pattern at scale.
`with_global_agg` preserves its semantics (every row sees the global
aggregate) with a parallel plan: a scalar aggregate broadcast-joined
back onto the data.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def rank_in_group(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column | str],
    out_col: str = "rn",
    method: str = "row_number",
) -> DataFrame:
    """Ranking window (W1). One hash-partition shuffle on the keys."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    fn = {"row_number": F.row_number, "rank": F.rank, "dense_rank": F.dense_rank}[method]
    return df.withColumn(out_col, fn().over(w))


def dedup_probe(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Duplicate detector (C13,
    /root/reference/src/main/helper_methods.py:171-179): rows beyond the
    first per key. Keys double as the intra-group order for parity."""
    return (
        rank_in_group(df, keys, list(keys), out_col="row_number")
        .filter(F.col("row_number") > 1)
        .drop("row_number")
    )


def global_scalar(df: DataFrame, agg: Column) -> DataFrame:
    """A 1-row, 1-column aggregate (e.g. global max) as a DataFrame."""
    return df.agg(agg.alias("__scalar"))


def with_global_agg(df: DataFrame, agg: Column, out_col: str) -> DataFrame:
    """Attach a global aggregate to every row (W2 rewrite).

    Semantics of `F.max(c).over(Window.rowsBetween(unboundedPreceding,
    unboundedFollowing))` without the single-partition collapse: the
    aggregate runs as a parallel partial+final agg, then broadcast
    cross-joins back (1 row — trivially broadcast). Plan stays fully
    parallel at any scale.
    """
    scalar = global_scalar(df, agg).withColumnRenamed("__scalar", out_col)
    return df.crossJoin(F.broadcast(scalar))


def with_global_aggs(df: DataFrame, aggs: dict[str, Column]) -> DataFrame:
    """Attach SEVERAL global aggregates in ONE pass (W2 rewrite,
    batched): one scalar-agg job + one broadcast crossJoin for the
    whole dict. Chaining with_global_agg once per aggregate would
    re-execute the upstream lineage per call — on an unpersisted
    frontier (a generator, a cleaned/deduped frame) that multiplies
    the entire pipeline's cost by the aggregate count."""
    scalar = df.agg(*[agg.alias(name) for name, agg in aggs.items()])
    return df.crossJoin(F.broadcast(scalar))


def lag_lead_delta(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column | str],
    value_col: str,
    out_col: str = "delta",
) -> DataFrame:
    """lag-based per-group delta (§2e gap op the engine adds: sessions /
    time-series need it; reference never uses lag/lead)."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return df.withColumn(out_col, F.col(value_col) - F.lag(value_col).over(w))
