"""Sampling operators (SURVEY.md §2g M1/M2 + the scale-correct
deterministic variant).

- `bernoulli_sample` / `stratified_sample`: Spark's seeded samplers
  (M1, /root/reference/src/main/helper_methods.py:44,84,300). Seeded
  but PARTITION-SENSITIVE: the same seed yields different rows under a
  different partitioning, so they cannot be oracle-verified and
  shouldn't gate reproducible pipelines.
- `hash_sample`: the engine's reproducible sampler — keep rows where
  `portable_hash(key) % denominator == remainder`. Engine-portable
  (md5), partition-insensitive, pushdown-friendly (a plain filter),
  and stable across reruns/clusters: the right way to carve
  train/held-out splits from 100 TB. Disjoint remainders give
  disjoint, exhaustive folds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from flight_delay_prediction_using_pyspark_spark.text.analysis import md5_hash32


def bernoulli_sample(df: DataFrame, fraction: float, seed: int = 42) -> DataFrame:
    """M1: seeded Bernoulli row sample (per-partition RNG)."""
    return df.sample(fraction=fraction, seed=seed)


def stratified_sample(
    df: DataFrame, strata_col: str, fractions: dict, seed: int = 42
) -> DataFrame:
    """Per-stratum Bernoulli sampling (`sampleBy`) — keeps rare
    strata at chosen rates instead of the global coin-flip."""
    return df.sampleBy(strata_col, fractions, seed=seed)


def hash_sample(
    df: DataFrame,
    key: Column | str,
    denominator: int,
    remainder: int = 0,
) -> DataFrame:
    """Deterministic 1/denominator sample on a stable key: rows where
    portable_hash(key) % denominator == remainder."""
    k = F.col(key) if isinstance(key, str) else key
    return df.filter(md5_hash32(k.cast("string")) % denominator == remainder)
