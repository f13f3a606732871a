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
- `priority_sample`: fixed-size WEIGHTED sampling without replacement
  (priority sampling, Duffield-Lund-Thorup JACM'07): each row draws
  priority q = w/u with u uniform on (0,1], the k highest priorities
  are the sample, and the (k+1)-th priority τ makes Σ max(w, τ) over
  the sample an UNBIASED estimator of Σ w for the group — and, per
  DLT, of ANY subset sum (restrict the Σ to the subset's sampled
  rows). Unlike the Efraimidis-Spirakis key u^(1/w) (which needs a
  transcendental ln that the engines round differently), w/u is ONE
  IEEE division of two exactly-cast integers — correctly rounded by
  the standard, so priorities, their ordering, and τ are bit-identical
  in Spark and DuckDB with no quantization step at all.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from flight_delay_prediction_using_pyspark_spark.text.analysis import md5_hash32, md5_hash60


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


def priority_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    group_cols: Sequence[str] = (),
    salt: str = "ps_",
) -> DataFrame:
    """Priority sampling (Duffield-Lund-Thorup, JACM'07): keep the k
    rows with the highest priority q = w/u per group, where
    u = (md5_60(salt‖key)+1) ∈ [1, 2^60] is the row's deterministic
    uniform draw. Returns the sampled rows plus `priority` and the
    per-group `tau` (the (k+1)-th highest priority; 0.0 when the
    group has ≤ k rows, in which case the sample is exhaustive and
    the estimator below is exact). Σ max(w, τ) over a group's sample
    is unbiased for the group's Σ w; restricting that sum to any
    predicate's rows estimates that predicate's subset sum — one
    k-row sample answers arbitrary later subset-sum questions, the
    DLT property that makes this the right sample to KEEP per shard
    of a 100 TB corpus.

    Rows with w ≤ 0 are excluded (they carry no mass and a zero
    weight would pin priority to 0). Ties (two rows with the exact
    same priority double) break on key_col, so membership is total
    and reproducible.

    Scale shape: the row_number window is a per-group sort, fine up
    to bench scales; the 100 TB path replaces it with the standard
    two-pass threshold trick — estimate τ̂ ≥ τ from a mergeable
    quantile sketch over priorities (one map-side pass), filter
    q ≥ τ̂ (survivors ≈ k per group), exact top-(k+1) on the
    survivors — so the full table is never sorted, only scanned."""
    # u on (0, 1]: (h+1)/2^60 — normalization matters because the DLT
    # estimator compares τ against RAW weights (max(w, τ)); an
    # unnormalized u would shrink every priority (hence τ) by 2^-60
    # and silently degrade the estimator to Σ_{i∈S} w_i.
    u = (
        md5_hash60(F.concat(F.lit(salt), F.col(key_col).cast("string")))
        + F.lit(1)
    ).cast("double") / F.lit(1152921504606846976.0)
    base = df.filter(F.col(weight_col) > 0).withColumn(
        "priority", F.col(weight_col).cast("double") / u
    )
    win = Window.partitionBy(*[F.col(c) for c in group_cols]).orderBy(
        F.desc("priority"), F.asc(key_col)
    )
    ranked = base.withColumn("rn", F.row_number().over(win))
    # τ comes from the SAME ranked pass: keep k+1 rows per group, read
    # the (k+1)-th priority with a second window over that k+1-per-group
    # residue (metadata-sized), then drop the sentinel row — the corpus
    # is scanned and group-sorted exactly once, no self-join.
    topk1 = ranked.filter(F.col("rn") <= k + 1)
    grp_win = Window.partitionBy(*[F.col(c) for c in group_cols])
    tau_col = F.coalesce(
        F.max(F.when(F.col("rn") == k + 1, F.col("priority"))).over(grp_win),
        F.lit(0.0),
    )
    return topk1.withColumn("tau", tau_col).filter(F.col("rn") <= k)
