"""Sketch-aggregate tests: DataSketches HLL distinct estimation and
freqItems heavy-hitter candidates — the approximate companions to the
exact oracle-gated queries (events_daily_users_hll,
orders_heavy_hitters)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_hll_sketch_estimate_within_5pct(spark):
    # 5000 distinct keys, each appearing 1-3 times, scattered over
    # 16 partitions so map-side partial sketches genuinely merge.
    df = (
        spark.range(0, 12000, 1, 16)
        .select((F.col("id") % 5000).alias("user"))
    )
    row = (
        df.agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("user")).alias("approx"),
            F.count_distinct("user").alias("exact"),
        )
        .first()
    )
    assert abs(row.approx - row.exact) / row.exact < 0.05


def test_hll_estimate_stable_across_partitionings(spark):
    # The estimate is NOT bit-stable across merge structures (HIP
    # estimator for streamed inserts, composite estimator after
    # merges) — but any partitioning of the same key set must land
    # within the sketch's error envelope of the truth.
    for parts in (1, 3, 8):
        df = spark.range(0, 1000, 1, parts).select(
            (F.col("id") % 700).alias("u")
        )
        est = df.agg(F.hll_sketch_estimate(F.hll_sketch_agg("u"))).first()[0]
        assert abs(est - 700) / 700 < 0.05


def test_freq_items_contains_true_heavy_hitter(spark):
    # One key owns ~33% of rows; freqItems(support=0.2) must surface it
    # (it may also return false positives — that is the sketch contract,
    # and why the exact top-k query is the oracle-gated one).
    df = spark.range(0, 3000, 1, 8).select(
        F.when(F.col("id") % 3 == 0, F.lit(7)).otherwise(F.col("id")).alias("k")
    )
    [items] = df.stat.freqItems(["k"], support=0.2).first()
    assert 7 in items


def test_join_size_cms_upper_bound_and_usable(spark):
    """The CMS inner-product join-size estimate must never
    under-count (every cross term is non-negative) and must stay a
    usable statistic at the configured width (under 2x the truth at
    test SF) — the property a plan-choice consumer relies on."""
    from flight_delay_prediction_using_pyspark_spark.plans.queries import QUERIES
    from tests.conftest import SF_CORRECTNESS_DIR

    r = QUERIES["orders_join_size_cms"](spark, SF_CORRECTNESS_DIR).collect()[0]
    assert r.est_join_size >= r.exact_join_size > 0
    assert r.over_ppm < 1_000_000  # estimate < 2x exact


def test_cms_rows_not_jointly_correlated_pure_python():
    """Statistical pin for the round-7 CMS fix, engine-free: for key
    pairs whose md5 bases differ by an exact multiple of the sketch
    width (the class that collided in EVERY row under the old
    never-wrapping family), the fixed Carter-Wegman rows must collide
    near-independently — joint all-rows collision rate ~(1/w)^d, not
    ~1."""
    from flight_delay_prediction_using_pyspark_spark.operators.sketches import (
        CMS_A,
        CMS_B,
        CMS_D,
        _CMS_P,
    )

    width = 64

    def bucket(h, r):
        return (((h % _CMS_P) * CMS_A[r] + CMS_B[r]) % _CMS_P) % width

    n, all_rows_collide = 0, 0
    for h in range(1, 4001):
        h2 = h + width * 997  # same residue class mod width
        n += 1
        if all(bucket(h, r) == bucket(h2, r) for r in range(CMS_D)):
            all_rows_collide += 1
    # independent rows: expected rate (1/64)^3 ~ 4e-6; the broken
    # family scored ~1.0 on this exact class. Allow generous slack.
    assert all_rows_collide / n < 0.01
