"""Sampling operator tests: hash-sample determinism/disjointness and
the seeded M1 samplers."""

from __future__ import annotations

from pyspark.sql import functions as F

from flight_delay_prediction_using_pyspark_spark.operators import sampling as S


def test_hash_sample_deterministic_and_disjoint(spark):
    df = spark.createDataFrame([(i,) for i in range(2000)], ["id"])
    parts = [S.hash_sample(df, "id", 4, r) for r in range(4)]
    counts = [p.count() for p in parts]
    assert sum(counts) == 2000  # folds are exhaustive
    for c in counts:
        assert 400 < c < 600  # roughly uniform quarters
    # determinism: same filter, same rows — and repartitioning the
    # input does not change membership (unlike seeded sample())
    again = {r.id for r in S.hash_sample(df.repartition(7), "id", 4, 0).collect()}
    first = {r.id for r in parts[0].collect()}
    assert again == first


def test_bernoulli_sample_seeded(spark):
    df = spark.createDataFrame([(i,) for i in range(5000)], ["id"])
    a = S.bernoulli_sample(df, 0.2, seed=7).count()
    b = S.bernoulli_sample(df, 0.2, seed=7).count()
    assert a == b  # same seed+partitioning reproduces
    assert 800 < a < 1200


def test_stratified_sample(spark):
    df = spark.createDataFrame(
        [(i, "a" if i % 10 else "b") for i in range(5000)], ["id", "s"]
    )
    out = S.stratified_sample(df, "s", {"a": 0.1, "b": 1.0})
    by = {r.s: r.n for r in out.groupBy("s").agg(F.count("*").alias("n")).collect()}
    assert by["b"] == 500  # rare stratum fully kept
    assert 300 < by["a"] < 600
