"""Incremental rollup maintenance (operators/incremental.py):
merge-equals-batch exactness and touched-bucket-only rewrites."""

from __future__ import annotations

import glob
import hashlib
import os

from pyspark.sql import functions as F

from flight_delay_prediction_using_pyspark_spark.operators import incremental as IC


def _bucket_of(key: int, n: int = 16) -> int:
    return int(hashlib.md5(str(key).encode()).hexdigest()[:8], 16) % n


def test_incremental_merges_equal_batch_aggregate(spark, tmp_path):
    target = str(tmp_path / "rollup")
    rows = [(i, i % 7, (i * 13) % 100) for i in range(500)]
    df = spark.createDataFrame(rows, "event_id long, user_id long, cents long")
    for parity in (0, 1):
        delta = df.filter(F.col("event_id") % 2 == parity).drop("event_id")
        IC.merge_rollup_delta(spark, target, delta, ["user_id"], ["cents"])
    got = {
        r.user_id: (r.n_rows, r.cents)
        for r in IC.read_rollup(spark, target).collect()
    }
    want = {
        r.user_id: (r.n, r.s)
        for r in df.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("cents").alias("s"))
        .collect()
    }
    assert got == want


def test_incremental_merge_rewrites_only_touched_buckets(spark, tmp_path):
    target = str(tmp_path / "rollup")
    seed = spark.createDataFrame(
        [(u, 100) for u in range(1, 41)], "user_id long, cents long"
    )
    IC.merge_rollup_delta(spark, target, seed, ["user_id"], ["cents"])

    def mtimes():
        return {
            p: os.path.getmtime(p)
            for p in glob.glob(f"{target}/{IC.BUCKET_COL}=*/*.parquet")
        }

    before = mtimes()
    delta = spark.createDataFrame([(1, 5)], "user_id long, cents long")
    IC.merge_rollup_delta(spark, target, delta, ["user_id"], ["cents"])
    after = mtimes()
    touched = f"{IC.BUCKET_COL}={_bucket_of(1)}"
    for p, m in before.items():
        if touched not in p:
            assert p in after and after[p] == m, f"untouched rewritten: {p}"
    got = {r.user_id: (r.n_rows, r.cents) for r in IC.read_rollup(spark, target).collect()}
    assert got[1] == (2, 105) and got[2] == (1, 100) and len(got) == 40


def test_incremental_retract_against_missing_target_rejected(spark, tmp_path):
    """A sign=-1 batch against a fresh/missing target is a
    delivery-order violation (the retracted insert never applied);
    writing it through would seed negative-count groups. The operator
    must reject it instead of persisting them (round-4 advice)."""
    import pytest

    target = str(tmp_path / "rollup_fresh")
    delta = spark.createDataFrame([(1, 10)], "user_id long, cents long")
    with pytest.raises(ValueError, match="missing rollup target"):
        IC.merge_rollup_delta(
            spark, target, delta, ["user_id"], ["cents"], sign=-1
        )
    assert not os.path.isdir(target)
    # and a retraction AFTER the insert still fully removes the group
    IC.merge_rollup_delta(spark, target, delta, ["user_id"], ["cents"])
    IC.merge_rollup_delta(spark, target, delta, ["user_id"], ["cents"], sign=-1)
    assert IC.read_rollup(spark, target).count() == 0


def test_incremental_merge_batch_id_idempotent(spark, tmp_path):
    """Counter merges double-count on redelivery; the batch-id ledger
    makes a replayed delta a no-op — the at-least-once guard."""
    target = str(tmp_path / "rollup_idem")
    delta = spark.createDataFrame([(1, 10), (2, 20)], "user_id long, cents long")
    IC.merge_rollup_delta(spark, target, delta, ["user_id"], ["cents"], batch_id="b0")
    # replay of the SAME batch id: no-op
    IC.merge_rollup_delta(spark, target, delta, ["user_id"], ["cents"], batch_id="b0")
    got = {r.user_id: (r.n_rows, r.cents) for r in IC.read_rollup(spark, target).collect()}
    assert got == {1: (1, 10), 2: (1, 20)}
    # a new batch id applies normally
    IC.merge_rollup_delta(spark, target, delta, ["user_id"], ["cents"], batch_id="b1")
    got = {r.user_id: (r.n_rows, r.cents) for r in IC.read_rollup(spark, target).collect()}
    assert got == {1: (2, 20), 2: (2, 40)}
