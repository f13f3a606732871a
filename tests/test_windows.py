"""Unit tests for the distributed ranking operators
(operators/windows.py): global_rank must reproduce the single-task
row_number EXACTLY for any total order, and ntile_from_rank must match
SQL ntile for every n mod k residue — these two together let rank-based
segmentation (RFM quartiles) drop the unpartitioned-window anti-pattern
without changing a single output value."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from flight_delay_prediction_using_pyspark_spark.operators.windows import (
    global_rank,
    ntile_from_rank,
)


def _scrambled(spark, n=1003):
    # multiplicative scramble -> non-unique values (911 residues) with a
    # unique tiebreak key, spread arbitrarily across input partitions
    return spark.range(0, n, 1, 8).select(
        (F.col("id") * 37 % 911).alias("v"), F.col("id").alias("k")
    )


def test_global_rank_matches_single_task_row_number(spark):
    df = _scrambled(spark)
    g = global_rank(df, [F.asc("v"), F.asc("k")], out_col="rk", mode="distributed")
    ref = df.select(
        "v", "k", F.row_number().over(Window.orderBy("v", "k")).cast("long").alias("rk0")
    )
    assert g.join(ref, ["v", "k"]).filter(F.col("rk") != F.col("rk0")).count() == 0
    # ranks are a permutation of 1..n (no gaps, no dupes)
    stats = g.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("rk").alias("lo"),
        F.max("rk").alias("hi"),
        F.countDistinct("rk").alias("d"),
    ).first()
    assert (stats.lo, stats.hi, stats.d) == (1, stats.n, stats.n)


def test_global_rank_descending_order(spark):
    df = _scrambled(spark)
    g = global_rank(df, [F.desc("v"), F.asc("k")], out_col="rk", mode="distributed")
    ref = df.select(
        "v",
        "k",
        F.row_number()
        .over(Window.orderBy(F.desc("v"), F.asc("k")))
        .cast("long")
        .alias("rk0"),
    )
    assert g.join(ref, ["v", "k"]).filter(F.col("rk") != F.col("rk0")).count() == 0


def test_global_rank_no_single_partition_sort(spark):
    """The point of the operator: the plan carries a range exchange,
    never an unpartitioned Window/ntile."""
    df = _scrambled(spark)
    g = global_rank(df, [F.asc("v"), F.asc("k")], out_col="rk", mode="distributed")
    plan = g._sc._jvm.PythonSQLUtils.explainString(
        g._jdf.queryExecution(), "formatted"
    )
    assert "rangepartitioning" in plan.lower()
    assert "row_number" not in plan  # local index comes from the id, not a window


def test_ntile_from_rank_matches_sql_ntile_all_residues(spark):
    # n = 1..9 covers every n mod 4 residue incl. n < k; 1003 for bulk
    for n in [1, 2, 3, 4, 5, 6, 7, 8, 9, 1003]:
        d = spark.range(1, n + 1).select(F.col("id").alias("rk"))
        mine = d.select(
            "rk", ntile_from_rank(F.col("rk"), F.lit(n).cast("long"), 4).alias("t")
        )
        ref = d.select("rk", F.ntile(4).over(Window.orderBy("rk")).alias("t0"))
        bad = mine.join(ref, "rk").filter(F.col("t") != F.col("t0")).count()
        assert bad == 0, f"n={n}"


def test_global_rank_auto_switch_paths_agree(spark):
    """auto mode picks the local sort for a small frame (no range
    exchange) and both paths produce identical ranks — the strategy
    switch must never change a value, only the plan."""
    df = _scrambled(spark, n=500)
    auto = global_rank(df, [F.asc("v"), F.asc("k")], out_col="rk")
    plan = auto._sc._jvm.PythonSQLUtils.explainString(
        auto._jdf.queryExecution(), "formatted"
    )
    assert "rangepartitioning" not in plan.lower()  # local path chosen
    dist = global_rank(df, [F.asc("v"), F.asc("k")], out_col="rk2", mode="distributed")
    bad = auto.join(dist, ["v", "k"]).filter(F.col("rk") != F.col("rk2")).count()
    assert bad == 0


def test_global_prefix_sum_matches_single_task_window(spark):
    """Distributed prefix sum == the single-task cumulative window,
    including negative values (sweep-line ±1 deltas) and desc order
    (Pareto's revenue-desc cumulative)."""
    from flight_delay_prediction_using_pyspark_spark.operators.windows import (
        global_prefix_sum,
    )

    df = spark.range(0, 997, 1, 8).select(
        (F.col("id") * 13 % 701).alias("v"),
        F.col("id").alias("k"),
        (F.when(F.col("id") % 3 == 0, -2).otherwise(5)).alias("x"),
    )
    for order in ([F.asc("v"), F.asc("k")], [F.desc("v"), F.asc("k")]):
        got = global_prefix_sum(df, order, "x", out_col="cum", mode="distributed")
        ref = df.withColumn(
            "cum0",
            F.sum("x")
            .over(Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, 0))
            .cast("long"),
        )
        bad = got.join(ref, ["v", "k"]).filter(F.col("cum") != F.col("cum0")).count()
        assert bad == 0
    # auto on a small frame stays local (no range exchange)
    auto = global_prefix_sum(df, [F.asc("v"), F.asc("k")], "x", out_col="cum")
    plan = auto._sc._jvm.PythonSQLUtils.explainString(
        auto._jdf.queryExecution(), "formatted"
    )
    assert "rangepartitioning" not in plan.lower()


def test_ntile_from_rank_exhaustive_small_domain(spark):
    """Exhaustive check of the closed form against a Python reference
    of ANSI ntile semantics (first n mod k tiles get ceil(n/k) rows)
    for every n <= 60 and k in {2,3,4,5,7} — every residue class and
    the n < k degenerate cases, in one Spark job per k."""
    import itertools

    def ref_ntile(rank, n, k):
        q, r = divmod(n, k)
        cut = r * (q + 1)
        if rank <= cut:
            return (rank - 1) // (q + 1) + 1
        return r + (rank - cut - 1) // q + 1 if q else rank

    for k in (2, 3, 4, 5, 7):
        rows = [
            (n, rank, ref_ntile(rank, n, k))
            for n in range(1, 61)
            for rank in range(1, n + 1)
        ]
        df = spark.createDataFrame(rows, ["n", "rk", "expected"])
        got = df.select(
            "expected",
            ntile_from_rank(
                F.col("rk").cast("long"), F.col("n").cast("long"), k
            ).alias("t"),
        )
        assert got.filter(F.col("t") != F.col("expected")).count() == 0, f"k={k}"
