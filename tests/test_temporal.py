"""Unit tests for operators.temporal on hand-built frames: backward
as-of semantics (ties match, no-prior-row nulls, per-key isolation)
and banded range joins."""

from __future__ import annotations

from pyspark.sql import functions as F

from flight_delay_prediction_using_pyspark_spark.operators import temporal as TP


def test_asof_join_backward_semantics(spark):
    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (1, 5, "c"), (2, 10, "d")],
        ["k", "t", "tag"],
    )
    right = spark.createDataFrame(
        [(1, 10, 100.0), (1, 15, 150.0), (2, 99, 999.0)],
        ["k", "t", "v"],
    )
    out = {
        r.tag: r.v_asof
        for r in TP.asof_join(left, right, key="k", time_col="t", payload_cols=["v"]).collect()
    }
    assert out["a"] == 100.0  # tie: right row at t=10 matches t=10
    assert out["b"] == 150.0  # latest prior (15), not first (10)
    assert out["c"] is None   # no prior right row
    assert out["d"] is None   # other key's rows invisible; k=2 right is later


def test_asof_join_keeps_left_rowcount(spark):
    left = spark.createDataFrame([(1, i, i) for i in range(50)], ["k", "t", "x"])
    right = spark.createDataFrame([(1, i * 2, float(i)) for i in range(10)], ["k", "t", "v"])
    out = TP.asof_join(left, right, key="k", time_col="t", payload_cols=["v"])
    assert out.count() == 50
    assert set(out.columns) == {"k", "t", "x", "v_asof"}


def test_range_join_broadcast(spark):
    fact = spark.createDataFrame([(1, 5), (2, 25), (3, 999)], ["id", "v"])
    bands = spark.createDataFrame(
        [("low", 0, 10), ("mid", 10, 100)], ["band", "lo", "hi"]
    )
    out = {r.id: r.band for r in TP.range_join_broadcast(fact, bands, "v").collect()}
    assert out == {1: "low", 2: "mid", 3: None}  # left join keeps unmatched


def test_resample_ffill_gap_filling(spark):
    import datetime as dt

    from flight_delay_prediction_using_pyspark_spark.operators.temporal import resample_ffill

    t = lambda h, m=0: dt.datetime(2024, 1, 1, h, m)
    rows = [
        # user 1: events at 00 and 03 -> grid 00..03, 01/02 forward-filled
        (1, t(0, 15), 100, 1.0),
        (1, t(3, 5), 101, 4.0),
        # user 1, two events in hour 3: later ts wins
        (1, t(3, 45), 102, 5.0),
        # user 2: single event -> single-bucket grid
        (2, t(10), 200, 9.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, value double"
    )
    out = {
        (r.user_id, r.bucket.hour): r.value
        for r in resample_ffill(df, "user_id", "ts", "value", "event_id").collect()
    }
    assert out == {
        (1, 0): 1.0,
        (1, 1): 1.0,   # filled
        (1, 2): 1.0,   # filled
        (1, 3): 5.0,   # latest-in-bucket wins
        (2, 10): 9.0,
    }


def test_asof_join_forward_semantics_and_ties(spark):
    """Forward as-of: each left row takes the NEXT right payload
    (right.ts >= left.ts), a same-timestamp right row MATCHES (ties
    in reach), and a left row after the last right row gets null —
    the mirror of the backward contract."""
    import datetime as dt

    from flight_delay_prediction_using_pyspark_spark.operators.temporal import asof_join

    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)
    left = spark.createDataFrame(
        [(1, t(10), 100), (1, t(20), 101), (1, t(40), 102), (2, t(5), 200)],
        "user_id long, ts timestamp, event_id long",
    )
    right = spark.createDataFrame(
        [(1, t(20), 7.0), (1, t(30), 9.0)],
        "user_id long, ts timestamp, value double",
    )
    out = {
        r.event_id: r.value_asof
        for r in asof_join(
            left, right, key="user_id", time_col="ts",
            payload_cols=["value"], direction="forward",
        ).collect()
    }
    assert out == {
        100: 7.0,   # next right at t20
        101: 7.0,   # same-ts right matches (tie)
        102: None,  # nothing after t40
        200: None,  # key with no right rows
    }


# ---------------------------------------------------------------------------
# Round-6: bitmap rollup + bucketed join
# ---------------------------------------------------------------------------


def test_bitmap_rollup_dedups_revisits(spark):
    """Weekly exact distinct from OR-merged daily bitmaps must never
    exceed the sum of daily distincts, and must equal a direct
    countDistinct over the same week."""
    from flight_delay_prediction_using_pyspark_spark.plans.queries import QUERIES
    from flight_delay_prediction_using_pyspark_spark.session import ensure_utc
    from flight_delay_prediction_using_pyspark_spark.sources.readers import load_table
    from tests.conftest import SF_SMOKE_DIR

    ensure_utc(spark)
    out = {
        r.week: r
        for r in QUERIES["events_bitmap_distinct_rollup"](
            spark, SF_SMOKE_DIR
        ).collect()
    }
    direct = {
        r.week: r.n
        for r in load_table(spark, SF_SMOKE_DIR, "events")
        .groupBy(
            F.date_format(F.date_trunc("week", F.col("ts")), "yyyy-MM-dd").alias(
                "week"
            )
        )
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(out) == set(direct) and out
    for week, r in out.items():
        assert r.n_week_users == direct[week]
        assert r.n_week_users <= r.sum_daily_users


def test_bucketed_join_plans_without_exchange(spark):
    """The n_exchanges column the oracle pins to 0 must be 0 locally
    too (scan -> join -> per-key agg -> top-k entirely exchange-free
    on bucketed tables)."""
    from flight_delay_prediction_using_pyspark_spark.plans.queries import QUERIES
    from tests.conftest import SF_SMOKE_DIR

    rows = QUERIES["layout_bucketed_join_topk"](spark, SF_SMOKE_DIR).collect()
    assert rows and all(r.n_exchanges == 0 for r in rows)


def test_daily_ewma_matches_reference_recurrence(spark):
    """The windowed Horner fold must equal the truncated EWMA
    recurrence computed independently in Python over the same daily
    counts — exact integer equality, every day."""
    from flight_delay_prediction_using_pyspark_spark.plans.queries import QUERIES
    from tests.conftest import SF_SMOKE_DIR

    rows = QUERIES["events_daily_ewma"](spark, SF_SMOKE_DIR).collect()
    assert rows
    ns = [r.n for r in rows]
    for i, r in enumerate(rows):
        window = ns[max(0, i - 31) : i + 1]
        L = len(window)
        s = 0
        for x in reversed(window):  # newest folded first -> weight 2^(L-1)
            s = s * 2 + x
        assert r.n_terms == L
        assert r.ewma_ppm == (1_000_000 * s) // ((1 << L) - 1)


def test_debounce_planted_rapid_fire(spark, tmp_path):
    """Planted fixture: three events at t, t+1s, t+400s for one
    (user, type) stream — exactly the middle one is suppressed at the
    300 s gap."""
    import datetime as dt

    import pandas as pd

    from flight_delay_prediction_using_pyspark_spark.plans.queries import QUERIES

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        {"event_id": i, "ts": t, "user_id": 1, "event_type": "click",
         "value": 1.0, "props": "{}"}
        for i, t in enumerate(
            [t0, t0 + dt.timedelta(seconds=1), t0 + dt.timedelta(seconds=400)]
        )
    ]
    pd.DataFrame(rows).to_parquet(tmp_path / "events.parquet", index=False)
    out = {
        r.event_type: r
        for r in QUERIES["events_debounce_dedup"](spark, str(tmp_path)).collect()
    }
    r = out["click"]
    assert (r.n_events, r.n_kept, r.n_suppressed) == (3, 2, 1)


def test_trending_topk_invariants(spark):
    """Each day emits at most 3 rows, ranks are 1..k, and the delta
    column is exactly prev_rk - rk."""
    from collections import Counter

    from flight_delay_prediction_using_pyspark_spark.plans.queries import QUERIES
    from tests.conftest import SF_SMOKE_DIR

    rows = QUERIES["events_trending_topk"](spark, SF_SMOKE_DIR).collect()
    assert rows
    per_day = Counter(r.day for r in rows)
    for day, n in per_day.items():
        ranks = sorted(r.rk for r in rows if r.day == day)
        assert ranks == list(range(1, n + 1)) and n <= 3
    for r in rows:
        assert r.rank_delta == r.prev_rk - r.rk
