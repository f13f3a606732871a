"""Unit tests for the scalar feature functions on hand-built frames —
the edge cases (junk strings, empties, nulls, 2400) that the synthetic
generator can't exercise (SURVEY.md §5, §7 'HHMM edge cases')."""

from __future__ import annotations

from pyspark.sql import functions as F

from flight_delay_prediction_using_pyspark_spark.functions.features import (
    add_time_gap_bucket,
    add_time_of_day,
    add_weekend_indicator,
)
from flight_delay_prediction_using_pyspark_spark.functions.labels import delay_label
from flight_delay_prediction_using_pyspark_spark.functions.time_parse import (
    minutes_since_midnight,
    parse_time_digits,
)


def test_parse_time_digits_edge_cases(spark):
    rows = [("730",), ("0730",), ("07:30",), ("2400",), ("",), ("junk",), (None,), ("23h59m",)]
    df = spark.createDataFrame(rows, ["t"])
    out = [r.v for r in df.select(parse_time_digits("t").alias("v")).collect()]
    assert out == [730, 730, 730, 2400, None, None, None, 2359]


def test_minutes_since_midnight(spark):
    rows = [("0000",), ("0001",), ("1230",), ("2359",), ("2400",), (None,)]
    df = spark.createDataFrame(rows, ["t"])
    out = [r.v for r in df.select(minutes_since_midnight("t").alias("v")).collect()]
    # 2400 → 24*60+0 = 1440: reference semantics (no wraparound).
    assert out == [0, 1, 750, 1439, 1440, None]


def test_time_of_day_buckets_and_null(spark):
    rows = [(500,), (1159,), (1200,), (1859,), (1900,), (2359,), (0,), (459,), (None,)]
    df = spark.createDataFrame(rows, ["DepTime"])
    df = df.withColumn("CRSDepTime", F.col("DepTime")).withColumn(
        "CRSArrTime", F.col("DepTime")
    )
    out = [r.DepTime_TOD for r in add_time_of_day(df).collect()]
    assert out == [
        "morning", "morning", "afternoon", "afternoon",
        "evening", "evening", "night", "night", "unknown",
    ]


def test_time_of_day_udf_matches_native(spark):
    rows = [(h * 100,) for h in range(24)] + [(None,)]
    df = spark.createDataFrame(rows, ["DepTime"])
    df = df.withColumn("CRSDepTime", F.col("DepTime")).withColumn(
        "CRSArrTime", F.col("DepTime")
    )
    native = [r.DepTime_TOD for r in add_time_of_day(df).collect()]
    udf = [r.DepTime_TOD for r in add_time_of_day(df, use_udf=True).collect()]
    assert native == udf


def test_weekend_indicator_uses_src_semantics(spark):
    df = spark.createDataFrame([(d,) for d in range(1, 8)], ["DayOfWeek"])
    out = {r.DayOfWeek: r.Weekend for r in add_weekend_indicator(df).collect()}
    # src set is [5,6,7] (custom_features.py:55), NOT the notebook's [6,7].
    assert out == {1: "Weekday", 2: "Weekday", 3: "Weekday", 4: "Weekday",
                   5: "Weekend", 6: "Weekend", 7: "Weekend"}


def test_time_gap_buckets_with_null_quirk(spark):
    rows = [
        (900, 920),    # 20 min → NOT_ENOUGH
        (900, 850),    # negative → NOT_ENOUGH
        (900, 945),    # 45 → BARELY_ENOUGH
        (900, 1030),   # 90 → ENOUGH
        (900, 1200),   # 180 → MORE_THAN_ENOUGH
        (900, None),   # NULL → MORE_THAN_ENOUGH (reference quirk)
    ]
    df = spark.createDataFrame(rows, ["CRSDepTime", "CRSArrTime"])
    out = [r.TimeBetweenDepartures for r in add_time_gap_bucket(df).collect()]
    assert out == ["NOT_ENOUGH", "NOT_ENOUGH", "BARELY_ENOUGH", "ENOUGH",
                   "MORE_THAN_ENOUGH", "MORE_THAN_ENOUGH"]


def test_delay_label_thresholds_and_null(spark):
    rows = [(10.0,), (9.99,), (-10.0,), (-9.99,), (0.0,), (None,)]
    df = spark.createDataFrame(rows, ["p"])
    out = [r.v for r in df.select(delay_label("p").alias("v")).collect()]
    assert out == ["delayed", "on time", "early", "on time", "on time", "on time"]


def test_hhmm_parser_property(spark):
    """Property test (SURVEY.md §7 'HHMM edge cases'): the Spark
    parser agrees with an independent Python reference on arbitrary
    strings — digits extracted, empty→null, minutes split."""
    from hypothesis import given, settings, strategies as st

    def py_parse(s):
        if s is None:
            return None
        # ASCII digits only — the parser strips [^0-9]; Python's
        # str.isdigit() would also accept Unicode digits
        digits = "".join(ch for ch in s if ch in "0123456789")
        return int(digits) if digits else None

    cases = []

    @settings(max_examples=200, deadline=None)
    @given(
        st.one_of(
            st.none(),
            st.text(
                alphabet=st.characters(
                    whitelist_categories=("Nd", "Lu", "Ll", "Po", "Zs")
                ),
                max_size=8,
            ),
            st.integers(min_value=0, max_value=2400).map(str),
        )
    )
    def collect(s):
        # digits-only strings longer than int range are fine (<=8 chars)
        cases.append(s)

    collect()
    rows = [(s,) for s in cases]
    df = spark.createDataFrame(rows, "t string")
    got = [r.v for r in df.select(parse_time_digits("t").alias("v")).collect()]
    expected = [py_parse(s) for s in cases]
    assert got == expected
