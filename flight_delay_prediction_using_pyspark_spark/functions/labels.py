"""Delay-label derivation (SURVEY.md C11).

Matches /root/reference/src/main/main.py:97-110: at threshold t=10,
value ≥ +t → 'delayed', ≤ −t → 'early', else (including NULL) →
'on time'. The NULL→'on time' fall-through is reference behavior and
is preserved."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def delay_label(col: Column | str, threshold: float = 10.0) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.when(c >= threshold, F.lit("delayed"))
        .when(c <= -threshold, F.lit("early"))
        .otherwise(F.lit("on time"))
    )


def add_prediction_labels(
    df: DataFrame,
    prediction_col: str = "prediction",
    actual_col: str | None = "ArrDelay",
    threshold: float = 10.0,
) -> DataFrame:
    """C11: predicted_label from the model output, actual_label from
    the ground truth when present."""
    df = df.withColumn("predicted_label", delay_label(prediction_col, threshold))
    if actual_col is not None and actual_col in df.columns:
        df = df.withColumn("actual_label", delay_label(actual_col, threshold))
    return df
