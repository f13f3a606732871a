from flight_delay_prediction_using_pyspark_spark.functions.time_parse import (
    add_cyclical_time,
    add_polar_coordinates,
    hour_of,
    minutes_since_midnight,
    parse_time_digits,
)
from flight_delay_prediction_using_pyspark_spark.functions.features import (
    add_time_gap_bucket,
    add_time_of_day,
    add_weekend_indicator,
    time_of_day_col,
)
from flight_delay_prediction_using_pyspark_spark.functions.labels import delay_label

__all__ = [
    "add_cyclical_time",
    "add_polar_coordinates",
    "hour_of",
    "minutes_since_midnight",
    "parse_time_digits",
    "add_time_gap_bucket",
    "add_time_of_day",
    "add_weekend_indicator",
    "time_of_day_col",
    "delay_label",
]
