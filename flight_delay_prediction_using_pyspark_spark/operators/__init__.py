from flight_delay_prediction_using_pyspark_spark.operators.relational import (
    anti_join,
    broadcast_enrich,
    dedup_deterministic,
    dedup_first_row,
    select_columns,
    drop_columns,
    semi_join,
    set_except,
    top_k,
)
from flight_delay_prediction_using_pyspark_spark.operators.aggregates import (
    approx_distinct_counts,
    distinct_counts,
    exact_decimal_avg,
    exact_decimal_sum,
    grouped_agg,
    null_counts,
    numeric_profile,
)
from flight_delay_prediction_using_pyspark_spark.operators.windows import (
    dedup_probe,
    global_scalar,
    rank_in_group,
    with_global_agg,
)

__all__ = [
    "anti_join",
    "broadcast_enrich",
    "dedup_deterministic",
    "dedup_first_row",
    "select_columns",
    "drop_columns",
    "semi_join",
    "set_except",
    "top_k",
    "approx_distinct_counts",
    "distinct_counts",
    "exact_decimal_avg",
    "exact_decimal_sum",
    "grouped_agg",
    "null_counts",
    "numeric_profile",
    "dedup_probe",
    "global_scalar",
    "rank_in_group",
    "with_global_agg",
]
