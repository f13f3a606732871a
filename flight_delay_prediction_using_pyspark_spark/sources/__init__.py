from flight_delay_prediction_using_pyspark_spark.sources.readers import (
    TESTDATA_TABLES,
    load_table,
    load_tables,
    read_csv,
    read_flights_csv,
    read_plane_data_csv,
)
from flight_delay_prediction_using_pyspark_spark.sources.writers import (
    csv_safe_columns,
    write_parquet,
    write_single_csv,
)

__all__ = [
    "TESTDATA_TABLES",
    "load_table",
    "load_tables",
    "read_csv",
    "read_flights_csv",
    "read_plane_data_csv",
    "csv_safe_columns",
    "write_parquet",
    "write_single_csv",
]
