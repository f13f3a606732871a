"""Explicit schemas for every source the engine reads.

The reference infers every schema at read time
(``option("inferSchema", True)``, /root/reference/src/main/helper_methods.py:372-380),
which costs a full extra scan of the input per read — unacceptable at
100 TB. We declare `StructType`s instead; `inferSchema` remains available
as an opt-in fallback on the readers for unknown files.

Flights columns mirror the 29-column US DOT on-time layout
(/root/reference/tools/generate_flights.py:77-82 and
src/main/dataset/variable-descriptions.csv). HHMM time columns are kept
as integers for reference parity (SURVEY.md §1); junk-tolerant string
parsing happens in functions/time_parse.py.
"""

from __future__ import annotations

from pyspark.sql import types as T

FLIGHTS_SCHEMA = T.StructType(
    [
        T.StructField("Year", T.IntegerType()),
        T.StructField("Month", T.IntegerType()),
        T.StructField("DayofMonth", T.IntegerType()),
        T.StructField("DayOfWeek", T.IntegerType()),
        T.StructField("DepTime", T.IntegerType()),
        T.StructField("CRSDepTime", T.IntegerType()),
        T.StructField("ArrTime", T.IntegerType()),
        T.StructField("CRSArrTime", T.IntegerType()),
        T.StructField("UniqueCarrier", T.StringType()),
        T.StructField("FlightNum", T.IntegerType()),
        T.StructField("TailNum", T.StringType()),
        T.StructField("ActualElapsedTime", T.IntegerType()),
        T.StructField("CRSElapsedTime", T.IntegerType()),
        T.StructField("AirTime", T.IntegerType()),
        T.StructField("ArrDelay", T.IntegerType()),
        T.StructField("DepDelay", T.IntegerType()),
        T.StructField("Origin", T.StringType()),
        T.StructField("Dest", T.StringType()),
        T.StructField("Distance", T.IntegerType()),
        T.StructField("TaxiIn", T.IntegerType()),
        T.StructField("TaxiOut", T.IntegerType()),
        T.StructField("Cancelled", T.IntegerType()),
        T.StructField("CancellationCode", T.StringType()),
        T.StructField("Diverted", T.IntegerType()),
        T.StructField("CarrierDelay", T.IntegerType()),
        T.StructField("WeatherDelay", T.IntegerType()),
        T.StructField("NASDelay", T.IntegerType()),
        T.StructField("SecurityDelay", T.IntegerType()),
        T.StructField("LateAircraftDelay", T.IntegerType()),
    ]
)

# /root/reference/src/main/dataset/plane-data.csv:1 header; `year` is
# renamed `year_plane` during enrichment (dataset_utils.py:44).
PLANE_DATA_SCHEMA = T.StructType(
    [
        T.StructField("tailnum", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField("manufacturer", T.StringType()),
        T.StructField("issue_date", T.StringType()),
        T.StructField("model", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("aircraft_type", T.StringType()),
        T.StructField("engine_type", T.StringType()),
        T.StructField("year", T.IntegerType()),
    ]
)

# Leakage columns the reference drops before training
# (/root/reference/src/main/helper_methods.py:22-33).
FORBIDDEN_COLUMNS = [
    "ArrTime",
    "ActualElapsedTime",
    "AirTime",
    "TaxiIn",
    "Diverted",
    "CarrierDelay",
    "WeatherDelay",
    "NASDelay",
    "SecurityDelay",
    "LateAircraftDelay",
]
