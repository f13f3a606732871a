"""Local replica of the driver's DuckDB-oracle comparison.

Mirrors the contract in __spark_entry__.py: run the Spark query and the
oracle SQL on the same parquet tables, compare row-count + column names
+ order-insensitive values (columns sorted by name). Values are
canonicalized to strings (floats via repr → bit-exact comparison,
which our exact-decimal aggregation strategy is designed to survive).
"""

from __future__ import annotations

import math
from datetime import datetime

import duckdb
import pandas as pd

from flight_delay_prediction_using_pyspark_spark.sources.readers import TESTDATA_TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon_cell(v) -> str:
    if v is None:
        return "<null>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<null>"
        if v == int(v) and abs(v) < 1e15:
            return repr(float(v))
        return repr(v)
    if isinstance(v, pd.Timestamp) or isinstance(v, datetime):
        return pd.Timestamp(v).isoformat()
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    return repr(v)


def canon_frame(df: pd.DataFrame) -> list[tuple[str, ...]]:
    df = df[sorted(df.columns)]
    rows = [
        tuple(_canon_cell(v) for v in row)
        for row in df.itertuples(index=False, name=None)
    ]
    return sorted(rows)


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty = match)."""
    problems: list[str] = []
    s_cols, o_cols = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    if s_cols != o_cols:
        problems.append(f"columns differ: spark={s_cols} oracle={o_cols}")
        return problems
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"row count differs: spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
    s_rows, o_rows = canon_frame(spark_pdf), canon_frame(oracle_pdf)
    if s_rows != o_rows:
        diffs = [
            (a, b) for a, b in zip(s_rows, o_rows) if a != b
        ]
        extra = abs(len(s_rows) - len(o_rows))
        problems.append(
            f"values differ: {len(diffs)} mismatched rows (+{extra} length diff); "
            f"first few: {diffs[:3]}"
        )
    return problems
