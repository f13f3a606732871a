"""Sinks (SURVEY.md §2a: S4-S6).

- `write_parquet` is the scale path: parallel part files, optional
  partition columns for dynamic partition pruning downstream.
- `write_single_csv` reproduces the reference's single-file CSV export
  (/root/reference/src/main/main.py:148-158): `coalesce(1)` + header +
  rename of the part file. Documented driver-bound — it serializes the
  final stage by design and must never be used on big outputs.
- `csv_safe_columns` reproduces the primitive-type projection the
  reference applies before CSV export (main.py:126-140), dropping
  VectorUDT / array / struct columns that CSV cannot carry.
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame

_CSV_SAFE_TYPES = {"byte", "short", "integer", "long", "float", "double", "string", "boolean", "date", "timestamp"}


def csv_safe_columns(df: DataFrame) -> list[str]:
    """Columns whose types CSV can represent (S6)."""
    return [f.name for f in df.schema.fields if f.dataType.typeName() in _CSV_SAFE_TYPES]


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite", partition_by: list[str] | None = None) -> None:
    """Parquet sink (S4), /root/reference/src/main/main.py:118."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_single_csv(df: DataFrame, out_path: str, header: bool = True) -> str:
    """Single-file CSV export (S5), /root/reference/src/main/main.py:148-158.

    Driver-bound by construction (`coalesce(1)`); intended for small
    result exports (predictions, reports), not data movement.
    """
    tmp_dir = out_path + "_tmp_csv_dir"
    (
        df.select(*csv_safe_columns(df))
        .coalesce(1)
        .write.mode("overwrite")
        .option("header", str(header).lower())
        .csv(tmp_dir)
    )
    part = glob.glob(os.path.join(tmp_dir, "part-*.csv"))[0]
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    shutil.move(part, out_path)
    shutil.rmtree(tmp_dir, ignore_errors=True)
    return out_path
