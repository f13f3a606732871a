"""Physical-layout operators: bucketing, skew salting, partitioned
writes — the knobs that decide whether a 100 TB join shuffles.

- **Bucketed tables** (`write_bucketed`): persist both join sides
  bucketed+sorted on the join key and Spark's scan reports the
  hash-partitioning, so equi-joins and groupBys on that key plan with
  NO Exchange (asserted in tests/test_plans.py). This is the
  pre-shuffle-once, join-many-times layout for fact tables.
- **Salted joins** (`salted_join`): when one key dominates (power-law
  user, null-bucket), a plain shuffle join sends the hot key to one
  task. Salting splits each left key into `factor` synthetic subkeys
  and replicates the matching right rows across them — the hot key
  fans out over `factor` tasks. AQE's skew-join handles moderate skew
  automatically (session.py enables it); explicit salting is for the
  pathological keys AQE's split thresholds miss.
- **Partitioned writes** (`write_partitioned`): directory partitioning
  for predicate-pruned scans (dynamic partition pruning on joins).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (+optionally sorted) managed table. Joins
    and aggregations on `bucket_col` between tables bucketed the same
    way plan without Exchange."""
    writer = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table)


def write_partitioned(
    df: DataFrame, path: str, partition_cols: Sequence[str], mode: str = "overwrite"
) -> None:
    """Directory-partitioned parquet: equality/IN predicates on
    partition columns prune whole directories at planning time."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    factor: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: split each left key into `factor`
    deterministic salt buckets; replicate right rows across all
    buckets; join on (key, salt). Same rows as a plain join on `key`,
    but a hot key now spreads over `factor` tasks.

    Left salt derives from a hash of the whole row (monotonically_
    increasing_id would break determinism across retries); right
    replication is an explode of a literal salt array — `factor`×
    duplication of the (small, dimension) right side.
    """
    salt = F.pmod(F.abs(F.hash(*[F.col(c) for c in left.columns])), F.lit(factor))
    l_salted = left.withColumn("__salt", salt)
    r_salted = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(factor)]))
    )
    out = l_salted.join(r_salted, [key, "__salt"], how)
    return out.drop("__salt")


def write_range_sorted(
    df: DataFrame, path: str, sort_col: str, n_files: int = 8
) -> None:
    """Range-partition + sort-within-partitions parquet write: each
    output file covers a disjoint range of `sort_col` (repartitionByRange
    samples the column for balanced boundaries), so parquet min/max
    statistics prune whole files/row-groups for range predicates — the
    single-dimension clustering a 100 TB fact table wants on its
    dominant filter column. Sorting within files additionally tightens
    per-row-group stats and improves encodings (RLE/delta)."""
    (
        df.repartitionByRange(n_files, F.col(sort_col))
        .sortWithinPartitions(sort_col)
        .write.mode("overwrite")
        .parquet(path)
    )


def compact_small_files(
    spark, path: str, target_file_bytes: int = 128 * 1024 * 1024
) -> int:
    """Small-file compaction: rewrite a parquet directory into
    ceil(total_bytes / target_file_bytes) files. Streaming sinks and
    fine-grained partition writes accumulate small files that bloat
    the NameNode/listing path and defeat row-group pruning; periodic
    compaction is standard table maintenance (what OPTIMIZE does on
    Delta/Iceberg). Uses coalesce (no shuffle) since output count only
    shrinks. Returns the new file count."""
    import glob
    import math
    import os

    files = glob.glob(os.path.join(path, "*.parquet")) + glob.glob(
        os.path.join(path, "part-*")
    )
    total = sum(os.path.getsize(f) for f in set(files))
    n_out = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + "__compact_tmp"
    df.coalesce(n_out).write.mode("overwrite").parquet(tmp)
    import shutil

    shutil.rmtree(path)
    os.rename(tmp, path)
    return n_out
