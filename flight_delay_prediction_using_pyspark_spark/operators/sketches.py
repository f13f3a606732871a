"""Count-min sketch: mergeable frequency estimation as DataFrames.

A CMS is d counter rows × w buckets; item x increments
``counter[i][h_i(x) mod w]`` for each of the d hash rows, and its
estimate is the MIN across rows — never an undercount, overcounts only
from bucket collisions. The sketch here is a (row, bucket, count)
DataFrame: the build is one explode(d)+groupBy (map-side combinable,
mergeable across shards by summing counts — the property that makes
CMS the streaming/distributed frequency sketch), and estimation is a
broadcast join of the probe set against the d·w-row sketch.

Unlike Spark's built-in ``count_min_sketch`` agg (opaque binary,
implementation-defined hashing), this construction is engine-portable:
the affine-over-md5 hash family is the same one the dedup/bloom
operators use, so a SQL oracle rebuilds the identical sketch and the
driver's correctness gate can hash-compare estimates exactly.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from flight_delay_prediction_using_pyspark_spark.text.analysis import md5_hash32

#: Carter-Wegman row hashes: (A·(h mod P) + B) mod P mod width with
#: A uniform in [1, P), P = 2^31−1 — products stay under 2^62, exact
#: int64 in both engines. ROUND-7 FIX (same class as the minhash
#: family, text/dedup.py): the previous A < 2^29 against P = 2^61−1
#: never wrapped the modulus, so the d rows were correlated — any key
#: pair with md5 difference ≡ 0 (mod width) collided in EVERY row at
#: once, degrading the CMS failure probability from (1/w)^d to ~1/w.
#: CMS point estimates remain over-counts under any hash (correctness
#: was never at risk); this restores the advertised (ε, δ) guarantee
#: and the pairwise independence the inner-product join-size
#: estimator (orders_join_size_cms) relies on.
_CMS_P = (1 << 31) - 1
_cms_rng = random.Random(20240815)
CMS_D = 3
CMS_A: list[int] = [_cms_rng.randrange(1, _CMS_P) for _ in range(CMS_D)]
CMS_B: list[int] = [_cms_rng.randrange(_CMS_P) for _ in range(CMS_D)]


def cms_bucket(item: Column, row: int, width: int) -> Column:
    """Bucket of `item` in hash row `row` for a width-`width` sketch."""
    base = md5_hash32(item.cast("string")) % F.lit(_CMS_P)
    return (
        (base * F.lit(CMS_A[row]) + F.lit(CMS_B[row])) % F.lit(_CMS_P)
    ) % F.lit(width)


def cms_cells(df: DataFrame, item_col: str, width: int, d: int = CMS_D) -> DataFrame:
    """One (row, bucket) cell row per (input row, hash row) — the
    pre-aggregation stage, usable on batch AND streaming inputs (the
    streaming build is just groupBy(row, bucket).count() over these
    cells in update/complete mode; counts merge by addition)."""
    cells = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("row"),
                    cms_bucket(F.col(item_col), i, width).alias("bucket"),
                )
                for i in range(d)
            ]
        )
    ).alias("cell")
    return df.select(cells).select(F.col("cell.row").alias("row"), F.col("cell.bucket").alias("bucket"))


def cms_build(
    df: DataFrame, item_col: str, width: int = 64, d: int = CMS_D
) -> DataFrame:
    """Sketch frame (row, bucket, count) from one item per input row.
    One explode(d) + groupBy over (d · width) keys — tiny shuffle,
    map-side partials, mergeable by summing counts."""
    return cms_cells(df, item_col, width, d).groupBy("row", "bucket").agg(
        F.count(F.lit(1)).alias("count")
    )


def cms_estimate(
    sketch: DataFrame, probes: DataFrame, item_col: str, width: int, d: int = CMS_D
) -> DataFrame:
    """Per-probe CMS estimate: min over the d probed cells (missing
    cell ⇒ 0). The probe side explodes to d rows per item and joins
    the (small, broadcastable) sketch on (row, bucket)."""
    probed = probes.select(
        F.col(item_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        cms_bucket(F.col(item_col), i, width).alias("bucket"),
                    )
                    for i in range(d)
                ]
            )
        ).alias("cell"),
    ).select(item_col, "cell.row", "cell.bucket")
    return (
        probed.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy(item_col)
        .agg(F.min(F.coalesce(F.col("count"), F.lit(0))).cast("bigint").alias("est"))
    )


def cms_oracle_sql(
    occ_select: str,
    probes: list[str],
    width: int,
    out_col: str = "token",
    d: int = CMS_D,
) -> str:
    """DuckDB SQL that rebuilds the identical sketch and replays the
    probe estimates. `occ_select`: a SELECT yielding one `token`
    column per item occurrence. Output columns: (out_col, est,
    true_cnt, overcount)."""
    md5i = "CAST(concat('0x', substr(md5(token), 1, 8)) AS BIGINT)"

    def cell(row: int, src: str) -> str:
        keep = "token, " if src == "probes" else ""
        return (
            f"SELECT {keep}{row} AS row, (((({md5i}) % {_CMS_P}) * {CMS_A[row]} "
            f"+ {CMS_B[row]}) % {_CMS_P}) % {width} AS bucket FROM {src}"
        )

    sketch_cells = " UNION ALL ".join(cell(i, "occ") for i in range(d))
    probe_cells = " UNION ALL ".join(cell(i, "probes") for i in range(d))
    vals = ", ".join(f"('{t}')" for t in probes)
    return f"""
    WITH occ AS ({occ_select}),
    sketch AS (
      SELECT row, bucket, COUNT(*) AS cnt FROM ({sketch_cells})
      GROUP BY row, bucket
    ),
    probes(token) AS (VALUES {vals}),
    pcell AS ({probe_cells}),
    est AS (
      SELECT token, CAST(MIN(coalesce(cnt, 0)) AS BIGINT) AS est
      FROM pcell LEFT JOIN sketch USING (row, bucket)
      GROUP BY token
    ),
    tru AS (
      SELECT p.token,
             (SELECT COUNT(*) FROM occ o WHERE o.token = p.token) AS true_cnt
      FROM probes p
    )
    SELECT e.token AS {out_col}, e.est, CAST(t.true_cnt AS BIGINT) AS true_cnt,
           CAST(e.est - t.true_cnt AS BIGINT) AS overcount
    FROM est e JOIN tru t ON e.token = t.token
    """
