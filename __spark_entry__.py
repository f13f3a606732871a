"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementations live in the engine package
(flight_delay_prediction_using_pyspark_spark/plans/queries.py); this module just
re-exports the catalog.
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from flight_delay_prediction_using_pyspark_spark.plans.queries import ORACLES, QUERIES

SMOKE_SF_DIR = "/root/testdata/sf0.001"
_COST_HINTS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "catalog_cost_hints.json")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["pricing_summary"](spark, SMOKE_SF_DIR)


def _driver_attempted() -> set[str]:
    """Union of query names the driver has already attempted in past
    rounds' CORRECTNESS_r*.json files (green or not — an attempted row
    exists either way, so re-running it wastes a verification slot)."""
    attempted: set[str] = set()
    repo = os.path.dirname(os.path.abspath(__file__))
    for fname in sorted(os.listdir(repo)):
        if fname.startswith("CORRECTNESS_r") and fname.endswith(".json"):
            try:
                with open(os.path.join(repo, fname)) as f:
                    attempted |= set(json.load(f))
            except (OSError, ValueError):
                pass
    return attempted


# Previously-verified queries the round-2 judge asked to re-verify this
# round regardless of rotation (VERDICT.md task 4: the C10 end-to-end
# flights composite must have a fresh green row).
_MUST_HAVE = ["flights_prepare_summary"]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Ordering (round-3 rotation, per VERDICT.md task 2): the driver caps
    CORRECTNESS at 50 entries per round, so the slots must go to queries
    with no driver row yet.  Order is:

    1. must-have re-verifications the judge named explicitly,
    2. oracle-backed queries never attempted by the driver,
       cheapest-first (a time-budgeted run verifies the most entries),
    3. oracle-backed queries already verified in past rounds,
    4. oracle-less (rows-only) queries last — they consume slots for a
       weaker check, so they only run once everything else is covered.

    Past rounds' coverage is read from the CORRECTNESS_r*.json files the
    driver leaves in the repo, so this rotation is self-maintaining:
    each round's head is automatically the still-unverified tail.
    Unhinted (new) queries default to 0.3 s and land early in tier 2.
    """
    try:
        with open(_COST_HINTS) as f:
            hints = json.load(f)["queries"]
    except (OSError, KeyError, ValueError):
        hints = {}
    cost = lambda n: hints.get(n, 0.3)  # noqa: E731
    attempted = _driver_attempted()
    must = [n for n in _MUST_HAVE if n in QUERIES]
    fresh, seen, no_oracle = [], [], []
    for n in sorted(QUERIES, key=cost):
        if n in must:
            continue
        if n not in ORACLES:
            no_oracle.append(n)
        elif n in attempted:
            seen.append(n)
        else:
            fresh.append(n)
    return {n: QUERIES[n] for n in must + fresh + seen + no_oracle}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted entries get
    the driver's rows-only check)."""
    return dict(ORACLES)
