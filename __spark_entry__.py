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


# Queries the judge asked to re-verify in a specific round regardless
# of rotation, plus queries whose IMPLEMENTATION changed this round
# so their existing driver rows attest to deleted code (the
# tpch_q17/orders_price_drift_chi2 standard from rounds 4-5).
# Round 9:
#   - ml_tree_sql_scoring_parity: the transpiler now emits bare
#     D-suffix double literals instead of CAST('…' AS DOUBLE) —
#     bit-identical values, different generated SQL text, so the r8
#     row attests to deleted emission code.
#   - corpus_unigram_lm_vocab: the Viterbi candidate bound moved to
#     the exact max(0, i-ML) form and cost lookups to try_element_at
#     (round-8 ADVICE; ANSI-mode safety) — output-invariant on the
#     shipped corpus, lineage changed.
#   - layout_manifest_time_travel / layout_schema_evolution_read /
#     layout_manifest_stats_pruning: the manifest stats read-back now
#     runs under parquet aggregate pushdown (round-8 ADVICE — footer
#     stats instead of a second column scan); envelope values are
#     invariant, the read path changed.
#   - plan_estimate_contract: the exploding-lineage guard now also
#     detects Expand (rollup/cube) and cached/local self-joins via
#     Catalyst sameResult (round-8 ADVICE) — the oracle booleans are
#     unchanged but the guard they attest to is wider.
_MUST_HAVE: list[str] = [
    "ml_tree_sql_scoring_parity",
    "corpus_unigram_lm_vocab",
    "layout_manifest_time_travel",
    "layout_schema_evolution_read",
    "layout_manifest_stats_pruning",
    "plan_estimate_contract",
]
# The twenty-four round-9 queries (corpus_bpe_batched_merges,
# corpus_wordpiece_trie_crossover, corpus_wordpiece_frozen_apply,
# doc_quality_classifier_scores, ml_tree_sql_codegen_ceiling,
# ml_tree_sql_depth15_parity, plus the clustering tier:
# embedding_kmeans_clusters, ann_ivf_kmeans_topk, ann_pq_adc_topk,
# ann_pq_recall_eval, semdedup_kmeans_cells,
# embedding_kmeans_pp_candidates, embedding_kmeans_init_quality,
# ann_ivf_streaming_ingest, ann_pq_recall_panel) plus the estimation
# tier (corpus_priority_sample_estimator,
# lineitem_neyman_allocation_estimate, lineitem_sample_quantiles_dkw,
# events_streaming_priority_sample,
# orders_join_size_coordinated_sample,
# corpus_priority_sample_subset_panel, lineitem_bootstrap_ci_mean,
# plus the governance audits customer_k_anonymity_census and
# customer_qi_uniqueness_by_set)
# are never-attempted → tier 2 seats them
# right behind this list, well inside the 50-row window.

# Fresh queries pushed to the BACK of the fresh tier (subsumed by a
# sibling, or added mid-round so they must not displace the older
# never-attempted backlog). Round 7: EMPTY — zero never-attempted
# queries remain (the r6 rotation converged: 241/241 attempted), so
# the window is _MUST_HAVE re-verifications plus any round-7
# additions, then the already-attempted tail cheapest-first.
_DEFER: list[str] = []


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Ordering (round-4 rotation): the driver caps CORRECTNESS at 50
    entries per round, so the slots must go to queries with no driver
    row yet.  Order is:

    1. must-have re-verifications the judge named explicitly,
    2. never-attempted oracle-backed queries, cheapest-first (a
       time-budgeted run verifies the most entries),
    3. never-attempted rows-only queries (weaker gate, but each needs
       its one driver row — round 3 wrongly parked these behind the
       already-verified tier, so ml_cross_validation et al. never ran),
    4. never-attempted queries subsumed by a sibling in tiers 2-3
       (_DEFER — they soak up whatever slots remain),
    5. everything already attempted, oracle-backed before rows-only.

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
    fresh, fresh_weak, deferred, seen, seen_weak = [], [], [], [], []
    for n in sorted(QUERIES, key=cost):
        if n in must:
            continue
        if n in attempted:
            (seen if n in ORACLES else seen_weak).append(n)
        elif n in _DEFER:
            deferred.append(n)
        elif n in ORACLES:
            fresh.append(n)
        else:
            fresh_weak.append(n)
    order = must + fresh + fresh_weak + deferred + seen + seen_weak
    return {n: QUERIES[n] for n in order}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted entries get
    the driver's rows-only check)."""
    return dict(ORACLES)
