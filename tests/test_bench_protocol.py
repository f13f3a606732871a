"""Unit tests for bench.py's measurement protocol — the contamination
gate and rep accounting, which otherwise only fail as mis-adjudicated
rounds (round-11 verdict cycle)."""

from __future__ import annotations

import bench
from flight_delay_prediction_using_pyspark_spark.plans.queries import ORACLES, QUERIES


def test_headline_entries_exist_and_are_baselined():
    missing = [n for n in bench.HEADLINE if n not in QUERIES]
    assert not missing, f"headline names not in catalog: {missing}"
    base = bench._baseline_queries()
    unbaselined = [n for n in bench.HEADLINE if n not in base]
    assert not unbaselined, (
        "headline entries without a committed baseline (the derived "
        f"quiet reference silently shrinks): {unbaselined}"
    )


def test_derived_quiet_reference_tracks_baselines():
    """Round-11 ADVICE: the total-quiet reference derives from the
    committed baselines (0.75 x their sum over baselined headline
    queries) instead of a hand-pinned constant, so HEADLINE growth
    cannot silently exhaust the contamination gate's headroom."""
    base = bench._baseline_queries()
    adjudicated = set(bench.HEADLINE) & set(base)
    ref = bench.TOTAL_QUIET_RATIO * sum(base[n] for n in adjudicated)
    # sanity band: the round-11/12 quiet-run totals sat at 355-480 s;
    # a ref outside [250, 800] means either baselines or the ratio
    # regressed in a way adjudication would misread
    assert 250.0 < ref < 800.0, ref
    assert bench.TOTAL_QUIET_RATIO == 0.75


def test_streaming_min3_members_are_catalog_queries():
    ghosts = [n for n in bench.STREAMING_MIN3 if n not in QUERIES]
    assert not ghosts, ghosts


def test_shared_cache_first_consumer_gets_one_cold_rep():
    """The first present member of each shared persisted cache records
    its one COLD rep (min-of-reps would silently drop the build cost
    from the headline — round-8 ADVICE)."""
    names = [n for n in bench.HEADLINE if n in QUERIES]
    one_rep = bench._one_rep_names(names)
    for members in bench.SHARED_CACHE_GROUPS.values():
        present = [m for m in members if m in names]
        if present:
            first = min(present, key=names.index)
            assert first in one_rep, (members, first)


def test_catalog_cost_hints_cover_every_query():
    import json
    import os

    with open(os.path.join(bench.REPO_ROOT, "catalog_cost_hints.json")) as f:
        hints = json.load(f)["queries"]
    unhinted = sorted(set(QUERIES) - set(hints))
    # new queries default to 0.3s in the rotation — a missing hint is
    # not fatal, but the round's additions should land with hints so
    # the 50-slot window orders honestly
    assert not unhinted, f"queries without cost hints: {unhinted}"
    assert set(ORACLES) <= set(QUERIES)
