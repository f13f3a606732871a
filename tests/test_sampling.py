"""Sampling operator tests: hash-sample determinism/disjointness and
the seeded M1 samplers."""

from __future__ import annotations

from pyspark.sql import functions as F

from flight_delay_prediction_using_pyspark_spark.operators import sampling as S


def test_hash_sample_deterministic_and_disjoint(spark):
    df = spark.createDataFrame([(i,) for i in range(2000)], ["id"])
    parts = [S.hash_sample(df, "id", 4, r) for r in range(4)]
    counts = [p.count() for p in parts]
    assert sum(counts) == 2000  # folds are exhaustive
    for c in counts:
        assert 400 < c < 600  # roughly uniform quarters
    # determinism: same filter, same rows — and repartitioning the
    # input does not change membership (unlike seeded sample())
    again = {r.id for r in S.hash_sample(df.repartition(7), "id", 4, 0).collect()}
    first = {r.id for r in parts[0].collect()}
    assert again == first


def test_bernoulli_sample_seeded(spark):
    df = spark.createDataFrame([(i,) for i in range(5000)], ["id"])
    a = S.bernoulli_sample(df, 0.2, seed=7).count()
    b = S.bernoulli_sample(df, 0.2, seed=7).count()
    assert a == b  # same seed+partitioning reproduces
    assert 800 < a < 1200


def test_stratified_sample(spark):
    df = spark.createDataFrame(
        [(i, "a" if i % 10 else "b") for i in range(5000)], ["id", "s"]
    )
    out = S.stratified_sample(df, "s", {"a": 0.1, "b": 1.0})
    by = {r.s: r.n for r in out.groupBy("s").agg(F.count("*").alias("n")).collect()}
    assert by["b"] == 500  # rare stratum fully kept
    assert 300 < by["a"] < 600


def _brute_priorities(rows, salt="ps_"):
    """Reference priorities computed with hashlib — pins the Spark
    md5_hash60-based uniform to the textbook construction."""
    import hashlib

    out = []
    for key, w in rows:
        h = int(hashlib.md5(f"{salt}{key}".encode()).hexdigest()[:15], 16)
        u = (h + 1) / 2**60
        out.append((w / u, key, w))
    return sorted(out, reverse=True)


def test_priority_sample_matches_textbook_and_partitioning(spark):
    rows = [(i, 10 + (i * 7) % 50) for i in range(200)]
    df = spark.createDataFrame(rows, ["id", "w"])
    got = S.priority_sample(df, "id", "w", k=15).collect()
    ref = _brute_priorities(rows)
    assert {r.id for r in got} == {key for _, key, _ in ref[:15]}
    tau = got[0].tau
    assert all(abs(r.tau - tau) == 0 for r in got)
    assert tau == ref[15][0]  # the (k+1)-th priority, bit-equal
    # membership is partition-insensitive (the whole point vs sample())
    again = {r.id for r in S.priority_sample(df.repartition(7), "id", "w", 15).collect()}
    assert again == {r.id for r in got}


def test_priority_sample_exhaustive_group_is_exact(spark):
    from pyspark.sql import functions as F2

    rows = [("a", i, 5 + i) for i in range(8)] + [
        ("b", 100 + i, 3 + i) for i in range(40)
    ]
    df = spark.createDataFrame(rows, ["g", "id", "w"])
    samp = S.priority_sample(df, "id", "w", k=10, group_cols=("g",))
    est = (
        samp.groupBy("g")
        .agg(
            F2.count(F2.lit(1)).alias("k_eff"),
            F2.sum(F2.greatest(F2.col("w").cast("double"), F2.col("tau"))).alias("est"),
        )
        .collect()
    )
    by = {r.g: r for r in est}
    # group a has 8 ≤ k=10 rows → exhaustive: τ=0 and the DLT
    # estimate degenerates to the exact sum
    assert by["a"].k_eff == 8
    assert by["a"].est == sum(5 + i for i in range(8))
    assert by["b"].k_eff == 10


def test_priority_sample_drops_nonpositive_weights(spark):
    df = spark.createDataFrame(
        [(1, 0), (2, -3), (3, 7), (4, 2)], ["id", "w"]
    )
    got = {r.id for r in S.priority_sample(df, "id", "w", k=10).collect()}
    assert got == {3, 4}


def test_priority_sample_estimator_unbiased_over_salts(spark):
    """Monte-carlo over salt choices: the DLT estimate Σ max(w, τ)
    averages to the true Σ w (within 4σ of the measured spread)."""
    import statistics

    rows = [(i, 10 + (i * 13) % 90) for i in range(120)]
    true = sum(w for _, w in rows)
    ests = []
    for t in range(60):
        ref = _brute_priorities(rows, salt=f"t{t}_")
        tau = ref[12][0]
        ests.append(sum(max(w, tau) for _, _, w in ref[:12]))
    mean, sd = statistics.mean(ests), statistics.stdev(ests)
    assert abs(mean - true) < 4 * sd / len(ests) ** 0.5


def test_coordinated_join_sampling_beats_independent():
    """40-salt Monte Carlo behind
    orders_join_size_coordinated_sample's variance claim: both arms
    are near-unbiased, but the independent-sides arm (match prob p²)
    carries several times the coordinated arm's RMS error on the same
    per-key join profile. Pure hashlib/duckdb — no Spark session."""
    import hashlib
    import math

    import duckdb

    from tests.conftest import SF_SMOKE_DIR

    rows = duckdb.sql(
        f"""
        SELECT o.o_orderkey AS k, COUNT(*) AS j
        FROM '{SF_SMOKE_DIR}/lineitem.parquet' l
        JOIN '{SF_SMOKE_DIR}/orders.parquet' o
          ON l.l_orderkey = o.o_orderkey
        WHERE o.o_totalprice > 150000
        GROUP BY 1
        """
    ).fetchall()
    true_j = sum(j for _, j in rows)

    def h(salt, k):
        return int(hashlib.md5(f"{salt}{k}".encode()).hexdigest()[:15], 16)

    coord_err, indep_err = [], []
    for t in range(40):
        js = sum(j for k, j in rows if h(f"cs{t}_", k) % 20 == 0)
        ji = sum(
            j
            for k, j in rows
            if h(f"csa{t}_", k) % 20 == 0 and h(f"csb{t}_", k) % 20 == 0
        )
        coord_err.append(20 * js - true_j)
        indep_err.append(400 * ji - true_j)

    def rms(xs):
        return math.sqrt(sum(x * x for x in xs) / len(xs))

    # near-unbiased both arms (means within half an RMS of zero) ...
    assert abs(sum(coord_err)) / 40 < rms(coord_err) / 2
    assert abs(sum(indep_err)) / 40 < rms(indep_err) / 2
    # ... but the independent arm's spread is several times larger
    # (measured ratio ~5.0; assert a conservative 2x)
    assert rms(indep_err) > 2 * rms(coord_err)


def test_poisson_bootstrap_ci_coverage():
    """120-trial Monte Carlo behind lineitem_bootstrap_ci_mean: the
    (2nd, 31st)-order-statistic interval of B=32 Poisson-bootstrap
    replicate means captures the population mean at roughly its
    nominal ~93.75% rate. Replays the exact integer pipeline
    (32-bit md5 slices → threshold weights → truncated-cent means)
    in pure hashlib over the sf0.001 sample."""
    import hashlib

    import duckdb

    from flight_delay_prediction_using_pyspark_spark.plans.temporal_queries import (
        _BOOT_B,
        _POIS1_T32,
    )
    from tests.conftest import SF_SMOKE_DIR

    rows = duckdb.sql(
        f"""
        SELECT l_orderkey, l_linenumber,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS xc
        FROM '{SF_SMOKE_DIR}/lineitem.parquet'
        """
    ).fetchall()
    true_mean = sum(r[2] for r in rows) // len(rows)

    def u32(salt, key, i):
        return int(
            hashlib.md5(f"{salt}_{key}".encode()).hexdigest()[8 * i : 8 * i + 8],
            16,
        )

    covered = 0
    trials = 120
    for t in range(trials):
        samp = [
            r
            for r in rows
            if int(
                hashlib.md5(
                    f"t{t}_{r[0]}_{r[1]}".encode()
                ).hexdigest()[:8],
                16,
            )
            % 10
            == 0
        ]
        means = []
        for b in range(_BOOT_B):
            j, i = divmod(b, 4)
            n_b = s_b = 0
            for ok, ln, xc in samp:
                u = u32(f"t{t}bs{j}", f"{ok}_{ln}", i)
                w = sum(1 for thr in _POIS1_T32 if u >= thr)
                n_b += w
                s_b += w * xc
            means.append(s_b // n_b)
        means.sort()
        if means[1] <= true_mean <= means[_BOOT_B - 2]:
            covered += 1
    rate = covered / trials
    # nominal 93.75%; 120 trials give sd ≈ 2.2%, assert a loose floor
    # that still catches a broken weight map or interval indexing
    assert rate >= 0.82, f"bootstrap CI coverage {rate:.2f} < 0.82"


def test_poisson_bootstrap_grouped_ci_coverage():
    """Grouped-CI Monte Carlo behind lineitem_bootstrap_ci_grouped
    (40 trials × 3 l_returnflag groups = 120 group-intervals): the
    (B/32+1, B−B/32)-rank interval at B=64 captures each GROUP's
    population mean at roughly the same ~93.75% nominal rate as the
    flagship's B=32 interval — the rank rule holds the level while B
    changes. Pure-hashlib replay of the exact integer pipeline over
    sf0.001, including the GREATEST(n_b, 1) degenerate-replicate
    guard."""
    import hashlib

    import duckdb

    from flight_delay_prediction_using_pyspark_spark.plans.temporal_queries import (
        _BOOT_B_GROUPED,
        _POIS1_T32,
        _boot_ranks,
    )
    from tests.conftest import SF_SMOKE_DIR

    assert _boot_ranks(32) == (2, 31)  # flagship ranks reproduced
    lo_rank, hi_rank = _boot_ranks(_BOOT_B_GROUPED)
    rows = duckdb.sql(
        f"""
        SELECT l_returnflag, l_orderkey, l_linenumber,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS xc
        FROM '{SF_SMOKE_DIR}/lineitem.parquet'
        """
    ).fetchall()
    groups = sorted({r[0] for r in rows})
    true_mean = {
        g: sum(r[3] for r in rows if r[0] == g)
        // sum(1 for r in rows if r[0] == g)
        for g in groups
    }

    covered = total = 0
    for t in range(40):
        samp = [
            r
            for r in rows
            if int(
                hashlib.md5(f"t{t}_{r[1]}_{r[2]}".encode()).hexdigest()[:8],
                16,
            )
            % 10
            == 0
        ]
        for g in groups:
            gs = [r for r in samp if r[0] == g]
            if not gs:
                continue
            means = []
            for b in range(_BOOT_B_GROUPED):
                j, i = divmod(b, 4)
                n_b = s_b = 0
                for _g, ok, ln, xc in gs:
                    u = int(
                        hashlib.md5(f"t{t}bg{j}_{ok}_{ln}".encode())
                        .hexdigest()[8 * i : 8 * i + 8],
                        16,
                    )
                    w = sum(1 for thr in _POIS1_T32 if u >= thr)
                    n_b += w
                    s_b += w * xc
                means.append(s_b // max(n_b, 1))
            means.sort()
            total += 1
            if means[lo_rank - 1] <= true_mean[g] <= means[hi_rank - 1]:
                covered += 1
    rate = covered / total
    # nominal 93.75%; 120 group-intervals give sd ≈ 2.2% but group
    # samples are ~3x smaller than the flagship's, so allow the same
    # loose floor that still catches broken ranks or weight maps
    assert rate >= 0.80, f"grouped bootstrap CI coverage {rate:.2f} < 0.80"


def test_grouped_bootstrap_arms_agree_at_higher_b(spark):
    """The persist-barrier arm of the md5-recompute trade changes the
    PLAN, never the values: at B=128 both arms of
    _grouped_bootstrap_ci are row-identical (same weights, same
    ranks, same intervals), so the crossover experiment in SCALE.md
    is timing two implementations of one function."""
    from flight_delay_prediction_using_pyspark_spark.plans.temporal_queries import (
        _grouped_bootstrap_ci,
    )
    from tests.conftest import SF_SMOKE_DIR

    a = (
        _grouped_bootstrap_ci(spark, SF_SMOKE_DIR, 128)
        .orderBy("l_returnflag")
        .collect()
    )
    b = (
        _grouped_bootstrap_ci(spark, SF_SMOKE_DIR, 128, persist_sample=True)
        .orderBy("l_returnflag")
        .collect()
    )
    assert a == b
    assert len(a) == 3
    for r in a:
        assert r.ci_lo_c <= r.ci_hi_c
