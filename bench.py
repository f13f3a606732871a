"""Benchmark runner: the engine's headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "catalog_total", "value": <sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>}

Each query is timed end-to-end (plan build + execution to a driver-side
count/collect of the result). Run locally at sf0.01 while iterating;
the driver runs sf0.1 per-round.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO_ROOT)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)

    from flight_delay_prediction_using_pyspark_spark.plans.queries import QUERIES
    from flight_delay_prediction_using_pyspark_spark.session import get_spark

    spark = get_spark(app_name="spark-graft-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM + parquet footers once so per-query numbers measure
    # the queries, not session startup.
    QUERIES["pricing_summary"](spark, sf_dir).count()

    timings: dict[str, float] = {}
    for name, fn in QUERIES.items():
        start = time.perf_counter()
        df = fn(spark, sf_dir)
        # Force full execution incl. result materialization to driver.
        df.collect()
        timings[name] = round(time.perf_counter() - start, 2)

    total = round(sum(timings.values()), 2)
    # Diagnostics go to stderr FIRST; the contract JSON line is the very
    # last thing on stdout (compact encoding keeps it small so a
    # tail-capturing harness still sees the whole line), mirrored to
    # bench_last.json as a belt-and-braces copy.
    _report_regressions(timings, sf)
    sys.stderr.flush()
    payload = {
        "metric": "catalog_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    line = json.dumps(payload, separators=(",", ":"))
    with open(os.path.join(REPO_ROOT, "bench_last.json"), "w") as f:
        f.write(line + "\n")
    print(line, flush=True)
    spark.stop()


def _report_regressions(timings: dict[str, float], sf: float) -> None:
    """Compare against the committed baseline (bench_baseline.json) and
    write per-query regressions to STDERR (stdout stays the one-line
    driver contract). Box contention can inflate wall-clock 1.5x+, so
    flag only >1.5x AND >0.5s absolute; rerun isolated before believing
    a regression."""
    path = os.environ.get(
        "SPARK_GRAFT_BASELINE", os.path.join(REPO_ROOT, "bench_baseline.json")
    )
    if not os.path.exists(path):
        return
    with open(path) as f:
        base = json.load(f)
    if base.get("sf") != sf:
        return
    ref = base.get("queries", {})
    regressions = [
        (n, ref[n], t)
        for n, t in timings.items()
        if n in ref and t > 1.5 * ref[n] and t - ref[n] > 0.5
    ]
    if regressions:
        for n, b, t in sorted(regressions, key=lambda r: r[1] - r[2]):
            print(f"REGRESSION {n}: {b:.2f}s -> {t:.2f}s", file=sys.stderr)
    else:
        print("bench: no regressions vs baseline", file=sys.stderr)


if __name__ == "__main__":
    main()
