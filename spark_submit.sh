#!/usr/bin/env bash
# spark-submit launcher parity with the reference's run script
# (/root/reference/spark_submit_script.sh:22-27 — local[*] master,
# named app, driver memory from conf/spark-defaults.conf:1).
#
# Usage:
#   ./spark_submit.sh [INPUT_CSV [OUTPUT_DIR [extra CLI flags...]]]
#
# The app is the engine's CLI (flight_delay_prediction_using_pyspark_spark.app.cli),
# which accepts the reference's flags (--plane-data, --test-file,
# --count-only, --label-threshold). SPARK_SUBMIT_BIN overrides the
# spark-submit binary; when none is found the script falls back to
# plain `python -m`, which is the same local[*] execution path (PySpark
# starts the identical in-process JVM) — there is no separate cluster
# deploy mode on this box.
set -euo pipefail

REPO_DIR="$(cd "$(dirname "${BASH_SOURCE[0]}")" && pwd)"
APP_NAME="FlightDelayPredictionApp"
INPUT_FILE="${1:-/root/testdata/flights.csv.bz2}"
OUTPUT_DIR="${2:-${REPO_DIR}/output}"
shift $(( $# > 2 ? 2 : $# )) || true

SUBMIT="${SPARK_SUBMIT_BIN:-$(command -v spark-submit || true)}"
export PYTHONPATH="${REPO_DIR}${PYTHONPATH:+:${PYTHONPATH}}"

if [ -n "${SUBMIT}" ]; then
  exec "${SUBMIT}" \
    --master "local[*]" \
    --name "${APP_NAME}" \
    --conf spark.logConf=true \
    --conf spark.driver.memory="${SPARK_DRIVER_MEMORY:-40g}" \
    --conf spark.sql.adaptive.enabled=true \
    "${REPO_DIR}/flight_delay_prediction_using_pyspark_spark/app/cli.py" \
    "${INPUT_FILE}" "${OUTPUT_DIR}" "$@"
else
  exec python -m flight_delay_prediction_using_pyspark_spark.app.cli \
    "${INPUT_FILE}" "${OUTPUT_DIR}" "$@"
fi
