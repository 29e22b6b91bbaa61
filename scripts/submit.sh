#!/usr/bin/env bash
# spark-submit launcher: ships the fusion_spark package via --py-files
# (north rule launch mechanism). Extra args go to the job script.
#
#   scripts/submit.sh scripts/build_index_job.py --input ... --index-dir ...
#
# Cluster sizing is controlled by the usual spark-submit flags, e.g.
#   SUBMIT_EXTRA_ARGS="--master yarn --num-executors 8" scripts/submit.sh ...
# (sandbox default: local[${SPARK_GRAFT_CPUS:-32}]; note SPARK_SUBMIT_OPTS
# is reserved by spark-submit itself for JVM options)
set -euo pipefail
REPO_DIR="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
JOB="$1"; shift

ZIP="$(mktemp -d)/fusion_spark.zip"
(cd "$REPO_DIR" && zip -qr "$ZIP" fusion_spark -x '*__pycache__*')

MASTER="${SPARK_MASTER:-local[${SPARK_GRAFT_CPUS:-32}]}"
exec spark-submit \
  --master "$MASTER" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  ${SUBMIT_EXTRA_ARGS:-} \
  --py-files "$ZIP" \
  "$JOB" "$@"
