#!/usr/bin/env bash
# spark-submit packaging example (north_rule: "runs via spark-submit
# --py-files on multi-executor clusters at N and 4N executors").
#
# The engine is a plain pure-Python package — one zip is the whole
# deployment artifact. On a real cluster swap --master / executor
# counts; the engine's group keys are data-deterministic, so the SAME
# job resumed on a DIFFERENT cluster size picks up exactly the
# uncommitted groups.
set -euo pipefail
cd "$(dirname "$0")/.."

zip -qr /tmp/engine.zip parquet_converter_spark

# N executors
spark-submit \
  --master "${MASTER:-local[8]}" \
  --py-files /tmp/engine.zip \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.shuffle.partitions="${SHUFFLE_PARTITIONS:-128}" \
  --conf spark.sql.session.timeZone=UTC \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  scripts/run_engine.py \
  encode --input "${INPUT:?set INPUT}" --out "${OUT:?set OUT}" "$@"

# 4N executors: identical invocation with --master pointing at the
# larger cluster (or --num-executors 4N on YARN/K8s). Resume semantics
# and group identity are unchanged across cluster sizes.
