#!/usr/bin/env bash
# spark-submit path (north_rule: "runs via spark-submit ... on a
# multi-executor cluster"): the same jar submits unchanged to any master —
# swap --master local[N] for yarn/k8s and add --num-executors for the real
# N vs 4N cluster runs. Sandbox demo uses local mode.
set -euo pipefail
cd "$(dirname "$0")/.."
JAR=target/scala-2.13/a_search_enginespark_2.13-0.1.0.jar
[ -f "$JAR" ] || sbt -batch package
MASTER="${MASTER:-local[8]}"
CLASS="${CLASS:-graft.Verify}"
shiftargs=("$@")
[ ${#shiftargs[@]} -eq 0 ] && shiftargs=(/root/testdata/sf0.001 /tmp/verify-submit)
exec /opt/spark/bin/spark-submit \
  --master "$MASTER" \
  --class "$CLASS" \
  --conf spark.sql.shuffle.partitions=8 \
  --conf spark.sql.session.timeZone=UTC \
  --conf spark.ui.enabled=false \
  --conf spark.sql.extensions=graft.functions.GraftExtensions \
  "$JAR" "${shiftargs[@]}"
