#!/usr/bin/env bash
# Round-18 measurement batch — the verdict's #1/#7 asks as artifacts:
#   [1] full bench sweep (floor gate + the raw material for --update-new)
#   [2] isolated-JVM adjudication of the three r17 >2x-floor movers
#       (q_ccnet_buckets, q_communities, q_containment) per the r15
#       protocol: one query per fresh JVM, same plain-java/16g geometry
#   [3] 10x trend points for the r18-new/changed queries
#   [4] Curate composition at 10x (refresh) and 30x (new decade point)
# Runs sequentially, one JVM at a time (quiet-host discipline).
set -uo pipefail
cd "$(dirname "$0")/.."

sbt -batch compile 1>&2

CP="target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
run() { java $OPENS -Xmx16g -Dspark.sql.session.timeZone=UTC \
          -Dspark.ui.enabled=false -cp "$CP" "$@"; }

echo "=== [1/4] full bench sweep ===" >&2
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_OUT=bench_out.json \
  run graft.Bench || echo "[1/4] FAILED (exit $?)" >&2

echo "=== [2/4] isolated-JVM adjudication (r15 protocol) ===" >&2
for q in q_ccnet_buckets q_communities q_containment; do
  echo "--- isolated: $q ---" >&2
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_ONLY=$q \
  SPARK_GRAFT_BENCH_OUT=/tmp/iso_$q.json \
    run graft.Bench || echo "[2/4] $q FAILED (exit $?)" >&2
done

echo "=== [3/4] 10x trend: r18-new/changed queries ===" >&2
SPARK_GRAFT_TREND_COPIES=10 \
SPARK_GRAFT_TREND_ONLY=q_repetition_ngrams,q_image_phash_classes \
SPARK_GRAFT_TREND_OUT=trend10_r18new.json \
  run graft.BenchTrend || echo "[3/4] FLAGGED OR FAILED (exit $?)" >&2

echo "=== [4/4] Curate composition at 10x and 30x ===" >&2
SPARK_GRAFT_TREND_COPIES=10 SPARK_GRAFT_TREND_OUT=curate_trend10_r18.json \
  run graft.CurateTrend || echo "[4/4] 10x FAILED (exit $?)" >&2
SPARK_GRAFT_TREND_COPIES=30 SPARK_GRAFT_TREND_OUT=curate_trend30_r18.json \
  run graft.CurateTrend || echo "[4/4] 30x FAILED (exit $?)" >&2

echo "R18 MEASURE DONE" >&2
