#!/usr/bin/env bash
# Round-16 measurement batch: converts the r15 verdict's prose claims into
# committed artifacts. Runs sequentially (one JVM at a time — same
# quiet-host discipline as bench_trend.sh) with the standard plain-java/16g
# launch geometry.
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
run() { java $OPENS -Xmx16g -Dspark.sql.session.timeZone=UTC -cp "$CP" "$@"; }

echo "=== [1/6] 30x trend: simhash classes + export shards ===" >&2
SPARK_GRAFT_TREND_COPIES=30 \
SPARK_GRAFT_TREND_ONLY=q_simhash_classes,q_export_shards \
SPARK_GRAFT_TREND_OUT=trend30_classes.json \
  run graft.BenchTrend || echo "[1/6] FLAGGED OR FAILED (exit $?)" >&2

echo "=== [2/6] 30x trend: event/relational family ===" >&2
SPARK_GRAFT_TREND_COPIES=30 \
SPARK_GRAFT_TREND_ONLY=q_sessionize,q_scd2,q_resample_ffill,q_cdc_apply \
SPARK_GRAFT_TREND_OUT=trend30_events.json \
  run graft.BenchTrend || echo "[2/6] FLAGGED OR FAILED (exit $?)" >&2

echo "=== [3/6] Curate composition at 10x-sf0.1 ===" >&2
SPARK_GRAFT_TREND_COPIES=10 SPARK_GRAFT_TREND_OUT=curate_trend10.json \
  run graft.CurateTrend || echo "[3/6] FAILED (exit $?)" >&2

echo "=== [4/6] 100k-symbol streaming state scale ===" >&2
run graft.StreamKeyScale 100000 30 3 > keyscale_100k.json \
  || echo "[4/6] FAILED (exit $?)" >&2

echo "=== [5/6] materializer strategy sweep ===" >&2
run graft.MatSweep > matsweep_sf01.txt || echo "[5/6] FAILED (exit $?)" >&2

echo "=== [6/6] IVFADC rerank operating-point sweep ===" >&2
run graft.RerankSweep > rerank_sweep.txt || echo "[6/6] FAILED (exit $?)" >&2

echo "R16 MEASURE DONE" >&2
