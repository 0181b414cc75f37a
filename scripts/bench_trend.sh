#!/usr/bin/env bash
# Scale-trend gate: run the heavy queries at sf0.1 and at a synthesized
# 3x-sf0.1 (id-shifted unions, see ScaleSynth.scala) and fail (exit 4) if any
# query's per-SF time ratio scaled/(copies*base) exceeds 1.5 — catches
# super-linear constants the single-SF floors can't see. Same plain-java/16g
# launch geometry as ci.sh --bench so numbers are comparable.
set -euo pipefail
cd "$(dirname "$0")/.."

sbt -batch compile 1>&2

CP="target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
SPARK_GRAFT_SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}" \
  java $OPENS -Xmx16g -Dspark.sql.session.timeZone=UTC -cp "$CP" graft.BenchTrend
echo "TREND GREEN"
