#!/usr/bin/env bash
# Scale-trend gate: run the heavy queries at sf0.1 and at a synthesized
# 3x-sf0.1 (id-shifted unions, see ScaleSynth.scala) and fail (exit 4) if any
# query's per-SF time ratio scaled/(copies*base) exceeds 1.5 — catches
# super-linear constants the single-SF floors can't see. Same plain-java/16g
# launch geometry as ci.sh --bench so numbers are comparable.
set -euo pipefail
cd "$(dirname "$0")/.."

# --copies N  : scale multiple for the synthesized dir (default 3; the
#               decade point is --copies 10 — run it on the heavy set via
#               SPARK_GRAFT_TREND_ONLY to bound wall time)
# --only a,b  : restrict to a comma-separated query list
while [[ $# -gt 0 ]]; do
  case "$1" in
    --copies) export SPARK_GRAFT_TREND_COPIES="$2"; shift 2 ;;
    --only)   export SPARK_GRAFT_TREND_ONLY="$2"; shift 2 ;;
    *) echo "unknown arg: $1" >&2; exit 2 ;;
  esac
done

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
