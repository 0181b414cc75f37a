#!/usr/bin/env bash
# One-command green gate (mirrors the reference's lint+pytest CI shape):
#   compile + unit suites + the end-to-end oracle gate at sf0.001/sf0.01.
# Usage: scripts/ci.sh [--fast]   (--fast: sf0.001 oracle gate only)
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== sbt Test/compile =="
sbt -batch Test/compile

echo "== sbt test =="
sbt -batch test

echo "== oracle gate (sf0.001) =="
python3 scripts/check.py /root/testdata/sf0.001 /tmp/graft_ci_sf0001

if [[ "${1:-}" != "--fast" ]]; then
  echo "== oracle gate (sf0.01) =="
  python3 scripts/check.py /root/testdata/sf0.01 /tmp/graft_ci_sf001
fi

echo "CI GREEN"
