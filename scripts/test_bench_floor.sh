#!/usr/bin/env bash
# Strike-file lifecycle test for bench_floor.py (dev tooling test; run by
# scripts/ci.sh --bench before the real gate). The exit-code contract under
# test:
#   0 = green, or an inconclusive (noisy+unsteady) run below MAX_STRIKES
#   1 = real breach (quiet host, or steady host after level correction),
#       or a refused --update
#   3 = MAX_STRIKES consecutive inconclusive runs (unattributed too long)
# Uses the GRAFT_FLOOR_FILE/GRAFT_STRIKE_FILE overrides so the committed
# floor file and live strike counter are never touched.
set -euo pipefail
cd "$(dirname "$0")"
td=$(mktemp -d)
trap 'rm -rf "$td"' EXIT
export GRAFT_FLOOR_FILE="$td/floor.json" GRAFT_STRIKE_FILE="$td/strikes" \
       GRAFT_SCALE_FILE="$td/scale.md"
echo "adjudication: q1 grew on purpose" > "$GRAFT_SCALE_FILE"

mkjson() { # $1=file $2=q1 seconds $3=noise_factor $4=cal_before $5=cal_after
  printf '{"queries":{"q1":%s},"noise_factor":%s,"cal_before_sec":%s,"cal_after_sec":%s}\n' \
    "$2" "$3" "$4" "$5" > "$1"
}
rc() { set +e; python3 bench_floor.py "$1" >/dev/null; local r=$?; set -e; echo "$r"; }
die() { echo "FAIL: $1" >&2; exit 1; }

echo '{"q1": 1.0, "_cal_sec": 1.0}' > "$GRAFT_FLOOR_FILE"

# quiet host, under 2x floor: green, no strike file
mkjson "$td/ok.json" 1.5 1.05 1.05 1.05
[[ $(rc "$td/ok.json") == 0 ]] || die "quiet green run must exit 0"
[[ ! -f "$GRAFT_STRIKE_FILE" ]] || die "green run must leave no strike file"

# noisy AND unsteady + over-floor: strikes 1, 2 (exit 0), then 3 -> exit 3
mkjson "$td/noisy.json" 9.0 1.6 1.0 1.6
[[ $(rc "$td/noisy.json") == 0 ]] || die "strike 1 must exit 0"
[[ $(cat "$GRAFT_STRIKE_FILE") == 1 ]] || die "strike file must read 1"
[[ $(rc "$td/noisy.json") == 0 ]] || die "strike 2 must exit 0"
[[ $(cat "$GRAFT_STRIKE_FILE") == 2 ]] || die "strike file must read 2"
[[ $(rc "$td/noisy.json") == 3 ]] || die "strike 3 must exit 3"
[[ $(cat "$GRAFT_STRIKE_FILE") == 3 ]] || die "strike file must read 3"

# any conclusive run resets the counter
[[ $(rc "$td/ok.json") == 0 ]] || die "conclusive run after strikes must exit 0"
[[ ! -f "$GRAFT_STRIKE_FILE" ]] || die "conclusive run must clear the strike file"

# quiet host + over-floor: a REAL breach, exit 1, and no strike accrues
mkjson "$td/breach.json" 9.0 1.05 1.05 1.05
[[ $(rc "$td/breach.json") == 1 ]] || die "quiet breach must exit 1"
[[ ! -f "$GRAFT_STRIKE_FILE" ]] || die "quiet breach must not strike"

# STEADY slower host (cal_before == cal_after, level 1.6): thresholds scale
# by the level — 2.5s < 2 x 1.0 x 1.6 passes conclusively, no strike...
mkjson "$td/steady_ok.json" 2.5 1.6 1.6 1.6
[[ $(rc "$td/steady_ok.json") == 0 ]] || die "steady level-corrected run must pass"
[[ ! -f "$GRAFT_STRIKE_FILE" ]] || die "steady run must not strike"
# ...and 9.0s > 3.2 is a REAL breach (exit 1), not an unattributable strike
mkjson "$td/steady_breach.json" 9.0 1.6 1.6 1.6
[[ $(rc "$td/steady_breach.json") == 1 ]] || die "steady breach must exit 1"
[[ ! -f "$GRAFT_STRIKE_FILE" ]] || die "steady breach must not strike"
# a steady host past LEVEL_MAX is too far from floor geometry: back to
# the unattributable/strike path
mkjson "$td/too_slow.json" 9.0 2.5 2.5 2.5
[[ $(rc "$td/too_slow.json") == 0 ]] || die "over-LEVEL_MAX must strike, not fail"
[[ $(cat "$GRAFT_STRIKE_FILE") == 1 ]] || die "over-LEVEL_MAX must strike 1"
[[ $(rc "$td/ok.json") == 0 ]] # reset

# --update refuses a noisy run outright (steady or not)
set +e; python3 bench_floor.py --update "$td/steady_ok.json" >/dev/null; r=$?; set -e
[[ $r == 1 ]] || die "--update on an above-NOISE_MAX run must exit 1"

# --update-new on a STEADY run: adds ONLY missing floors at t/level,
# never touches existing entries
printf '{"queries":{"q1":9.0,"q2":3.2},"noise_factor":1.6,"cal_before_sec":1.6,"cal_after_sec":1.6}\n' > "$td/new.json"
python3 bench_floor.py --update-new "$td/new.json" >/dev/null \
  || die "--update-new on a steady run must succeed"
python3 - "$GRAFT_FLOOR_FILE" <<'EOF' || die "--update-new floor contents wrong"
import json, sys
f = json.load(open(sys.argv[1]))
assert f["q1"] == 1.0, f          # existing floor untouched (9.0/1.6 NOT merged)
assert f["q2"] == 2.0, f          # new floor = 3.2 / level 1.6
EOF
# unsteady run: refused
set +e; python3 bench_floor.py --update-new "$td/noisy.json" >/dev/null; r=$?; set -e
[[ $r == 1 ]] || die "--update-new on an unsteady run must exit 1"
# past LEVEL_MAX: refused
set +e; python3 bench_floor.py --update-new "$td/too_slow.json" >/dev/null; r=$?; set -e
[[ $r == 1 ]] || die "--update-new past LEVEL_MAX must exit 1"

# --regrow on a STEADY run: RAISES only the named existing floor at
# t/level (the up-only mirror of --rebase, for deliberate feature growth)
printf '{"queries":{"q1":4.8,"q9":2.0},"noise_factor":1.6,"cal_before_sec":1.6,"cal_after_sec":1.6}\n' > "$td/grown.json"
python3 bench_floor.py --regrow q1 "$td/grown.json" >/dev/null \
  || die "--regrow on a steady run must succeed"
python3 - "$GRAFT_FLOOR_FILE" <<'EOF' || die "--regrow floor contents wrong"
import json, sys
f = json.load(open(sys.argv[1]))
assert f["q1"] == 3.0, f          # 4.8 / level 1.6
assert f["q2"] == 2.0, f          # untouched
EOF
# a regrow that would LOWER the floor is refused (that's --rebase's job)
printf '{"queries":{"q1":1.6},"noise_factor":1.6,"cal_before_sec":1.6,"cal_after_sec":1.6}\n' > "$td/down.json"
set +e; python3 bench_floor.py --regrow q1 "$td/down.json" >/dev/null; r=$?; set -e
[[ $r == 1 ]] || die "--regrow that lowers must exit 1"
# a floorless query is refused (that's --update-new's job)
set +e; python3 bench_floor.py --regrow q9 "$td/grown.json" >/dev/null; r=$?; set -e
[[ $r == 1 ]] || die "--regrow on a floorless query must exit 1"
# an unsteady run is refused
set +e; python3 bench_floor.py --regrow q1 "$td/noisy.json" >/dev/null; r=$?; set -e
[[ $r == 1 ]] || die "--regrow on an unsteady run must exit 1"
# a regrow whose query is NOT cited in SCALE.md is refused (the audit is
# mechanical: the paper trail must exist before the gate loosens)
printf '{"queries":{"q2":9.9},"noise_factor":1.6,"cal_before_sec":1.6,"cal_after_sec":1.6}\n' > "$td/grow2.json"
set +e; python3 bench_floor.py --regrow q2 "$td/grow2.json" >/dev/null; r=$?; set -e
[[ $r == 1 ]] || die "--regrow without a SCALE.md citation must exit 1"
python3 - "$GRAFT_FLOOR_FILE" <<'EOF' || die "refused regrow must not move the floor"
import json, sys
assert json.load(open(sys.argv[1]))["q2"] == 2.0
EOF

echo "BENCH FLOOR LIFECYCLE OK"
