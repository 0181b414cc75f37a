#!/usr/bin/env python3
"""Per-query perf-floor gate (dev tooling; not part of the library).

Compares a bench_out.json run against the committed floor file
(scripts/bench_floor.json = the best observed per-query seconds). A query
slower than FACTOR x its floor fails the gate — the automated catch for
regressions like round 5's q_simhash 4x. Queries without a floor entry
(new queries) pass with a note and should be added on the next --update.

Host-contention awareness (round 7): graft.Bench emits a `noise_factor`
(calibration loop vs the committed quiet-host `_cal_sec` floor). The gate
refuses to FAIL on a noisy run (breaches are reported as UNATTRIBUTABLE —
rerun on a quiet host), and --update refuses to ingest one entirely, so a
contended run can neither poison the floors nor masquerade as a
regression. Floors only ever go DOWN (min-merge); `_cal_sec` likewise.

A persistently contended host can't ride green forever (round 8): each
inconclusive (noisy + over-floor) gate run bumps a strike counter
(.bench_floor_strikes next to the floor file); any conclusive run resets
it. After MAX_STRIKES consecutive inconclusive runs the gate fails with
exit 3 — breaches have gone unattributed too long to keep shipping.

Usage:
  python3 scripts/bench_floor.py bench_out.json            # gate
  python3 scripts/bench_floor.py --update bench_out.json   # merge mins into the floor
Exit codes: 0 green/first-strikes, 1 real breach or bad --update,
3 too many consecutive inconclusive runs.
"""
import json, os, sys

FACTOR = 2.0
NOISE_MAX = 1.3   # max calibration slowdown accepted as a "quiet host"
MAX_STRIKES = 3   # consecutive inconclusive runs tolerated before exit 3
# env overrides exist for the lifecycle test (test_bench_floor.sh) only
FLOOR = os.environ.get("GRAFT_FLOOR_FILE",
                       os.path.join(os.path.dirname(__file__), "bench_floor.json"))
STRIKES = os.environ.get("GRAFT_STRIKE_FILE",
                         os.path.join(os.path.dirname(__file__), ".bench_floor_strikes"))

def read_strikes():
    try:
        return int(open(STRIKES).read().strip())
    except (OSError, ValueError):
        return 0

def write_strikes(n):
    if n <= 0:
        try: os.remove(STRIKES)
        except OSError: pass
    else:
        open(STRIKES, "w").write(str(n))

def main():
    args = sys.argv[1:]
    update = "--update" in args
    args = [a for a in args if a != "--update"]
    bench_file = args[0] if args else "bench_out.json"
    bench = json.load(open(bench_file))
    queries = bench["queries"]
    noise = bench.get("noise_factor")
    cal = [bench.get(k) for k in ("cal_before_sec", "cal_after_sec")]
    cal = [c for c in cal if c is not None]
    floor = json.load(open(FLOOR)) if os.path.exists(FLOOR) else {}
    noisy = noise is not None and noise > NOISE_MAX

    if update:
        if noisy:
            print(f"REFUSED: noise_factor {noise:.2f} > {NOISE_MAX:g} — "
                  "this run was host-contended; floors must come from a quiet host")
            return 1
        if noise is None and "_cal_sec" in floor:
            print("REFUSED: run has no noise_factor but a calibration floor "
                  "exists — re-run with the current graft.Bench")
            return 1
        for q, t in queries.items():
            floor[q] = round(min(t, floor.get(q, t)), 3)
        if cal:
            c = min(cal)
            floor["_cal_sec"] = round(min(c, floor.get("_cal_sec", c)), 3)
        json.dump(floor, open(FLOOR, "w"), indent=1, sort_keys=True)
        print(f"floor updated: {len(floor)} entries -> {FLOOR}"
              + (f" (noise_factor {noise:.2f})" if noise is not None else ""))
        return 0

    breaches, new = [], []
    for q, t in sorted(queries.items()):
        f = floor.get(q)
        if f is None:
            new.append(q)
        elif t > FACTOR * f:
            breaches.append((q, t, f))
    for q in new:
        print(f"NOTE {q}: no floor entry (new query) - run --update to add")
    for q, t, f in breaches:
        tag = "UNATTRIBUTABLE (noisy host)" if noisy else "BREACH"
        print(f"{tag} {q}: {t:.3f}s > {FACTOR:g}x floor {f:.3f}s")
    if breaches and noisy:
        strikes = read_strikes() + 1
        write_strikes(strikes)
        print(f"PERF FLOOR INCONCLUSIVE: {len(breaches)} over-floor quer"
              f"{'y' if len(breaches) == 1 else 'ies'} on a contended host "
              f"(noise_factor {noise:.2f} > {NOISE_MAX:g}) — rerun quiet to attribute"
              f" [strike {strikes}/{MAX_STRIKES}]")
        if strikes >= MAX_STRIKES:
            print(f"PERF FLOOR FAILED: {strikes} consecutive inconclusive runs — "
                  "breaches have gone unattributed too long; find a quiet host")
            return 3
        return 0
    write_strikes(0)  # any conclusive gate run resets the strike counter
    if breaches:
        print(f"PERF FLOOR FAILED: {len(breaches)} breach(es)"
              + (f" (noise_factor {noise:.2f}: host quiet — these are real)"
                 if noise is not None else ""))
        return 1
    gated = len(queries) - len(new)
    print(f"perf floor ok: {gated} gated, {len(new)} new"
          + (f", noise_factor {noise:.2f}" if noise is not None else ""))
    return 0

if __name__ == "__main__":
    sys.exit(main())
