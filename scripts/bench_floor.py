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

Level-vs-variance distinction (round 9): `noise_factor` conflates a
CONTENDED host (fluctuating) with a STEADY host running at a uniformly
slower epoch (governor/thermal state) — the latter showed cal_before ==
cal_after within 1.5% across repeated full sweeps while reading 1.34.
When the two calibration samples agree within STEADY_TOL, the host level
is trustworthy: the gate scales each floor threshold by the measured
level (times inflate ~uniformly with it) and adjudicates CONCLUSIVELY —
real breaches fail, zero breaches pass, no strike. Only a noisy AND
unsteady run is unattributable. --update still refuses anything above
NOISE_MAX, so floors keep quiet-host geometry.

A persistently contended host can't ride green forever (round 8): each
inconclusive (noisy + over-floor) gate run bumps a strike counter
(.bench_floor_strikes next to the floor file); any conclusive run resets
it. After MAX_STRIKES consecutive inconclusive runs the gate fails with
exit 3 — breaches have gone unattributed too long to keep shipping.

Floorless-query re-baseline (round 11): the host has held a STEADY
1.33-1.43x calibration level for four consecutive rounds — a slower
epoch, not contention — so --update's quiet-host requirement left every
query added since round 7 with no committed floor at all (8 by round
10). --update-new resolves that deadlock with the same level rule the
gate already trusts for adjudication: on a steady run within LEVEL_MAX
it ingests floors ONLY for queries that have none, at t/level
(recovering quiet-host geometry), and never touches existing entries or
_cal_sec — so r7-geometry floors can't be poisoned, and new queries
stop shipping ungated.

Intentional-optimization re-baseline (round 13): when a query is made
several times faster on purpose (r12's q_bpe_encode: 9.3s -> 0.6s), its
committed floor is dead as a regression gate — 2x a floor that is itself
~8x the steady time would admit a huge regression silently. Floors only
ever min-merge, so the stale-high entry never heals on its own.
--rebase q1,q2 resets ONLY the named queries to t/level under the same
steady-host rule --update-new trusts, and refuses to move a floor UP
(loosening stays impossible).

Intentional-feature-growth re-baseline (round 14): the symmetric case —
a query deliberately made BIGGER after its floor was set (r14's
q_media_exif: the sub-IFD pointer-follow doubled the parsed surface one
day after the 0.766 floor landed) reads as permanent upward "drift"
against a floor that measures a smaller query. --regrow q1,q2 resets
the named queries to t/level UPWARD-only, under the same steady-host
rule; because regrow LOOSENS a gate, the SCALE.md citation is
MECHANICAL — regrow refuses unless the query name already appears in
SCALE.md (write the adjudication first) — and it refuses to move a
floor DOWN (that's --rebase / min-merge --update territory).

Usage:
  python3 scripts/bench_floor.py bench_out.json              # gate
  python3 scripts/bench_floor.py --update bench_out.json     # merge mins into the floor
  python3 scripts/bench_floor.py --update-new bench_out.json # add missing floors at t/level
  python3 scripts/bench_floor.py --rebase q1,q2 bench_out.json # reset named floors to t/level
  python3 scripts/bench_floor.py --regrow q1,q2 bench_out.json # raise named floors to t/level
Exit codes: 0 green/first-strikes, 1 real breach or bad --update,
3 too many consecutive inconclusive runs.
"""
import json, os, re, sys

FACTOR = 2.0
NOISE_MAX = 1.3   # max calibration slowdown accepted as a "quiet host"
STEADY_TOL = 1.06 # cal_before/cal_after agreement that makes the level trustworthy
LEVEL_MAX = 2.0   # past this even a steady host is too far from floor geometry
MAX_STRIKES = 3   # consecutive inconclusive runs tolerated before exit 3
# env overrides exist for the lifecycle test (test_bench_floor.sh) only
FLOOR = os.environ.get("GRAFT_FLOOR_FILE",
                       os.path.join(os.path.dirname(__file__), "bench_floor.json"))
STRIKES = os.environ.get("GRAFT_STRIKE_FILE",
                         os.path.join(os.path.dirname(__file__), ".bench_floor_strikes"))
SCALE_MD = os.environ.get("GRAFT_SCALE_FILE",
                          os.path.join(os.path.dirname(__file__), "..", "SCALE.md"))

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
    update_new = "--update-new" in args
    rebase = None
    if "--rebase" in args:
        i = args.index("--rebase")
        if i + 1 >= len(args):
            print("usage: bench_floor.py --rebase q1,q2 bench_out.json")
            return 1
        rebase = [q for q in args[i + 1].split(",") if q]
        del args[i:i + 2]
    regrow = None
    if "--regrow" in args:
        i = args.index("--regrow")
        if i + 1 >= len(args):
            print("usage: bench_floor.py --regrow q1,q2 bench_out.json")
            return 1
        regrow = [q for q in args[i + 1].split(",") if q]
        del args[i:i + 2]
    args = [a for a in args if a not in ("--update", "--update-new")]
    bench_file = args[0] if args else "bench_out.json"
    bench = json.load(open(bench_file))
    queries = bench["queries"]
    noise = bench.get("noise_factor")
    cal = [bench.get(k) for k in ("cal_before_sec", "cal_after_sec")]
    cal = [c for c in cal if c is not None]
    floor = json.load(open(FLOOR)) if os.path.exists(FLOOR) else {}
    noisy = noise is not None and noise > NOISE_MAX
    # steady-but-slower host: both calibration samples agree, so the level
    # is real and uniformly inflates every query — scale thresholds by it
    steady = (len(cal) == 2 and min(cal) > 0
              and max(cal) / min(cal) <= STEADY_TOL)
    level = noise if (noisy and steady and noise <= LEVEL_MAX) else 1.0

    if update_new:
        # steady-epoch re-baseline for queries with NO floor: divide by the
        # measured level to recover quiet-host geometry; never touch
        # existing entries (min-merge of scaled values could poison them
        # if the level estimate overshoots a given query's true inflation)
        if noise is None or not steady:
            print("REFUSED: --update-new needs a run with a STEADY calibration "
                  "pair (cal_before ~= cal_after) so the level is trustworthy")
            return 1
        if noise > LEVEL_MAX:
            print(f"REFUSED: level {noise:.2f} > {LEVEL_MAX:g} — too far from "
                  "floor geometry even for a steady host")
            return 1
        lvl = max(noise, 1.0)
        added = []
        for q, t in sorted(queries.items()):
            if q not in floor:
                floor[q] = round(t / lvl, 3)
                added.append(q)
        if not added:
            print("nothing to add: every benched query already has a floor")
            return 0
        json.dump(floor, open(FLOOR, "w"), indent=1, sort_keys=True)
        for q in added:
            print(f"ADDED {q}: {floor[q]:.3f}s ({queries[q]:.3f}s / level {lvl:.2f})")
        print(f"floor updated (new-only): +{len(added)} -> {FLOOR}")
        return 0

    if rebase is not None:
        # same trust rule as --update-new, but for NAMED existing entries
        # whose floor a deliberate optimization has made stale-high
        if noise is None or not steady:
            print("REFUSED: --rebase needs a run with a STEADY calibration "
                  "pair (cal_before ~= cal_after) so the level is trustworthy")
            return 1
        if noise > LEVEL_MAX:
            print(f"REFUSED: level {noise:.2f} > {LEVEL_MAX:g} — too far from "
                  "floor geometry even for a steady host")
            return 1
        lvl = max(noise, 1.0)
        # validate EVERY name/value before printing or writing anything:
        # a partial transcript of REBASED lines followed by a refusal
        # would claim rebases that were never persisted
        for q in rebase:
            if q not in queries:
                print(f"REFUSED: {q} is not in this bench run")
                return 1
            v = round(queries[q] / lvl, 3)
            if q in floor and v >= floor[q]:
                print(f"REFUSED: {q} rebase {v:.3f}s would not LOWER its "
                      f"floor {floor[q]:.3f}s — --rebase is for stale-high "
                      "floors only; a min-merge --update covers the rest")
                return 1
        for q in rebase:
            v = round(queries[q] / lvl, 3)
            old = floor.get(q)
            floor[q] = v
            print(f"REBASED {q}: {old if old is None else f'{old:.3f}'}s -> "
                  f"{v:.3f}s ({queries[q]:.3f}s / level {lvl:.2f})")
        json.dump(floor, open(FLOOR, "w"), indent=1, sort_keys=True)
        print(f"floor updated (rebase): {len(rebase)} entr"
              f"{'y' if len(rebase) == 1 else 'ies'} -> {FLOOR}")
        return 0

    if regrow is not None:
        # the UP-only mirror of --rebase, for a floor made stale-LOW by a
        # deliberate feature growth (the query now does measurably more
        # work than the one the floor measured). Because this LOOSENS a
        # gate, the SCALE.md citation is checked mechanically below.
        if noise is None or not steady:
            print("REFUSED: --regrow needs a run with a STEADY calibration "
                  "pair (cal_before ~= cal_after) so the level is trustworthy")
            return 1
        if noise > LEVEL_MAX:
            print(f"REFUSED: level {noise:.2f} > {LEVEL_MAX:g} — too far from "
                  "floor geometry even for a steady host")
            return 1
        lvl = max(noise, 1.0)
        try:
            scale_text = open(SCALE_MD).read()
        except OSError:
            scale_text = ""
        for q in regrow:
            if q not in queries:
                print(f"REFUSED: {q} is not in this bench run")
                return 1
            if q not in floor:
                print(f"REFUSED: {q} has no floor — --update-new covers "
                      "first-time entries")
                return 1
            # the audit is mechanical, not convention: loosening a gate
            # requires the paper trail to EXIST before the floor moves.
            # Word-boundary match, not substring: q_media_decode must not
            # ride on a q_media_decode_jpeg citation (names are prefixes
            # of each other across the query families).
            if not re.search(r"\b" + re.escape(q) + r"\b(?!_)", scale_text):
                print(f"REFUSED: {q} is not cited in {SCALE_MD} — a regrow "
                      "loosens a gate, so the feature-growth adjudication "
                      "must be written down (SCALE.md r-section naming the "
                      "query) BEFORE the floor moves")
                return 1
            v = round(queries[q] / lvl, 3)
            if v <= floor[q]:
                print(f"REFUSED: {q} regrow {v:.3f}s would not RAISE its "
                      f"floor {floor[q]:.3f}s — --regrow is for stale-low "
                      "floors only (a feature made the query bigger); use "
                      "--rebase for stale-high ones")
                return 1
        for q in regrow:
            v = round(queries[q] / lvl, 3)
            old = floor[q]
            floor[q] = v
            print(f"REGROWN {q}: {old:.3f}s -> {v:.3f}s "
                  f"({queries[q]:.3f}s / level {lvl:.2f}) — cite the feature "
                  "change in SCALE.md")
        json.dump(floor, open(FLOOR, "w"), indent=1, sort_keys=True)
        print(f"floor updated (regrow): {len(regrow)} entr"
              f"{'y' if len(regrow) == 1 else 'ies'} -> {FLOOR}")
        return 0

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

    if level != 1.0:
        print(f"host level: steady calibration at {noise:.2f}x the committed "
              f"quiet-host floor - thresholds scaled by {level:.2f}, "
              "adjudicating conclusively")
    breaches, new = [], []
    for q, t in sorted(queries.items()):
        f = floor.get(q)
        if f is None:
            new.append(q)
        elif t > FACTOR * f * level:
            breaches.append((q, t, f))
    for q in new:
        print(f"NOTE {q}: no floor entry (new query) - run --update to add")
    unattrib = noisy and level == 1.0  # noisy AND unsteady: can't attribute
    for q, t, f in breaches:
        tag = "UNATTRIBUTABLE (noisy host)" if unattrib else "BREACH"
        print(f"{tag} {q}: {t:.3f}s > {FACTOR:g}x floor {f:.3f}s"
              + (f" x level {level:.2f}" if level != 1.0 else ""))
    if breaches and unattrib:
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
        why = ("" if noise is None else
               f" (noise_factor {noise:.2f}: "
               + ("steady host, level-corrected — these are real)"
                  if level != 1.0 else "host quiet — these are real)"))
        print(f"PERF FLOOR FAILED: {len(breaches)} breach(es)" + why)
        return 1
    gated = len(queries) - len(new)
    print(f"perf floor ok: {gated} gated, {len(new)} new"
          + (f", noise_factor {noise:.2f}" if noise is not None else ""))
    return 0

if __name__ == "__main__":
    sys.exit(main())
