#!/usr/bin/env python3
"""Per-query perf-floor gate (dev tooling; not part of the library).

Compares a bench_out.json run against the committed floor file
(scripts/bench_floor.json = the best observed per-query seconds). A query
slower than FACTOR x its floor fails the gate — the automated catch for
regressions like round 5's q_simhash 4x. Queries without a floor entry
(new queries) pass with a note and should be added on the next --update.

Usage:
  python3 scripts/bench_floor.py bench_out.json            # gate (exit 1 on breach)
  python3 scripts/bench_floor.py --update bench_out.json   # merge mins into the floor
"""
import json, os, sys

FACTOR = 2.0
FLOOR = os.path.join(os.path.dirname(__file__), "bench_floor.json")

def main():
    args = sys.argv[1:]
    update = "--update" in args
    args = [a for a in args if a != "--update"]
    bench_file = args[0] if args else "bench_out.json"
    queries = json.load(open(bench_file))["queries"]
    floor = json.load(open(FLOOR)) if os.path.exists(FLOOR) else {}

    if update:
        for q, t in queries.items():
            floor[q] = round(min(t, floor.get(q, t)), 3)
        json.dump(floor, open(FLOOR, "w"), indent=1, sort_keys=True)
        print(f"floor updated: {len(floor)} queries -> {FLOOR}")
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
        print(f"BREACH {q}: {t:.3f}s > {FACTOR:g}x floor {f:.3f}s")
    if breaches:
        print(f"PERF FLOOR FAILED: {len(breaches)} breach(es)")
        return 1
    print(f"perf floor ok: {len(queries) - len(new)} gated, {len(new)} new")
    return 0

if __name__ == "__main__":
    sys.exit(main())
