#!/usr/bin/env python3
"""Mechanical bench-regression gate: compare a bench run (the JSON line
graft.Bench prints / writes to bench_full.json) against the checked-in
BENCH_BASELINE.json and fail on per-query regressions.

Usage: tools/bench_diff.py <bench_full.json> [more_runs.json ...] [--baseline baseline.json]

Exit 1 if any query regresses by more than THRESHOLD x vs its baseline
time (absolute floor ABS_FLOOR seconds, so scheduling jitter on
sub-second queries never trips the gate), or if a baseline query is
missing from the run. When MULTIPLE run files are given (the
back-to-back pair the drift discipline prescribes), a face counts as
regressed only if its MIN across the runs crosses the gate — a single
noisy run can no longer flag a face (r12 verdict #8). New queries
(absent from the baseline) are reported informationally.
"""
import json
import sys

THRESHOLD = 2.0     # x baseline
ABS_FLOOR = 1.0     # s: ignore regressions that stay under this wall time


def load(path):
    with open(path) as f:
        doc = json.load(f)
    return doc.get("queries", {}), doc


def main():
    args = sys.argv[1:]
    base_path = "BENCH_BASELINE.json"
    if "--baseline" in args:
        i = args.index("--baseline")
        base_path = args[i + 1]
        del args[i:i + 2]
    # legacy positional form: one run + one baseline
    if len(args) == 2 and "--baseline" not in sys.argv:
        base_path = args.pop()
    if not args:
        print(__doc__)
        return 2
    runs = [load(p) for p in args]
    run_doc = runs[0][1]
    # min across the provided runs: a face is regressed only if EVERY
    # run of the pair crosses the gate
    run = {}
    for q, _ in runs:
        for k, v in q.items():
            run[k] = min(run.get(k, float("inf")), v)
    base, _ = load(base_path)

    bad, missing = [], []
    for name, b in sorted(base.items()):
        if name not in run:
            missing.append(name)
            continue
        r = run[name]
        if r > max(b * THRESHOLD, ABS_FLOOR):
            bad.append((name, b, r))
    new = sorted(set(run) - set(base))

    triggers = run_doc.get("triggers", {})
    for name, b, r in sorted(bad, key=lambda x: x[2] / max(x[1], 1e-9),
                             reverse=True):
        # streaming faces carry per-trigger wall times (min pass):
        # report how much of the regressed wall is trigger machinery so
        # adjudication can separate machinery variance from plan cost
        ts = triggers.get(name)
        extra = (f" [{len(ts)} triggers, {sum(ts):.2f}s inside triggers]"
                 if ts else "")
        print(f"REGRESSED {name}: {b:.2f}s -> {r:.2f}s "
              f"({r / max(b, 1e-9):.1f}x){extra}")
    for name in missing:
        print(f"MISSING   {name}: in baseline, absent from run")
    if new:
        print(f"new queries (not in baseline): {', '.join(new)}")
    if run_doc.get("failed"):
        print(f"FAILED queries in run: {run_doc['failed']}")

    n_ok = len(base) - len(bad) - len(missing)
    print(f"{n_ok}/{len(base)} baseline queries within {THRESHOLD}x "
          f"(abs floor {ABS_FLOOR}s); {len(new)} new")
    return 1 if (bad or missing or run_doc.get("failed")) else 0


if __name__ == "__main__":
    sys.exit(main())
