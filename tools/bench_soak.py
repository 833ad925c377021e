#!/usr/bin/env python3
"""Soak analysis over N full bench artifacts (VERDICT r13 #8).

Usage: python3 tools/bench_soak.py run1.json run2.json [run3.json ...]

Prints per-run totals, the per-query cold spread (max/min ratio across
runs), the queries whose spread exceeds 1.3x (the bench's own
regression threshold — these are the queries where a single-run
cross-round comparison CANNOT distinguish ambient noise from a real
regression), and a one-line error-bar summary for the round record.
"""
import json
import statistics
import sys


def main() -> None:
    runs = []
    for p in sys.argv[1:]:
        with open(p) as f:
            j = json.load(f)
        runs.append((p, j))
    if len(runs) < 2:
        sys.exit("need at least two artifacts")

    for p, j in runs:
        hs = len(j.get("high_steal", []))
        kg = len(j.get("kind_gap", {}))
        print(f"{p}: total={j['value']:.1f}s n={len(j['queries'])} "
              f"high_steal={hs} kind_gap_rows={kg}")

    names = set(runs[0][1]["queries"])
    for _, j in runs[1:]:
        names &= set(j["queries"])

    spreads = []
    for q in sorted(names):
        colds = [j["queries"][q] for _, j in runs]
        lo, hi = min(colds), max(colds)
        if lo > 0:
            spreads.append((hi / lo, q, lo, hi))
    spreads.sort(reverse=True)

    noisy = [s for s in spreads if s[0] > 1.3 and s[3] >= 1.0]
    print(f"\nqueries with >1.3x cold spread across runs (>=1s): {len(noisy)}")
    for r, q, lo, hi in noisy[:20]:
        per_run = " ".join(f"{j['queries'][q]:.2f}" for _, j in runs)
        print(f"  {q}: {r:.2f}x  [{per_run}]")

    ratios = [s[0] for s in spreads if s[3] >= 1.0]
    if ratios:
        med = statistics.median(ratios)
        p90 = sorted(ratios)[int(0.9 * (len(ratios) - 1))]
        print(f"\nerror bar over >=1s queries (n={len(ratios)}): "
              f"median spread {med:.2f}x, p90 {p90:.2f}x, max {max(ratios):.2f}x")
    totals = [j["value"] for _, j in runs]
    print(f"totals: min {min(totals):.1f}s max {max(totals):.1f}s "
          f"(spread {max(totals)/min(totals):.2f}x)")


if __name__ == "__main__":
    main()
