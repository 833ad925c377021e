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
    med = p90 = None
    if ratios:
        med = statistics.median(ratios)
        p90 = sorted(ratios)[int(0.9 * (len(ratios) - 1))]
        print(f"\nerror bar over >=1s queries (n={len(ratios)}): "
              f"median spread {med:.2f}x, p90 {p90:.2f}x, max {max(ratios):.2f}x")
    totals = [j["value"] for _, j in runs]
    print(f"totals: min {min(totals):.1f}s max {max(totals):.1f}s "
          f"(spread {max(totals)/min(totals):.2f}x)")

    # Summary artifact the bench embeds verbatim as its "soak" field
    # (VERDICT r14 #5): run totals, the error bar, and which run is the
    # median — commit the median run as bench_prior.json and this file
    # alongside it, and the round artifact carries its own error bar.
    median_file = sorted(zip(totals, [p for p, _ in runs]))[len(runs) // 2][1]
    summary = {
        "runs": [round(t, 1) for t in totals],
        "min": round(min(totals), 1),
        "max": round(max(totals), 1),
        "median_file": median_file,
        "n_queries": len(names),
        "query_spread_median": round(med, 3) if med else None,
        "query_spread_p90": round(p90, 3) if p90 else None,
        "files": [p for p, _ in runs],
    }
    with open("bench_soak.json", "w") as f:
        json.dump(summary, f)
    print(f"wrote bench_soak.json: {summary}")


if __name__ == "__main__":
    main()
