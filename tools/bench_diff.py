#!/usr/bin/env python3
"""Compare two graft bench results query-by-query.

Usage: python3 tools/bench_diff.py <old> <new> [threshold_pct]

Each argument is either a BENCH_r{N}.json driver file (the per-query
map is parsed out of its "parsed" or raw "tail" field) or a raw
one-line JSON printed by graft.Bench. Prints per-query deltas beyond
the threshold (default 25%) plus the total, so a round can tell real
regressions from the ~20% run-to-run jitter of sub-second queries.
"""
import json
import re
import sys


def load(path):
    text = open(path).read()
    try:
        d = json.loads(text)
    except json.JSONDecodeError:
        d = None
    if isinstance(d, dict) and "queries" in d:
        return d
    if isinstance(d, dict):  # driver wrapper: parsed result or raw tail
        if isinstance(d.get("parsed"), dict) and "queries" in d["parsed"]:
            return d["parsed"]
        text = d.get("tail", "")
    m = re.search(r'\{"metric".*\}', text)
    if not m:
        sys.exit(f"{path}: no bench JSON line found")
    return json.loads(m.group(0))


def main():
    old, new = load(sys.argv[1]), load(sys.argv[2])
    thresh = float(sys.argv[3]) / 100 if len(sys.argv) > 3 else 0.25
    oq, nq = old["queries"], new["queries"]
    print(f"total: {old['value']:.2f}s -> {new['value']:.2f}s "
          f"({new['value'] / old['value']:.2f}x), "
          f"{len(oq)} -> {len(nq)} queries")
    for side, d in (("old", old), ("new", new)):
        noisy = d.get("spread", [])
        if noisy:
            print(f"  {side} run NOISY (steady-rep max/min > 2x): {', '.join(noisy)}")
    for name in sorted(set(nq) - set(oq)):
        print(f"  NEW  {name}: {nq[name]:.3f}s")
    for name in sorted(set(oq) - set(nq)):
        print(f"  GONE {name} (was {oq[name]:.3f}s)")
    deltas = [(nq[n] / oq[n], n) for n in oq if n in nq and oq[n] > 0]
    for ratio, name in sorted(deltas, reverse=True):
        if abs(ratio - 1) >= thresh:
            tag = "SLOWER" if ratio > 1 else "faster"
            print(f"  {tag} {name}: {oq[name]:.3f}s -> {nq[name]:.3f}s ({ratio:.2f}x)")


if __name__ == "__main__":
    main()
