"""Compare two bench outputs and flag per-query regressions.

Usage:
    python tools/bench_compare.py BASELINE CURRENT [--max-ratio 2.0]

BASELINE/CURRENT are either bench.py's one-line JSON output or a driver
BENCH_r{N}.json record (whose parsed payload lives under "parsed"). Exits
non-zero if any query shared by both runs is slower than max-ratio × its
baseline time — the driver's per-query gate — and prints the offenders.
New queries (no baseline) are listed informationally.
"""

from __future__ import annotations

import argparse
import json
import sys


def load_queries(path: str) -> dict[str, float]:
    with open(path) as f:
        d = json.load(f)
    if "parsed" in d:  # driver BENCH_r{N}.json wrapper
        d = d["parsed"]
    return d["queries"]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("baseline")
    ap.add_argument("current")
    ap.add_argument("--max-ratio", type=float, default=2.0)
    args = ap.parse_args()

    base = load_queries(args.baseline)
    cur = load_queries(args.current)

    regressions = []
    for name in sorted(set(base) & set(cur)):
        ratio = cur[name] / max(base[name], 1e-9)
        if ratio > args.max_ratio:
            regressions.append((name, base[name], cur[name], ratio))

    new = sorted(set(cur) - set(base))
    if new:
        print(f"new (no baseline): {', '.join(new)}")
    gone = sorted(set(base) - set(cur))
    if gone:
        print(f"dropped from bench: {', '.join(gone)}")

    if regressions:
        print(f"REGRESSIONS (> {args.max_ratio}x baseline):")
        for name, b, c, r in sorted(regressions, key=lambda x: -x[3]):
            print(f"  {name}: {b:.3f}s -> {c:.3f}s ({r:.2f}x)")
        return 1
    shared = len(set(base) & set(cur))
    print(f"ok: {shared} shared queries all within {args.max_ratio}x baseline")
    return 0


if __name__ == "__main__":
    sys.exit(main())
