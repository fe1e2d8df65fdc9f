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


def load_queries(path: str) -> tuple[dict[str, float], set[str]]:
    with open(path) as f:
        d = json.load(f)
    if "parsed" in d:  # driver BENCH_r{N}.json wrapper
        d = d["parsed"]
    return d["queries"], set(d.get("contract_queries", []))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("baseline")
    ap.add_argument("current")
    ap.add_argument("--max-ratio", type=float, default=2.0)
    args = ap.parse_args()

    base, bcontract = load_queries(args.baseline)
    cur, ccontract = load_queries(args.current)
    # Contract queries time an oracle CONTRACT (exact+sketch, parity
    # pins), not engine throughput — a contract change legitimately moves
    # them past 2x (r4: approx_count_distinct_sketch 3.5x when the
    # 5%-error pin landed). Report them, don't gate on them.
    contract = bcontract | ccontract

    regressions = []
    for name in sorted((set(base) & set(cur)) - contract):
        ratio = cur[name] / max(base[name], 1e-9)
        if ratio > args.max_ratio:
            regressions.append((name, base[name], cur[name], ratio))
    shared_contract = sorted((set(base) & set(cur)) & contract)
    if shared_contract:
        print("contract queries (informational, outside the gate):")
        for name in shared_contract:
            r = cur[name] / max(base[name], 1e-9)
            print(f"  {name}: {base[name]:.3f}s -> {cur[name]:.3f}s ({r:.2f}x)")

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
