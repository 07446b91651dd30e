#!/usr/bin/env python3
"""Cross-scale-factor probe: given two bench artifacts (same gates,
different SF dirs), print per-gate time ratios sorted by ratio — the
measured answer to "would this survive a scale-up". A ratio well below
the data ratio means fixed overhead still dominates; a ratio ABOVE it
is a super-linear shape worth a plan audit.

Usage: scale_probe.py <bench_small.json> <bench_large.json> [data_ratio]

Produce the inputs with SPARK_GRAFT_ONLY over the gates of interest at
two SF dirs (run the JVMs one at a time — shared spark-warehouse).
"""
import json
import sys


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    small = json.load(open(sys.argv[1]))
    large = json.load(open(sys.argv[2]))
    data_ratio = float(sys.argv[3]) if len(sys.argv) > 3 else None
    a, b = small["queries"], large["queries"]
    shared = sorted(set(a) & set(b), key=lambda q: b[q] / a[q])
    if not shared:
        print("no shared gates between the two artifacts")
        return 1
    print(f"{'gate':34s} {'small':>8s} {'large':>8s} {'ratio':>6s}")
    super_linear = []
    for q in shared:
        r = b[q] / a[q]
        flag = ""
        if data_ratio is not None and r > data_ratio:
            flag = "  <-- SUPER-LINEAR"
            super_linear.append(q)
        print(f"{q:34s} {a[q]:8.2f} {b[q]:8.2f} {r:6.2f}{flag}")
    print(f"\n{len(shared)} shared gates; sf {small.get('sf')} -> "
          f"{large.get('sf')}")
    if data_ratio is not None:
        print(f"data ratio {data_ratio:g}: "
              f"{len(super_linear)} super-linear gate(s)"
              + (f": {', '.join(super_linear)}" if super_linear else ""))
        return 1 if super_linear else 0
    return 0


if __name__ == "__main__":
    sys.exit(main())
