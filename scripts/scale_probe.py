#!/usr/bin/env python3
"""Cross-scale-factor probe: given two bench artifacts (same gates,
different SF dirs), print per-gate time ratios sorted by ratio — the
measured answer to "would this survive a scale-up". A ratio well below
the data ratio means fixed overhead still dominates; a ratio ABOVE it
is a super-linear shape worth a plan audit.

Usage: scale_probe.py <bench_small.json> <bench_large.json> [data_ratio]
         [--envelope gate=ratio ...]

Produce the inputs with SPARK_GRAFT_ONLY over the gates of interest at
two SF dirs (run the JVMs one at a time — shared spark-warehouse).

--envelope documents a PER-GATE admissible ratio for algorithms whose
complexity is legitimately super-linear in the data (e.g. exact
triangle counting is O(m^1.5): 10x edges admits 31.6x time). A gate
with an envelope is judged against it instead of the global data
ratio, and the envelope is printed so the exception is in the output,
not hidden. Every envelope must cite its algorithmic reason in
BASELINE.md — this flag records exceptions, it does not waive the
audit.
"""
import json
import sys


def main() -> int:
    # one pass consuming flag+value PAIRS: the two-token form
    # "--envelope gate=ratio" must remove BOTH tokens from the
    # positional list, or the value token lands in args[2] and
    # float() on it crashes the probe (round-14 advice)
    args = []
    envelopes = {}
    it = iter(sys.argv[1:])
    for a in it:
        if a == "--envelope":
            g, _, r = next(it).partition("=")
            envelopes[g] = float(r)
        elif a.startswith("--envelope="):
            g, _, r = a[len("--envelope="):].partition("=")
            envelopes[g] = float(r)
        else:
            args.append(a)
    if len(args) < 2:
        print(__doc__)
        return 2
    small = json.load(open(args[0]))
    large = json.load(open(args[1]))
    data_ratio = float(args[2]) if len(args) > 2 else None
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
        bound = envelopes.get(q, data_ratio)
        if bound is not None and r > bound:
            flag = "  <-- SUPER-LINEAR"
            super_linear.append(q)
        elif q in envelopes:
            flag = f"  (envelope {envelopes[q]:g})"
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
