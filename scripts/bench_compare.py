#!/usr/bin/env python3
"""Compare two Bench JSON outputs (the `{"metric":...,"queries":{...}}`
line) per query, tolerant of the sbt log prefix.

Usage: bench_compare.py <old.json> <new.json> [ratio_threshold=1.5] [abs_sec=1.0]

Prints queries whose new/old ratio exceeds the threshold (regressions)
or falls below its inverse (improvements), plus totals. Host-load noise
on this box is ~±30% (see BASELINE.md) — the default threshold stays
above it.

EXITS NONZERO when any shared query regressed BOTH beyond the ratio
threshold AND by more than `abs_sec` seconds — the close-out gate that
keeps per-query regressions from shipping silently (the r7->r8
q_diversity_kcenter 1.8->7.8 s regression shipped because nothing
compared the close-out artifact against the previous round's). The
two-sided condition mirrors the VERDICT rule: a ratio alone flags
10->40 ms noise on trivial gates, an absolute delta alone flags host
drift on the heavyweights.
"""
import json
import sys


def load(path):
    s = open(path).read()
    return json.loads(s[s.index("{"):])


def main(old_path, new_path, threshold=1.5, abs_sec=1.0):
    old, new = load(old_path), load(new_path)
    oq, nq = old["queries"], new["queries"]
    print(f"total: {old['value']:.1f}s -> {new['value']:.1f}s "
          f"({new['value'] / old['value']:.2f}x), "
          f"{len(oq)} -> {len(nq)} queries")
    for name in sorted(nq):
        if name not in oq:
            print(f"  NEW    {nq[name]:7.2f}s  {name}")
    for name in sorted(oq):
        if name not in nq:
            print(f"  GONE   {oq[name]:7.2f}s  {name}")
    shared = [(name, oq[name], nq[name]) for name in sorted(oq)
              if name in nq and oq[name] > 0]
    regress = [(n, a, b) for n, a, b in shared if b / a > threshold]
    improve = [(n, a, b) for n, a, b in shared if b / a < 1 / threshold]
    for tag, rows in (("SLOWER", regress), ("FASTER", improve)):
        for n, a, b in sorted(rows, key=lambda r: -(r[2] / r[1])):
            print(f"  {tag} {a:7.2f}s -> {b:7.2f}s ({b / a:4.2f}x)  {n}")
    gate = [(n, a, b) for n, a, b in regress if b - a > abs_sec]
    if gate:
        print(f"FAIL: {len(gate)} quer{'y' if len(gate) == 1 else 'ies'} "
              f"regressed >{threshold}x AND >{abs_sec}s:")
        # round-10 artifacts carry per-gate attribution columns — show
        # them inline so a spike report answers "GC or plan?" directly
        ogc, ngc = old.get("gc_ms", {}), new.get("gc_ms", {})
        nheap = new.get("heap_mb", {})
        for n, a, b in gate:
            attr = ""
            if n in ngc:
                attr = f"  [gc {ogc.get(n, '?')}ms -> {ngc[n]}ms"
                if n in nheap:
                    attr += f", heap {nheap[n]:.0f}MB"
                attr += "]"
            print(f"  {n}: {a:.2f}s -> {b:.2f}s "
                  f"({b / a:.2f}x, +{b - a:.2f}s){attr}")
        return 1
    print(f"no query regressed beyond {threshold}x and {abs_sec}s")
    return 0


if __name__ == "__main__":
    t = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    a = float(sys.argv[4]) if len(sys.argv) > 4 else 1.0
    sys.exit(main(sys.argv[1], sys.argv[2], t, a))
