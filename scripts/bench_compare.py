#!/usr/bin/env python3
"""Compare two Bench JSON outputs (the `{"metric":...,"queries":{...}}`
line) per query, tolerant of the sbt log prefix.

Usage: bench_compare.py <old.json> <new.json> [ratio_threshold=1.5]

Prints queries whose new/old ratio exceeds the threshold (regressions)
or falls below its inverse (improvements), plus totals. Host-load noise
on this box is ~±30% (see BASELINE.md) — the default threshold stays
above it.
"""
import json
import sys


def load(path):
    s = open(path).read()
    return json.loads(s[s.index("{"):])


def main(old_path, new_path, threshold=1.5):
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
    if not regress:
        print(f"no query regressed beyond {threshold}x")
    return 0


if __name__ == "__main__":
    t = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    sys.exit(main(sys.argv[1], sys.argv[2], t))
