#!/usr/bin/env python3
"""Compare two Bench JSON outputs (the `{"metric":...,"queries":{...}}`
line) per query, tolerant of the sbt log prefix.

Usage: bench_compare.py <old.json> <new.json> [ratio_threshold=1.5]
           [abs_sec=1.0] [bands=bench_bands.json]

Prints queries whose new/old ratio exceeds the threshold (regressions)
or falls below its inverse (improvements), plus totals. Host-load noise
on this box is ~±30% (see BASELINE.md) — the default threshold stays
above it.

EXITS NONZERO when any shared query regressed — the close-out gate that
keeps per-query regressions from shipping silently (the r7->r8
q_diversity_kcenter 1.8->7.8 s regression shipped because nothing
compared the close-out artifact against the previous round's). Two
rules (both mirrored bit-for-bit in graft.Bench / BenchCompareSpec):

- Gates with an entry in the bands file (scripts/bench_bands.py:
  min/max over the last N committed artifacts) flag only on band-EXIT:
  new > band_max * 1.25 AND new - band_max > abs_sec. The single-old-
  reading rule generated recurring noise adjudications on bimodal
  gates (r11 verdict item 2); the band absorbs committed spread.
- Unbanded gates (new since the bands file) keep the two-sided
  single-baseline rule: new/old > ratio AND new - old > abs_sec — a
  ratio alone flags 10->40 ms noise on trivial gates, an absolute
  delta alone flags host drift on the heavyweights.
"""
import json
import os
import sys

BAND_RATIO = 1.25


def load(path):
    s = open(path).read()
    return json.loads(s[s.index("{"):])


def main(old_path, new_path, threshold=1.5, abs_sec=1.0,
         bands_path="bench_bands.json"):
    old, new = load(old_path), load(new_path)
    oq, nq = old["queries"], new["queries"]
    bands = {}
    if bands_path and os.path.isfile(bands_path):
        bands = {k: (v["min"], v["max"]) for k, v in
                 load(bands_path)["bands"].items() if v["max"] > 0}
        print(f"bands: {len(bands)} gates from {bands_path}")
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
    def exits(name, b):
        if name in bands:  # band-exit rule (vs committed envelope max)
            hi = bands[name][1]
            return b / hi > BAND_RATIO and b - hi > abs_sec
        a = oq.get(name, 0)  # unbanded: single-baseline two-sided rule
        return a > 0 and b / a > threshold and b - a > abs_sec
    # Gate over EVERY new reading, mirroring graft.Bench: a banded gate
    # is checked even when old.json lacks it (or reads 0) — previously
    # such a gate printed as NEW and was never gated, contradicting the
    # 'mirrored bit-for-bit' claim (r12 advice). Unbanded gates still
    # need an old reading (nothing to compare otherwise).
    gate = [(n, bands[n][1] if n in bands else oq[n], b)
            for n, b in sorted(nq.items())
            if (n in bands or oq.get(n, 0) > 0) and exits(n, b)]
    if gate:
        print(f"FAIL: {len(gate)} quer{'y' if len(gate) == 1 else 'ies'} "
              f"exited the band / regressed beyond "
              f"{threshold}x AND {abs_sec}s:")
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
    print(f"no query exited its band (unbanded: regressed beyond "
          f"{threshold}x and {abs_sec}s)")
    return 0


if __name__ == "__main__":
    t = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    a = float(sys.argv[4]) if len(sys.argv) > 4 else 1.0
    bp = sys.argv[5] if len(sys.argv) > 5 else "bench_bands.json"
    sys.exit(main(sys.argv[1], sys.argv[2], t, a, bp))
