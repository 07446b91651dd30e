#!/usr/bin/env python3
"""Build bench_bands.json: per-gate honest timing bands (min/max/n)
over a set of committed full bench artifacts.

The single-baseline regression rule generated recurring noise
adjudications on bimodal gates (q_binaryfile_ingest 1.1-2.6 s,
q_incr_curation_pipeline 3.4-5.2 s: r11 verdict item 2) because it
compared against ONE old reading. Bands turn BASELINE.md's manual
band notes into data: a gate is flagged only when it EXITS the band
observed across the last N committed artifacts (band-exit rule, see
graft.Bench.bandRegressions and bench_compare.py).

Usage: bench_bands.py <artifact.json> [...] [-o bench_bands.json]

Each artifact is a Bench JSON line (sbt-log prefix tolerated) with a
full "queries" map. Gates present in only SOME artifacts still get a
band (n records how many readings back it).
"""
import json
import sys


def load(path):
    s = open(path).read()
    return json.loads(s[s.index("{"):])


def main(argv):
    out = "bench_bands.json"
    if "-o" in argv:
        i = argv.index("-o")
        out = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    if not argv:
        print(__doc__)
        return 2
    bands = {}
    used = []
    for path in argv:
        try:
            qs = load(path).get("queries", {})
        except Exception as e:
            print(f"skip {path}: {e}", file=sys.stderr)
            continue
        used.append(path)
        for name, sec in qs.items():
            if not isinstance(sec, (int, float)) or sec <= 0:
                continue
            b = bands.setdefault(name, [sec, sec, 0])
            b[0] = min(b[0], sec)
            b[1] = max(b[1], sec)
            b[2] += 1
    doc = {
        "n_artifacts": len(used),
        "artifacts": used,
        "bands": {k: {"min": round(v[0], 3), "max": round(v[1], 3),
                      "n": v[2]}
                  for k, v in sorted(bands.items())},
    }
    with open(out, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
    print(f"{out}: {len(bands)} gates from {len(used)} artifacts")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
