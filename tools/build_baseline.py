#!/usr/bin/env python3
"""Build bench/baseline_per_query.json for the Bench tripwire.

Per-entry baseline = best-known-good seconds FOR THE CURRENT CODE:
  - TPC-H DataFrame queries: the round-6 recorded table (BASELINE.md),
    the baseline of record for the 2x gate;
  - everything else: min over the full-bench json paths passed as
    arguments — idle-box runs of the code being baselined. Do NOT feed
    artifacts from before an entry's algorithm changed (e.g. r6's
    neardup_embedding predates the r8 bounded-IVF rewrite and floors
    3x below what the current, scale-safe implementation can do).

Usage: python3 tools/build_baseline.py bench_full.json [...]
"""
import json
import sys

R6_TPCH = {
    "tpch_q1": 0.44, "tpch_q2": 1.63, "tpch_q3": 0.63, "tpch_q4": 0.67,
    "tpch_q5": 1.00, "tpch_q6": 0.18, "tpch_q7": 0.75, "tpch_q8": 0.87,
    "tpch_q9": 0.76, "tpch_q10": 0.73, "tpch_q11": 0.74, "tpch_q12": 0.55,
    "tpch_q13": 0.53, "tpch_q14": 0.30, "tpch_q15": 0.53, "tpch_q16": 1.59,
    "tpch_q17": 0.42, "tpch_q18": 0.72, "tpch_q19": 0.38, "tpch_q20": 0.76,
    "tpch_q21": 1.17, "tpch_q22": 0.38,
}


def main(extra_paths):
    best = {}
    srcs = list(extra_paths)
    for p in srcs:
        try:
            q = json.load(open(p)).get("queries", {})
        except Exception as e:
            print(f"skip {p}: {e}", file=sys.stderr)
            continue
        for k, v in q.items():
            if isinstance(v, (int, float)) and (k not in best or v < best[k]):
                best[k] = float(v)
    best.update(R6_TPCH)  # baseline of record wins for TPC-H
    out = {k: round(v, 3) for k, v in sorted(best.items())}
    with open("bench/baseline_per_query.json", "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote bench/baseline_per_query.json with {len(out)} entries "
          f"from {len(srcs)} source files")


if __name__ == "__main__":
    main(sys.argv[1:])
