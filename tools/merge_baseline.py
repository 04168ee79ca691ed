#!/usr/bin/env python3
"""Update bench/baseline_per_query.json from full bench runs.

Policy (conservative, driver-load-aware): entries NEW since the last
recording get their first-observation floor (min across the given
runs); EXISTING floors are lowered only for entries named with
--lower (comma-separated) — i.e. only where a code change genuinely
made the entry faster. Blanket-lowering every floor from an idle-box
run would bias every future driver-run ratio upward and trip the
2x over_gate on sub-second entries (driver runs happen at loadavg ~4;
local runs at ~1-3 measure systematically lower).

  python3 tools/merge_baseline.py [--lower=name1,name2] run1.json [run2.json ...]
"""
import json, sys

BASE = "bench/baseline_per_query.json"

lower = set()
paths = []
for a in sys.argv[1:]:
    if a.startswith("--lower="):
        lower |= set(a.split("=", 1)[1].split(","))
    else:
        paths.append(a)

base = json.load(open(BASE))
added, lowered = set(), set()
for p in paths:
    for k, v in json.load(open(p)).get("queries", {}).items():
        if k.startswith("grp_"):
            continue
        if k not in base:
            base[k] = round(v, 3); added.add(k)
        elif (k in lower or k in added) and v < base[k]:
            # entries added by an earlier run in THIS invocation keep
            # taking the min across all given runs (first-observation
            # floor = min, as documented); pre-existing floors only move
            # for the explicitly named code-change entries
            base[k] = round(v, 3)
            (lowered if k in lower else added).add(k)
json.dump(dict(sorted(base.items())), open(BASE, "w"), indent=1)
print(f"{len(base)} entries; {len(added)} added, {len(lowered)} lowered")
for k in sorted(added | lowered):
    print(f"  {'+' if k in added else 'v'} {k} = {base[k]:.3f}")
