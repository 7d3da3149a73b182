#!/usr/bin/env python3
"""Merge per-family BenchScale fragment JSONs into BENCH_scale.json's
rungs_extended section (the per-family-JVM ladder protocol: one short JVM
per family with cool-down gaps; fragments land in /tmp and merge here).

Usage: merge_scale.py fragment.json [fragment.json ...] [--note fam=text]
Each fragment is a BenchScale outJson ({"base":..., "rungs":..., fam: {...}}).
Family entries REPLACE any existing same-name entry in rungs_extended.
"""
import json, sys

NOTES = {}
frags = []
for a in sys.argv[1:]:
    if a.startswith("--note"):
        continue
    if "=" in a and not a.endswith(".json"):
        k, v = a.split("=", 1)
        NOTES[k] = v
    else:
        frags.append(a)

main = json.load(open("BENCH_scale.json"))
re_ = main.setdefault("rungs_extended", {})
for f in frags:
    d = json.load(open(f))
    for k, v in d.items():
        if k in ("base", "rungs", "shape_note"):
            continue
        if k in NOTES:
            v["note"] = NOTES[k]
        re_[k] = v
        print(f"merged {k}: " + ", ".join(
            f"{kk}={vv}" for kk, vv in v.items() if kk.startswith("t")))
json.dump(main, open("BENCH_scale.json", "w"), indent=1)
print("BENCH_scale.json updated")
