#!/usr/bin/env python3
"""Splice an isolated single-query Bench JSON into a rung file, with
machine-readable per-entry provenance (VERDICT r16 "What's wrong" #3 /
ADVICE r16: hand-merged rung entries inherited the host run's top-level
anchors, so dirty-anchor values were indistinguishable from clean ones).

Usage: splice_rung.py <rung.json> <isolated_run.json> [--upper-bound]

The isolated run must be a Bench output containing exactly the queries
to splice. Each spliced entry lands in the rung's "queries" map AND in
"entry_provenance" with the isolated run's own anchors/steal, an
"isolated": true marker, and (with --upper-bound) an "upper_bound"
flag. The rung total is recomputed from the queries map and marked
"composite": true so consumers know it sums mixed-provenance timings.
"""
import json, sys, collections

def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    upper_bound = "--upper-bound" in sys.argv
    rung_path, iso_path = args
    rung = json.load(open(rung_path), object_pairs_hook=collections.OrderedDict)
    iso = json.load(open(iso_path))
    prov = rung.setdefault("entry_provenance", collections.OrderedDict())
    for q, t in iso.get("queries", {}).items():
        rung.setdefault("queries", collections.OrderedDict())[q] = t
        p = collections.OrderedDict()
        p["isolated"] = True
        p["anchor_cpu"] = iso.get("anchor_cpu")
        p["anchor_shuffle"] = iso.get("anchor_shuffle")
        p["steal_pct"] = iso.get("steal_pct")
        p["anchor_latency"] = iso.get("anchor_latency")
        p["anchors_out_of_band"] = iso.get("anchors_out_of_band")
        if upper_bound:
            p["upper_bound"] = True
        prov[q] = p
        print(f"spliced {q}={t} (anchors {p['anchor_cpu']}/{p['anchor_shuffle']}, "
              f"steal {p['steal_pct']}, upper_bound={upper_bound})")
    rung["composite"] = True
    rung["value"] = round(sum(rung["queries"].values()), 3)
    rung["n"] = len(rung["queries"])
    with open(rung_path, "w") as f:
        json.dump(rung, f, separators=(",", ":"))
        f.write("\n")

if __name__ == "__main__":
    main()
