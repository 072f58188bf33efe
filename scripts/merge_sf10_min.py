#!/usr/bin/env python3
"""Merge additional same-code sf10 timing windows into SCALE.json.

The committed discipline (BENCH per-attempt min, memory: "retest before
believing any single cell"): the reported sf10 wall is the MIN across
measured windows on the SAME code state — the steal-robust estimator —
never a single window's sample. Slopes recompute against the already-
merged sf1 cells. Extra sample files are the full Bench JSON lines of
`SPARK_GRAFT_ONLY` runs at .scale/sf10.

Usage: merge_sf10_min.py SCALE.json sample.json [sample.json ...]
"""
import json
import sys


def main() -> None:
    scale_path, samples = sys.argv[1], sys.argv[2:]
    scale = json.load(open(scale_path))
    windows = []
    for p in samples:
        with open(p) as f:
            windows.append(json.load(f))
    merged = {}
    for w in windows:
        for n, t in w.get("queries", {}).items():
            if t and t > 0:
                merged.setdefault(n, []).append(t)
    for n, ts in merged.items():
        q = scale["queries"].setdefault(n, {})
        prev = q.get("sf10")
        best = min(ts + ([prev] if prev and prev > 0 else []))
        q["sf10"] = best
        q["sf10_windows"] = len(ts) + (1 if prev else 0)
        t1 = q.get("sf1")
        if t1 and t1 > 0:
            q["slope_sf1_sf10"] = round(best / t1, 2)
    wl = scale.get("sf10_watchlist", {})
    names = wl.get("queries", [])
    if names:
        wl["sf10_total"] = round(
            sum(scale["queries"][n]["sf10"] for n in names
                if scale["queries"][n].get("sf10")), 3)
        wl["note"] = (wl.get("note", "") +
                      "; sf10 walls are min across measured same-code "
                      "windows (sf10_windows per query)")
    json.dump(scale, open(scale_path, "w"), indent=1, sort_keys=True)
    print("merged mins:",
          {n: scale["queries"][n]["sf10"] for n in sorted(merged)})


if __name__ == "__main__":
    main()
