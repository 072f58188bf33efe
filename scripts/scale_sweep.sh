#!/usr/bin/env bash
# One-JVM-per-SF scale sweep -> SCALE.json
#
# Runs graft.Bench once per scale factor (fresh JVM each, so no cache
# or codegen bleed between SFs), collects each run's BENCH_LAST.json,
# and merges them into SCALE.json:
#   {"generated_by": ..., "cpus": N,
#    "totals": {"sf0.001": s, ..., "sf1": s},
#    "queries": {"<name>": {"sf0.001": s, "sf0.01": s, "sf0.1": s,
#                           "sf1": s, "slope_001_01": r,
#                           "slope_01_1": r, "slope_1_sf1": r}, ...}}
# slope_* are the wall-clock ratios across each 10x data step — the
# regressable form of the "would this survive 100x" argument. The sf1
# leg (6M-row lineitem / 50k docs) is DERIVED data: driver testdata
# stops at sf0.1, so graft.GenScale builds .scale/sf1 from sf0.1 via
# 10 perturbed copies (generated on demand below, gitignored).
#
# Usage: scripts/scale_sweep.sh [cpus]   (default 8)
set -euo pipefail
cd "$(dirname "$0")/.."
CPUS="${1:-8}"
TMP=$(mktemp -d)
trap 'rm -rf "$TMP"' EXIT
# the full-suite Bench run rewrites BENCH_LAST.json (the committed
# sf0.1 outlier reference) — preserve and restore it around the sweep
cp BENCH_LAST.json "$TMP/bench_last.orig" 2>/dev/null || true
restore() { cp "$TMP/bench_last.orig" BENCH_LAST.json 2>/dev/null || true; }
trap 'restore; rm -rf "$TMP"' EXIT

if [ ! -d .scale/sf1/lineitem.parquet ]; then
  echo "[scale] deriving sf1 testdata (.scale/sf1) ..." >&2
  sbt -batch 'runMain graft.GenScale /root/testdata/sf0.1 .scale/sf1 10' \
    >"$TMP/gen.out" 2>&1 || { tail -5 "$TMP/gen.out" >&2; exit 1; }
fi

declare -A DIRS=(
  [0.001]=/root/testdata/sf0.001
  [0.01]=/root/testdata/sf0.01
  [0.1]=/root/testdata/sf0.1
  [1]=.scale/sf1
)
for SF in 0.001 0.01 0.1 1; do
  echo "[scale] sf$SF ..." >&2
  SPARK_GRAFT_SF_DIR="${DIRS[$SF]}" SPARK_GRAFT_CPUS="$CPUS" \
    sbt -batch 'runMain graft.Bench' >"$TMP/bench_$SF.out" 2>&1 || {
      echo "[scale] bench failed at sf$SF; tail:" >&2
      tail -5 "$TMP/bench_$SF.out" >&2
      exit 1
    }
  cp BENCH_LAST.json "$TMP/last_$SF.json"
done
restore
python3 - "$TMP" "$CPUS" <<'EOF'
import json, os, sys
tmp, cpus = sys.argv[1], int(sys.argv[2])
sfs = ("0.001", "0.01", "0.1", "1")
runs = {sf: json.load(open(f"{tmp}/last_{sf}.json")) for sf in sfs}
names = sorted(set().union(*[r["queries"].keys() for r in runs.values()]))
# the targeted sf10_sweep.sh merges its own keys (sf10, slope_sf1_sf10,
# rows_*) into SCALE.json after this writes it; preserve them across a
# full re-sweep instead of silently dropping the 5th decade
prev = (json.load(open("SCALE.json"))
        if os.path.exists("SCALE.json") else {"queries": {}})
SF10_KEYS = ("sf10", "slope_sf1_sf10", "rows_sf1", "rows_sf10",
             "rows_growth_sf1_sf10")
def ratio(a, b):
    return round(b / a, 2) if a and a > 0 and b and b > 0 else None
queries = {}
for n in names:
    t = {f"sf{sf}": runs[sf]["queries"].get(n) for sf in sfs}
    t["slope_001_01"] = ratio(t["sf0.001"], t["sf0.01"])
    t["slope_01_1"] = ratio(t["sf0.01"], t["sf0.1"])
    t["slope_1_sf1"] = ratio(t["sf0.1"], t["sf1"])
    preserved = False
    for k in SF10_KEYS:
        if k in prev["queries"].get(n, {}):
            t[k] = prev["queries"][n][k]
            preserved = True
    # preserved sf10 numbers were measured on an OLDER code state than
    # the fresh sf0.001..sf1 columns beside them; mark them stale so
    # slope_sf1_sf10 != sf10/sf1 of this file reads as "re-run
    # sf10_sweep", not as an inconsistency (sf10_sweep clears the flag)
    if preserved:
        t["sf10_stale"] = True
    queries[n] = t
out = {
    "generated_by":
        "scripts/scale_sweep.sh (one JVM per SF; sf1 = GenScale-derived)",
    "cpus": cpus,
    "totals": {f"sf{sf}": runs[sf]["value"] for sf in sfs},
    "queries": queries,
}
if "sf10_watchlist" in prev:
    out["sf10_watchlist"] = dict(prev["sf10_watchlist"], stale=True)
json.dump(out, open("SCALE.json", "w"), indent=1, sort_keys=True)
print("[scale] wrote SCALE.json:", out["totals"])
EOF
