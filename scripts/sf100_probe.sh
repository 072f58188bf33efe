#!/usr/bin/env bash
# sf100 feasibility probe for the steepest sf10 slopes (VERDICT r15
# item 7): dd_ngram_jaccard (10.8), fj2_damerau_join (10.5) and
# hy_hybrid_rrf (14.7 before the adaptive vector channel) get ONE more
# decade — 100x the correctness-gate scale, 500k documents — so the
# 100 TB claim for the worst shapes rests on measurement, not
# extrapolation past sf10.
#
# Disk arithmetic (why this is feasible): the probe needs only the
# three tables those queries read — documents (79 MB at sf10 ->
# ~0.8 GB), embeddings (51 MB -> ~0.5 GB), part (19 MB -> ~0.2 GB) —
# ~1.5 GB total against >70 GB free. The full-relation sf100 (lineitem
# at 14 GB etc.) is deliberately NOT derived; no watch-list query here
# reads it.
#
# Runs are fresh-JVM, SPARK_GRAFT_ONLY-scoped; BENCH_LAST.json is
# stashed (3x-outlier self-heal must not fire on genuinely-10x-slower
# queries). A timing pass and a separate SPARK_GRAFT_AUDIT pass (whose
# times are never merged) land "sf100", "slope_sf10_sf100",
# "rows_sf100" and "candidates_sf100" in SCALE.json.
#
# Usage: scripts/sf100_probe.sh [cpus]   (default 8)
set -euo pipefail
cd "$(dirname "$0")/.."
CPUS="${1:-8}"
QUERIES="dd_ngram_jaccard,fj2_damerau_join,hy_hybrid_rrf"
AUDIT_QUERIES="dd_ngram_jaccard,sim_neardup_cosine"
TMP=$(mktemp -d)
mv BENCH_LAST.json "$TMP/bench_last.orig" 2>/dev/null || true
restore() { mv "$TMP/bench_last.orig" BENCH_LAST.json 2>/dev/null || true; }
trap 'restore; rm -rf "$TMP"' EXIT

if [ ! -d .scale/sf10/documents.parquet ]; then
  echo "[sf100] .scale/sf10 missing - run scripts/sf10_sweep.sh first" >&2
  exit 1
fi
if [ ! -d .scale/sf100/documents.parquet ]; then
  echo "[sf100] deriving sf100 probe tables (.scale/sf100) ..." >&2
  sbt -batch 'runMain graft.GenScale .scale/sf10 .scale/sf100 10 documents embeddings part' \
    >"$TMP/gen100.out" 2>&1 || { tail -5 "$TMP/gen100.out" >&2; exit 1; }
fi

echo "[sf100] timing pass ..." >&2
SPARK_GRAFT_SF_DIR=".scale/sf100" SPARK_GRAFT_CPUS="$CPUS" \
  SPARK_GRAFT_ONLY="$QUERIES" \
  sbt -batch 'runMain graft.Bench' >"$TMP/bench_100.out" 2>&1 || {
    echo "[sf100] bench failed; tail:" >&2
    tail -5 "$TMP/bench_100.out" >&2
    exit 1
  }
grep '"metric"' "$TMP/bench_100.out" | tail -1 >"$TMP/json_100"

echo "[sf100] candidate-audit pass ..." >&2
SPARK_GRAFT_SF_DIR=".scale/sf100" SPARK_GRAFT_CPUS="$CPUS" \
  SPARK_GRAFT_ONLY="$AUDIT_QUERIES" SPARK_GRAFT_AUDIT=true \
  sbt -batch 'runMain graft.Bench' >"$TMP/audit_100.out" 2>&1 || {
    echo "[sf100] audit pass failed; tail:" >&2
    tail -5 "$TMP/audit_100.out" >&2
    exit 1
  }
grep '"metric"' "$TMP/audit_100.out" | tail -1 >"$TMP/audit_json_100"
restore
python3 - "$TMP" <<'EOF'
import json, sys
tmp = sys.argv[1]
r = json.loads(open(f"{tmp}/json_100").read())
a = json.loads(open(f"{tmp}/audit_json_100").read())
scale = json.load(open("SCALE.json"))
rows = r.get("queries_rows", {})
for n, t100 in r["queries"].items():
    q = scale["queries"].setdefault(n, {})
    t10 = q.get("sf10")
    q["sf100"] = t100
    q["slope_sf10_sf100"] = (round(t100 / t10, 2)
                             if t10 and t10 > 0 and t100 and t100 > 0
                             else None)
    if n in rows:
        q["rows_sf100"] = rows[n]
        if q.get("rows_sf10"):
            q["rows_growth_sf10_sf100"] = round(
                rows[n] / q["rows_sf10"], 2)
for n, c in a.get("queries_candidates", {}).items():
    q = scale["queries"].setdefault(n, {})
    q["candidates_sf100"] = c
    if q.get("candidates_sf10"):
        q["candidates_growth_sf10_sf100"] = round(
            c / q["candidates_sf10"], 2)
scale["sf100_probe"] = {
    "queries": sorted(r["queries"].keys()),
    "total": round(sum(v for v in r["queries"].values() if v > 0), 3),
    "spill_bytes": r.get("spill_bytes", -1),
    "steal_sec": r.get("steal_total_sec"),
    "note": "6th decade (100x the gate scale, 500k docs); tables "
            "derived: documents embeddings part only",
}
json.dump(scale, open("SCALE.json", "w"), indent=1, sort_keys=True)
print("[sf100] merged:", {n: (scale["queries"][n].get("sf100"),
                              scale["queries"][n].get("slope_sf10_sf100"))
                          for n in r["queries"]})
EOF
