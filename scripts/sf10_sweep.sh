#!/usr/bin/env bash
# Targeted sf1 -> sf10 decade for the steep-slope watch list
# (VERDICT r12 item 3): the six queries whose sf0.1->sf1 slope
# exceeded 4x are exactly where the 100x claim rests on extrapolation,
# so this sweep measures them one more decade and merges
# "sf10" + "slope_sf1_sf10" into the committed SCALE.json.
#
# The sf10 corpus is GenScale-derived from .scale/sf1 for ONLY the
# tables the watch list reads (documents, events, part, orders,
# lineitem) -- the perturbation rules compose across decades (see
# GenScale scaladoc). Runs are fresh-JVM, SPARK_GRAFT_ONLY-scoped;
# BENCH_LAST.json is stashed so (a) the 3x-outlier self-heal doesn't
# fire on genuinely-10x-slower queries and (b) the committed sf0.1
# reference is never overwritten.
#
# Usage: scripts/sf10_sweep.sh [cpus]   (default 8)
set -euo pipefail
cd "$(dirname "$0")/.."
CPUS="${1:-8}"
# r13 steep-slope set + (VERDICT r13 item 1) the iterative/CC/
# dataset-build family — the suite's most expensive queries, whose
# pointer-jumping ROUND COUNT could grow with the decade (reported as
# cc_rounds_* next to the slope) + (VERDICT r14 item 6) the four
# expensive non-watch-list queries: dd_minhash_recall,
# p5_envelope_roundtrip, hy_hybrid_rrf, and gr_pagerank (iterative —
# its ppm-integer power iterations should hold a flat round count
# like gr_cc across the decade)
QUERIES="dd_ngram_jaccard,fj1_fuzzy_join,fj2_damerau_join,fj3_jw_join,fj4_auto_blocked,j3_bloom_semi,ql_lm_buckets,tc_bigram_lm,gr_cc,dd_minhash_groups,sim_neardup_groups,tp_dataset_build,tp_dataset_build_report,dc2_fuzzy_decontamination,dd_minhash_recall,p5_envelope_roundtrip,hy_hybrid_rrf,gr_pagerank"
# candidate-volume attribution pass (VERDICT r14 item 3): the two
# steepest sf10 slopes get their PRE-VERIFY candidate-pair counts
# measured at sf1 and sf10 — a separate SPARK_GRAFT_AUDIT=true run
# whose times are never merged (the audit costs extra count actions).
# tp_dataset_build_report rides the same pass for its per-stage
# timing breakdown (VERDICT r14 item 4).
AUDIT_QUERIES="dd_ngram_jaccard,sim_neardup_groups,tp_dataset_build_report"
TMP=$(mktemp -d)
mv BENCH_LAST.json "$TMP/bench_last.orig" 2>/dev/null || true
restore() { mv "$TMP/bench_last.orig" BENCH_LAST.json 2>/dev/null || true; }
trap 'restore; rm -rf "$TMP"' EXIT

if [ ! -d .scale/sf1/lineitem.parquet ]; then
  echo "[sf10] deriving sf1 testdata (.scale/sf1) ..." >&2
  sbt -batch 'runMain graft.GenScale /root/testdata/sf0.1 .scale/sf1 10' \
    >"$TMP/gen1.out" 2>&1 || { tail -5 "$TMP/gen1.out" >&2; exit 1; }
fi
if [ ! -d .scale/sf10/lineitem.parquet ]; then
  echo "[sf10] deriving sf10 watch-list tables (.scale/sf10) ..." >&2
  sbt -batch 'runMain graft.GenScale .scale/sf1 .scale/sf10 10 documents events part orders lineitem embeddings' \
    >"$TMP/gen10.out" 2>&1 || { tail -5 "$TMP/gen10.out" >&2; exit 1; }
fi
# embeddings joined the watch list in r14 (sim_neardup_groups); derive
# it into a pre-existing sf10 dir that predates the extension
if [ ! -d .scale/sf10/embeddings.parquet ]; then
  echo "[sf10] deriving sf10 embeddings ..." >&2
  sbt -batch 'runMain graft.GenScale .scale/sf1 .scale/sf10 10 embeddings' \
    >"$TMP/gen10e.out" 2>&1 || { tail -5 "$TMP/gen10e.out" >&2; exit 1; }
fi

for SF in 1 10; do
  echo "[sf10] bench watch list at sf$SF ..." >&2
  # partition ceiling follows the data scale automatically now
  # (GraftSession.tuneForData derives it from the dir's on-disk bytes;
  # VERDICT r13 item 6) — no env knob, no per-decade operator input
  SPARK_GRAFT_SF_DIR=".scale/sf$SF" SPARK_GRAFT_CPUS="$CPUS" \
    SPARK_GRAFT_ONLY="$QUERIES" \
    sbt -batch 'runMain graft.Bench' >"$TMP/bench_$SF.out" 2>&1 || {
      echo "[sf10] bench failed at sf$SF; tail:" >&2
      tail -5 "$TMP/bench_$SF.out" >&2
      exit 1
    }
  grep '"metric"' "$TMP/bench_$SF.out" | tail -1 >"$TMP/json_$SF"
  echo "[sf10] candidate-audit pass at sf$SF ..." >&2
  SPARK_GRAFT_SF_DIR=".scale/sf$SF" SPARK_GRAFT_CPUS="$CPUS" \
    SPARK_GRAFT_ONLY="$AUDIT_QUERIES" SPARK_GRAFT_AUDIT=true \
    sbt -batch 'runMain graft.Bench' >"$TMP/audit_$SF.out" 2>&1 || {
      echo "[sf10] audit pass failed at sf$SF; tail:" >&2
      tail -5 "$TMP/audit_$SF.out" >&2
      exit 1
    }
  grep '"metric"' "$TMP/audit_$SF.out" | tail -1 >"$TMP/audit_json_$SF"
done
restore
python3 - "$TMP" <<'EOF'
import json, sys
tmp = sys.argv[1]
r1 = json.loads(open(f"{tmp}/json_1").read())
r10 = json.loads(open(f"{tmp}/json_10").read())
a1 = json.loads(open(f"{tmp}/audit_json_1").read())
a10 = json.loads(open(f"{tmp}/audit_json_10").read())
scale = json.load(open("SCALE.json"))
rows1 = r1.get("queries_rows", {})
rows10 = r10.get("queries_rows", {})
rnd1 = r1.get("queries_rounds", {})
rnd10 = r10.get("queries_rounds", {})
for n, t10 in r10["queries"].items():
    q = scale["queries"].setdefault(n, {})
    t1 = r1["queries"].get(n)
    q["sf10"] = t10
    q["slope_sf1_sf10"] = (round(t10 / t1, 2)
                           if t1 and t1 > 0 and t10 and t10 > 0 else None)
    q.pop("sf10_stale", None)  # freshly measured on THIS code state
    # output growth across the decade: a wall slope is only
    # interpretable next to the RESULT growth it carries (near-dup
    # pair queries on a decade-stacked corpus legitimately answer
    # superlinearly more rows)
    o1, o10 = rows1.get(n), rows10.get(n)
    if o1 is not None and o10 is not None:
        q["rows_sf1"], q["rows_sf10"] = o1, o10
        q["rows_growth_sf1_sf10"] = round(o10 / o1, 2) if o1 > 0 else None
    # iterative kernels: the pointer-jumping round count across the
    # decade — the slope claim needs rounds ~log(diameter) to hold
    if n in rnd1 or n in rnd10:
        q["cc_rounds_sf1"] = rnd1.get(n)
        q["cc_rounds_sf10"] = rnd10.get(n)
# pre-verify candidate-pair counts from the audit pass (VERDICT r14
# item 3): candidates growing ~linearly with the decade says the
# blocking holds and a steep wall slope is candidate/output volume on
# a densifying corpus; superlinear growth says fix the blocking
c1 = a1.get("queries_candidates", {})
c10 = a10.get("queries_candidates", {})
for n in set(c1) | set(c10):
    q = scale["queries"].setdefault(n, {})
    q["candidates_sf1"] = c1.get(n)
    q["candidates_sf10"] = c10.get(n)
    if c1.get(n) and c10.get(n):
        q["candidates_growth_sf1_sf10"] = round(c10[n] / c1[n], 2)
# candidate counts at the scaled-up blocking key (bits+3): how much
# of a superlinear candidate growth the blocking knob reclaims
cs1 = a1.get("queries_candidates_scaled", {})
cs10 = a10.get("queries_candidates_scaled", {})
for n in set(cs1) | set(cs10):
    q = scale["queries"].setdefault(n, {})
    q["candidates_scaled_sf1"] = cs1.get(n)
    q["candidates_scaled_sf10"] = cs10.get(n)
# audit-mode stage-timing breakdowns (VERDICT r14 item 4): which
# pipeline stage owns a multi-stage query's decade wall
s1 = a1.get("queries_stage_ms", {})
s10 = a10.get("queries_stage_ms", {})
for n in set(s1) | set(s10):
    q = scale["queries"].setdefault(n, {})
    if n in s1:
        q["stage_ms_sf1"] = s1[n]
    if n in s10:
        q["stage_ms_sf10"] = s10[n]
scale["sf10_watchlist"] = {
    "queries": sorted(r10["queries"].keys()),
    "sf1_total": round(sum(v for v in r1["queries"].values() if v > 0), 3),
    "sf10_total": round(sum(v for v in r10["queries"].values() if v > 0), 3),
    "sf10_spill_bytes": r10.get("spill_bytes", -1),
    "note": "targeted decade, fresh JVM, SPARK_GRAFT_ONLY-scoped; "
            "sf10 tables: documents events part orders lineitem "
            "embeddings",
}
json.dump(scale, open("SCALE.json", "w"), indent=1, sort_keys=True)
print("[sf10] merged:", {n: scale["queries"][n].get("slope_sf1_sf10")
                         for n in r10["queries"]})
EOF
