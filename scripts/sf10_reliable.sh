#!/usr/bin/env bash
# Reliable-checkpoint mode at the sf10 decade (VERDICT r14 item 5):
# the +7% sf0.1 measurement was the first datapoint, but stage frames
# at sf10 are GBs — the DFS-write trade is what a preemptible 100 TB
# cluster pays per stage boundary, and a local disk-backed checkpoint
# dir approximates it. Runs the full sf10 watch list twice in the same
# window — default (localCheckpoint) then SPARK_GRAFT_RELIABLE=true —
# and merges per-query overhead into SCALE.json:
#   queries.<n>.sf10_reliable       wall under reliable mode
#   queries.<n>.reliable_overhead   sf10_reliable / sf10_local
# plus a reliable_sf10 summary block with totals and a rows/rounds
# identity verdict (the mode must change BLOCK PLACEMENT, never
# results — CheckpointModeSpec pins it at spec scale, this pins it at
# decade scale).
#
# Usage: scripts/sf10_reliable.sh [cpus]   (default 8)
set -euo pipefail
cd "$(dirname "$0")/.."
CPUS="${1:-8}"
QUERIES="dd_ngram_jaccard,fj1_fuzzy_join,fj2_damerau_join,fj3_jw_join,fj4_auto_blocked,j3_bloom_semi,ql_lm_buckets,tc_bigram_lm,gr_cc,dd_minhash_groups,sim_neardup_groups,tp_dataset_build,tp_dataset_build_report,dc2_fuzzy_decontamination,dd_minhash_recall,p5_envelope_roundtrip,hy_hybrid_rrf,gr_pagerank"
TMP=$(mktemp -d)
mv BENCH_LAST.json "$TMP/bench_last.orig" 2>/dev/null || true
restore() { mv "$TMP/bench_last.orig" BENCH_LAST.json 2>/dev/null || true; }
trap 'restore; rm -rf "$TMP"' EXIT

if [ ! -d .scale/sf10/lineitem.parquet ]; then
  echo "[rel] .scale/sf10 missing - run scripts/sf10_sweep.sh first" >&2
  exit 1
fi

# Checkpoints.stage's default reliable dir is ${java.io.tmpdir}/graft-ckpt
CKPT_DIR=/tmp/graft-ckpt
for MODE in local reliable; do
  echo "[rel] sf10 watch list, mode=$MODE ..." >&2
  rm -rf "$CKPT_DIR"
  ENV_EXTRA=()
  if [ "$MODE" = reliable ]; then
    ENV_EXTRA=(SPARK_GRAFT_RELIABLE=true)
  fi
  env SPARK_GRAFT_SF_DIR=".scale/sf10" SPARK_GRAFT_CPUS="$CPUS" \
    SPARK_GRAFT_ONLY="$QUERIES" "${ENV_EXTRA[@]}" \
    sbt -batch 'runMain graft.Bench' >"$TMP/bench_$MODE.out" 2>&1 || {
      echo "[rel] bench failed in mode=$MODE; tail:" >&2
      tail -5 "$TMP/bench_$MODE.out" >&2
      exit 1
    }
  grep '"metric"' "$TMP/bench_$MODE.out" | tail -1 >"$TMP/json_$MODE"
done
rm -rf "$CKPT_DIR"
restore
python3 - "$TMP" <<'EOF'
import json, sys
tmp = sys.argv[1]
loc = json.loads(open(f"{tmp}/json_local").read())
rel = json.loads(open(f"{tmp}/json_reliable").read())
scale = json.load(open("SCALE.json"))
# a truncated rows map (rows_omitted marker) can only certify the
# subset it carries — downgrade the verdict to "partial" (ADVICE r15)
omitted = (loc.get("rows_omitted", 0) or 0) + (rel.get("rows_omitted", 0) or 0)
rows_ok = loc.get("queries_rows") == rel.get("queries_rows")
if omitted and rows_ok:
    rows_ok = "partial"
rounds_ok = loc.get("queries_rounds") == rel.get("queries_rounds")
overheads = {}
for n, tr in rel["queries"].items():
    tl = loc["queries"].get(n)
    q = scale["queries"].setdefault(n, {})
    q["sf10_reliable"] = tr
    if tl and tl > 0 and tr and tr > 0:
        q["reliable_overhead"] = round(tr / tl, 2)
        overheads[n] = q["reliable_overhead"]
tot_l = sum(v for v in loc["queries"].values() if v > 0)
tot_r = sum(v for v in rel["queries"].values() if v > 0)
scale["reliable_sf10"] = {
    "local_total": round(tot_l, 3),
    "reliable_total": round(tot_r, 3),
    "overhead_total": round(tot_r / tot_l, 2) if tot_l else None,
    "rows_identical": rows_ok,
    "rounds_identical": rounds_ok,
    "spill_bytes_local": loc.get("spill_bytes", -1),
    "spill_bytes_reliable": rel.get("spill_bytes", -1),
    "steal_local_sec": loc.get("steal_total_sec"),
    "steal_reliable_sec": rel.get("steal_total_sec"),
    "note": "same window, local mode first; reliable checkpoints to "
            "a local-disk dir (DFS stand-in)",
}
json.dump(scale, open("SCALE.json", "w"), indent=1, sort_keys=True)
print("[rel] totals local/reliable:", round(tot_l, 1), round(tot_r, 1),
      "rows_identical:", rows_ok, "rounds_identical:", rounds_ok)
print("[rel] worst overheads:", dict(sorted(overheads.items(),
      key=lambda kv: -kv[1])[:5]))
EOF
