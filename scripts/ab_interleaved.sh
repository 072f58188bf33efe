#!/usr/bin/env bash
# Interleaved matched-steal A/B of a reference code state vs HEAD
# (VERDICT r14 item 1): the committed bench reference drifted +16.6%
# across r14 with no code-attributed cause, and the r14 A/B's two arms
# ran at 91 s vs 10 s steal — not a controlled comparison. This runs
# BOTH code states ALTERNATING in one window (ref, head, ref, head …),
# each a full-suite fresh-JVM graft.Bench at sf0.1, with both arms'
# outlier-rerun logic pinned to the SAME committed reference (the one
# at the ref commit), and writes AB_RESULT.json: per-run totals +
# self-reported steal, per-arm best/median, and per-query ratios over
# each arm's per-query MIN (min-of-N is the steal-robust estimator the
# serial bench itself uses).
#
# Usage: scripts/ab_interleaved.sh [ref-commit] [pairs] [cpus]
#        (defaults: 92088aa = round-13 boundary, 2 pairs, 32 cpus)
set -euo pipefail
cd "$(dirname "$0")/.."
REF="${1:-92088aa}"
PAIRS="${2:-2}"
CPUS="${3:-32}"
WT=/tmp/graft_ab_ref
TMP=$(mktemp -d)
cp BENCH_LAST.json "$TMP/bench_last.orig"
restore() { cp "$TMP/bench_last.orig" BENCH_LAST.json 2>/dev/null || true; }
trap 'restore; rm -rf "$TMP"' EXIT

if [ ! -d "$WT" ]; then
  git worktree add --detach "$WT" "$REF" >/dev/null
else
  # a stale worktree from an earlier run with a DIFFERENT ref would
  # silently A/B the wrong code state — force it to the requested ref
  git -C "$WT" checkout --detach "$REF" >/dev/null 2>&1
fi
if [ "$(git -C "$WT" rev-parse HEAD)" != "$(git rev-parse "$REF^{commit}")" ]; then
  echo "[ab] worktree $WT is not at $REF; remove it and rerun" >&2
  exit 1
fi
# one committed reference for BOTH arms' 3x-outlier self-heal
git show "$REF:BENCH_LAST.json" >"$TMP/ref_bench_last.json"

run_arm() { # $1 = dir, $2 = label, $3 = index
  cp "$TMP/ref_bench_last.json" "$1/BENCH_LAST.json"
  echo "[ab] run $2 #$3 ..." >&2
  mkdir -p /tmp/graft_ab_runs
  (cd "$1" && SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
      SPARK_GRAFT_CPUS="$CPUS" sbt -batch 'runMain graft.Bench') \
    >"/tmp/graft_ab_runs/${2}_${3}.out" 2>&1 || {
      echo "[ab] $2 #$3 failed; tail (full log kept in" \
        "/tmp/graft_ab_runs/${2}_${3}.out):" >&2
      tail -5 "/tmp/graft_ab_runs/${2}_${3}.out" >&2
      exit 1
    }
  cp "$1/BENCH_LAST.json" "$TMP/${2}_${3}.json"
  # keep full-precision per-run JSONs outside the tmpdir: the best
  # quiet HEAD run is a candidate new committed reference
  cp "$1/BENCH_LAST.json" "/tmp/graft_ab_runs/${2}_${3}.json"
}

# warm both arms' compile outside the timed window
echo "[ab] compiling both arms ..." >&2
sbt -batch compile >"$TMP/compile_head.out" 2>&1
(cd "$WT" && sbt -batch compile) >"$TMP/compile_ref.out" 2>&1

# AB_ORDER=head_first flips within-pair order — running one pair each
# way kills the "second arm rides the window's drift" confound
for i in $(seq 1 "$PAIRS"); do
  if [ "${AB_ORDER:-ref_first}" = head_first ]; then
    run_arm "$PWD" head "$i"
    run_arm "$WT" ref "$i"
  else
    run_arm "$WT" ref "$i"
    run_arm "$PWD" head "$i"
  fi
done
restore
python3 - "$TMP" "$REF" "$PAIRS" <<'EOF'
import json, statistics, sys
tmp, ref, pairs = sys.argv[1], sys.argv[2], int(sys.argv[3])
runs = {"ref": [], "head": []}
for arm in runs:
    for i in range(1, pairs + 1):
        runs[arm].append(json.load(open(f"{tmp}/{arm}_{i}.json")))
def summary(rs):
    return {
        "totals": [round(r["value"], 3) for r in rs],
        "steal_sec": [r.get("steal_total_sec") for r in rs],
        "reruns": [r.get("reruns") for r in rs],
        "noise_suspect": sorted({n for r in rs
                                 for n in r.get("noise_suspect", [])}),
        "best_total": round(min(r["value"] for r in rs), 3),
        "median_total": round(statistics.median(
            r["value"] for r in rs), 3),
    }
names = sorted(set.intersection(
    *[set(r["queries"]) for rs in runs.values() for r in rs]))
permin = {arm: {n: min(r["queries"][n] for r in rs
                       if r["queries"].get(n, -1) > 0)
                for n in names
                if all(r["queries"].get(n, -1) > 0 for r in rs)}
          for arm, rs in runs.items()}
common = sorted(set(permin["ref"]) & set(permin["head"]))
ratios = {n: round(permin["head"][n] / permin["ref"][n], 3)
          for n in common if permin["ref"][n] > 0.05}
rats = sorted(ratios.values())
out = {
    "ref_commit": ref,
    "design": "alternating full-suite fresh-JVM runs (ref, head) x "
              f"{pairs}; per-query MIN across each arm's runs; both "
              "arms outlier-rerun against the ref commit's "
              "BENCH_LAST.json",
    "ref": summary(runs["ref"]),
    "head": summary(runs["head"]),
    "head_over_ref_best": round(
        min(r["value"] for r in runs["head"]) /
        min(r["value"] for r in runs["ref"]), 4),
    "per_query_ratio_median": round(statistics.median(rats), 3),
    "per_query_ratio_p10": round(rats[max(0, int(0.1 * len(rats)) - 1)], 3),
    "per_query_ratio_p90": round(rats[min(len(rats) - 1,
                                          int(0.9 * len(rats)))], 3),
    "worst_regressions": dict(sorted(ratios.items(),
                                     key=lambda kv: -kv[1])[:8]),
    "best_improvements": dict(sorted(ratios.items(),
                                     key=lambda kv: kv[1])[:8]),
}
json.dump(out, open("AB_RESULT.json", "w"), indent=1)
print("[ab] ref totals:", out["ref"]["totals"], "steal:",
      out["ref"]["steal_sec"])
print("[ab] head totals:", out["head"]["totals"], "steal:",
      out["head"]["steal_sec"])
print("[ab] head/ref (best):", out["head_over_ref_best"],
      "per-query median:", out["per_query_ratio_median"])
EOF
echo "[ab] per-run BENCH_LAST copies left in $TMP are deleted on exit;"
echo "[ab] AB_RESULT.json written. Worktree $WT kept for reruns."
