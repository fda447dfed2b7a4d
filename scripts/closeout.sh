#!/bin/bash
# Per-round close-out under REAL multi-process executors: runs the
# correctness dump (graft.Verify) and the benchmark (graft.Bench) on
# local-cluster[4,8,4096] — 4 worker JVMs x 8 cores x 4 GiB, real
# serialization / broadcast / shuffle transport — so executor-real
# regressions can't reappear unnoticed between rounds.
#
# Usage: scripts/closeout.sh [verify-sf-dir] [out-dir]
#   verify-sf-dir  parquet tables for the correctness dump
#                  (default /root/testdata/sf0.001; compare the dump
#                  against DuckDB exactly like the driver does)
#   out-dir        where vcluster/ + bench-cluster.json land
#                  (default /tmp/closeout)
# Env: BENCH_SF overrides the bench scale dir (default sf0.1).
set -euo pipefail
cd "$(dirname "$0")/.."
SF=${1:-/root/testdata/sf0.001}
OUT=${2:-/tmp/closeout}
mkdir -p "$OUT"

sbt -batch package
JAR=$(ls "$PWD"/target/scala-2.13/zenodbspark_2.13-*.jar | head -1)

# SPARK_SCALA_VERSION is REQUIRED: the release Spark distro's executor
# command builder throws "Cannot find any build directories" without it.
export SPARK_SCALA_VERSION=2.13
export SPARK_GRAFT_MASTER='local-cluster[4,8,4096]'
export SPARK_GRAFT_JARS="$JAR"
export SPARK_GRAFT_CPUS=32

sbt -batch "runMain graft.Verify $SF $OUT/vcluster"

# Maintenance-lifecycle pin under multi-JVM executors: flip + lease + GC +
# restart generation discovery, with the /metrics-surface stats asserted
# at each step (exits non-zero on any violation).
# (set -o pipefail: a FAIL inside the tool exits the close-out)
sbt -batch "runMain graft.tools.MaintLifecycleCheck" | tee "$OUT/maint-check.log"
grep -q 'PASS all lifecycle assertions' "$OUT/maint-check.log"

# Maintenance-cost regression gate: MaintStress measures the three cost
# classes (corpus-flat stat tick, overhead-dominated incremental,
# fixed+linear compaction) and FAILS on a violated same-run ratio bound —
# a cost-class regression breaks the close-out instead of printing a
# worse table. Grep the EXACT full-pass line: the single-size fallback
# also prints "PASS (single size: table only)", and a sizes-config
# regression to one corpus size must fail this gate, not slide through.
sbt -batch "runMain graft.tools.MaintStress" | tee "$OUT/maint-stress.log"
grep -q 'PASS all cost-class assertions' "$OUT/maint-stress.log"
SPARK_GRAFT_SF_DIR="${BENCH_SF:-/root/testdata/sf0.1}" \
  sbt -batch "runMain graft.Bench" | tee "$OUT/bench-cluster.log"
cp target/bench.json "$OUT/bench-cluster.json"

# Load-normalize the headline total by the calibration probe: the probe's
# true cost is pure framework overhead (historical unloaded band ~0.12 s),
# so total x min(1, 0.12 / median(endpoint calibration)) strips ambient
# machine load out of cross-round comparisons (BENCH_LOCAL.md's round
# table carries BOTH raw and normalized columns). The factor is clamped
# at 1 — normalization only corrects LOADED captures downward (a cal_med
# below the band means a faster machine, not a penalty; see r19 note) —
# and the median uses ONLY the four endpoint probes, never group_size or
# the mid-series localization probes.
# The multi-JVM capture is a first-class round record, not just NOTES
# prose: write BENCH_cluster_rNN.json at the repo root with the same
# calibration fields as the local capture, so round-over-round
# executor-real perf is machine-comparable (ROUND env selects NN).
python3 - "$OUT/bench-cluster.json" "${ROUND:-20}" <<'EOF'
import json, sys, statistics
j = json.load(open(sys.argv[1]))
c = j.get("calibration", {})
cal = [c[k] for k in ("a_start", "a_end", "b_start", "b_end")
       if isinstance(c.get(k), (int, float)) and c[k] > 0]
# When the capture carries no calibration block, med/norm are UNKNOWN:
# write null (valid JSON) rather than a bare NaN token, which json.dump
# would emit and strict parsers reject — exactly in the degraded case the
# record exists to document. The normalized field is also a poor measure
# under multi-JVM masters (the 0.12 floor is single-JVM; r20's cluster
# record "normalized" 64.87s to 25.09s) — keep raw as the comparable
# number and label the norm clamped+estimated.
med = statistics.median(cal) if cal else None
FLOOR = 0.12  # unloaded calibration band, see BENCH_LOCAL.md
norm = j["value"] * min(1.0, FLOOR / med) if med else None
print(f"[closeout] total={j['value']:.2f}s"
      f" calibration_median={med if med is None else round(med, 3)}s"
      f" load_normalized_total={norm if norm is None else round(norm, 2)}s"
      f" (floor {FLOOR}, factor<=1)")
j["master"] = "local-cluster[4,8,4096]"
j["cal_med"] = None if med is None else round(med, 4)
j["cal_norm_clamped"] = None if norm is None else round(norm, 4)
out = f"BENCH_cluster_r{sys.argv[2]}.json"
with open(out, "w") as f:
    json.dump(j, f)
print(f"[closeout] wrote {out}")
EOF
echo "close-out artifacts in $OUT (vcluster/ + bench-cluster.json)"
