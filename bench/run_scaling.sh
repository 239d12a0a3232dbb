#!/usr/bin/env bash
# Scaling-efficiency evidence (north rule): same flagship job at N and 4N
# cores, efficiency = throughput(4N) / (4 * throughput(N)).
#
# Methodology notes (sandbox stand-in for N vs 4N executors):
#  - the whole JVM is confined with `taskset`, so GC/JIT threads share
#    the same budget — "8 cores" behaves like a quarter-size cluster,
#    not like 8 task threads with 24 free helper cores;
#  - low/high runs interleave twice and each JVM reports its best of two
#    measured runs (after a warmup), minimizing noisy-neighbor skew in
#    the virtualized environment;
#  - input is a pre-generated cached Parquet table, identical across all
#    runs; row counts are asserted identical.
set -euo pipefail
cd "$(dirname "$0")/.."
N_IMAGES="${SPARK_GRAFT_IMAGES:-50000000}"
LOW="${SPARK_GRAFT_LOW:-1}"
HIGH="${SPARK_GRAFT_HIGH:-4}"
export SPARK_DRIVER_MEM="${SPARK_DRIVER_MEM:-16g}"

# SPARK_GRAFT_CORE_BASE moves the pinned core window (default 0): on this
# VM the low cores are shared with host/driver monitoring threads, and a
# 4-core run on 0-3 measures ~15% under the same run on 4-7. Both sizes
# use the SAME window, so the low/high comparison stays apples-to-apples.
BASE="${SPARK_GRAFT_CORE_BASE:-0}"

run() { # cpus
  local cpus="$1"
  local mask="$BASE-$((BASE + cpus - 1))"
  SPARK_GRAFT_CPUS="$cpus" SPARK_GRAFT_IMAGES="$N_IMAGES" \
    taskset -c "$mask" sbt -batch "runMain graft.ScalingBench" 2>&1 \
    | grep '"bench":"scaling"' | sed 's/^\[info\] //'
}

echo "== warm cache (generate input if missing) =="
run "$HIGH" > /dev/null

RESULTS=()
for round in 1 2; do
  echo "== round $round: local[$LOW] =="
  R="$(run "$LOW")"; RESULTS+=("$R"); echo "$R"
  echo "== round $round: local[$HIGH] =="
  R="$(run "$HIGH")"; RESULTS+=("$R"); echo "$R"
done

python3 - "${RESULTS[@]}" <<'EOF'
import json, sys
rows = [json.loads(a) for a in sys.argv[1:]]
best = {}
for r in rows:
    c = r["cpus"]
    if c not in best or r["images_per_sec"] > best[c]["images_per_sec"]:
        best[c] = r
lo, hi = sorted(best)
a, b = best[lo], best[hi]
assert a["join_rows"] == b["join_rows"] and a["tile_rows"] == b["tile_rows"]
ratio = b["images_per_sec"] / a["images_per_sec"]
eff = ratio / (hi / lo)
print(json.dumps({
  "low_cpus": lo, "low_images_per_sec": round(a["images_per_sec"]),
  "high_cpus": hi, "high_images_per_sec": round(b["images_per_sec"]),
  "speedup": round(ratio, 3), "scaling_efficiency": round(eff, 3),
  "join_rows": a["join_rows"], "tile_rows": a["tile_rows"], "images": a["images"]}))
EOF
