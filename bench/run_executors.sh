#!/usr/bin/env bash
# N vs 4N EXECUTOR evidence through the real spark-submit entry point
# (the north rule's wording: "runs via spark-submit at N and 4N
# executors"): local-cluster[n,1,3072] launches n separate executor
# JVMs with loopback shuffle/RPC — the spark-submit + executor-JVM code
# path end to end, minus only the network fabric.
#
# Core masks mirror bench/run_scaling.sh: each executor gets one core
# and the driver its own, so "4 executors" is a genuinely 4x-sized
# slice of this ~10-core-capped VM. Interleaved twice, best per size.
set -euo pipefail
cd "$(dirname "$0")/.."
JAR="${SPARK_GRAFT_JAR:-$PWD/target/scala-2.13/geomesaspark_2.13-0.1.0.jar}"
[ -f "$JAR" ] || { echo "jar missing — run: sbt -batch package" >&2; exit 1; }
export SPARK_HOME=/opt/spark
export SPARK_SCALA_VERSION=2.13
N_IMAGES="${SPARK_GRAFT_IMAGES:-50000000}"

run() { # nexec
  local n="$1"
  # driver core + n executor cores; SPARK_GRAFT_CORE_BASE moves the
  # window off the shared low cores (see bench/run_scaling.sh)
  local base="${SPARK_GRAFT_CORE_BASE:-0}"
  local mask="$base-$((base + n))"
  SPARK_GRAFT_MASTER="local-cluster[$n,1,3072]" \
  SPARK_GRAFT_IMAGES="$N_IMAGES" \
  SPARK_GRAFT_JAR="$JAR" \
    taskset -c "$mask" "$SPARK_HOME/bin/spark-submit" \
      --master "local-cluster[$n,1,3072]" \
      --class graft.ScalingBench \
      --driver-memory 8g \
      "$JAR" 2>/dev/null | grep '"bench":"scaling"'
}

echo "== warm cache (generate input if missing) =="
run 4 > /dev/null

RESULTS=()
for round in 1 2; do
  echo "== round $round: 1 executor =="
  R="$(run 1)"; RESULTS+=("$R"); echo "$R"
  echo "== round $round: 4 executors =="
  R="$(run 4)"; RESULTS+=("$R"); echo "$R"
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
  "mode": "spark-submit local-cluster (separate executor JVMs)",
  "low_executors": lo, "low_images_per_sec": round(a["images_per_sec"]),
  "high_executors": hi, "high_images_per_sec": round(b["images_per_sec"]),
  "speedup": round(ratio, 3), "scaling_efficiency": round(eff, 3),
  "join_rows": a["join_rows"], "tile_rows": a["tile_rows"], "images": a["images"]}))
EOF
