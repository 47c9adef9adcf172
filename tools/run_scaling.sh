#!/bin/bash
# Paired N vs 4N executor-scaling protocol (BENCH/BASELINE.md).
#
# Design notes (round-2):
# - PAIRED reps: each iteration runs the N config and the 4N config
#   back-to-back in the same interference window; efficiency is computed
#   per pair and the MEDIAN OF PAIR RATIOS is reported. Host steal on
#   this shared VM drifts on a minutes scale, so unpaired medians mix
#   quiet-window N runs with stormy-window 4N runs (round-1's 0.63).
# - taskset pins each config to a fixed CPU set (executors inherit the
#   driver's affinity mask) so the scheduler cannot migrate JVMs across
#   vCPUs mid-run; the 4N set is a superset disjoint layout chosen once.
# - NOTHING else may run on the VM during a measurement.
#
# Usage: bash tools/run_scaling.sh [n_pairs] [n_pages] [outfile]
set -u
PAIRS=${1:-6}
PAGES=${2:-1000000}
OUT=${3:-/tmp/scaling_runs.jsonl}
cd /root/repo
rm -f /tmp/semrex.zip "$OUT"
zip -qr /tmp/semrex.zip semanticrelationextractionpolish_spark
mkdir -p /dev/shm/spark-local

run_one () {  # $1=executors $2=cpuset ("all" = no pinning) $3=shufpart
  local PIN=()
  [ "$2" != "all" ] && PIN=(taskset -c "$2")
  "${PIN[@]}" spark-submit --master "local-cluster[$1,2,8192]" \
    --conf spark.sql.shuffle.partitions="$3" \
    --conf spark.local.dir=/dev/shm/spark-local \
    --driver-memory 8g --conf spark.executor.memory=7g \
    --conf 'spark.executor.extraJavaOptions=-XX:ParallelGCThreads=4 -XX:ConcGCThreads=1 -XX:+UseG1GC' \
    --conf spark.sql.execution.arrow.maxRecordsPerBatch=20000 \
    --conf spark.ui.enabled=false \
    --py-files /tmp/semrex.zip tools/scaling_job.py "$PAGES" cache-nolink 2>/dev/null \
    | grep '"extract_sec"'
}

for i in $(seq 1 "$PAIRS"); do
  echo "=== pair $i / $PAIRS ($(date +%H:%M:%S)) ===" >&2
  # PROPORTIONAL cpu budgets (3x headroom each: 2 exec cores -> 6 cpus,
  # 8 exec cores -> 24 cpus): GC threads, Python workers and the driver
  # all live inside the set, so an asymmetric budget strangles one config
  # (first attempt gave 4N only 1.5x headroom -> a fake 0.46 efficiency)
  # Unpinned (round-1 conditions): pinning distorted JVM thread sizing -
  # 4-cpu N ran FASTER than 6-cpu N, and pinned 4N never reached its
  # unpinned speed. Pairing + median-of-ratios handles window noise.
  # shuffle partitions = 4 waves per core count: smooths per-partition
  # kernel skew (16 partitions on 8 cores left a 2-wave straggler tail)
  A=$(run_one 1 "all"  8)   # N: 1 executor x 2 cores
  B=$(run_one 4 "all" 32)   # 4N: 4 executors x 2 cores
  echo "{\"pair\": $i, \"n\": $A, \"n4\": $B}" | tee -a "$OUT"
done
python3 - "$OUT" <<'EOF'
import json, statistics, sys
rows = [json.loads(l) for l in open(sys.argv[1]) if l.strip()]
effs = []
for r in rows:
    e = r["n"]["extract_sec"] / (4 * r["n4"]["extract_sec"])
    effs.append(round(e, 3))
print("pair efficiencies:", effs)
print("median:", round(statistics.median(effs), 3))
EOF
