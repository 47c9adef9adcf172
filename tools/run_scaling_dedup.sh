#!/bin/bash
# Paired N vs 4N scaling campaign for the dedup/linking family
# (round-4 verdict #5). Same protocol as tools/run_scaling.sh: paired
# back-to-back reps (N then 4N in one interference window), unpinned,
# median of per-pair ratios, NOTHING else running on the VM.
#
# Usage: bash tools/run_scaling_dedup.sh [n_pairs] [n_docs] [outfile] [stages_csv]
set -u
PAIRS=${1:-4}
DOCS=${2:-1000000}
OUT=${3:-/tmp/scaling_dedup_runs.jsonl}
STAGES=${4:-minhash,simhash,ngram,link}
cd /root/repo
rm -f /tmp/semrex.zip "$OUT"
zip -qr /tmp/semrex.zip semanticrelationextractionpolish_spark
mkdir -p /dev/shm/spark-local

run_one () {  # $1=executors $2=shufpart
  spark-submit --master "local-cluster[$1,2,8192]" \
    --conf spark.sql.shuffle.partitions="$2" \
    --conf spark.local.dir=/dev/shm/spark-local \
    --driver-memory 8g --conf spark.executor.memory=7g \
    --conf 'spark.executor.extraJavaOptions=-XX:ParallelGCThreads=4 -XX:ConcGCThreads=1 -XX:+UseG1GC' \
    --conf spark.sql.execution.arrow.maxRecordsPerBatch=20000 \
    --conf spark.ui.enabled=false \
    --py-files /tmp/semrex.zip tools/scaling_dedup_job.py "$DOCS" "$STAGES" 2>/dev/null \
    | grep '"total_sec"'
}

for i in $(seq 1 "$PAIRS"); do
  echo "=== pair $i / $PAIRS ($(date +%H:%M:%S)) ===" >&2
  A=$(run_one 1 8)    # N: 1 executor x 2 cores
  B=$(run_one 4 32)   # 4N: 4 executors x 2 cores
  echo "{\"pair\": $i, \"n\": $A, \"n4\": $B}" | tee -a "$OUT"
done
python3 - "$OUT" <<'EOF'
import json, statistics, sys
rows = [json.loads(l) for l in open(sys.argv[1]) if l.strip()]
stages = ["minhash_sec", "simhash_sec", "ngram_sec", "link_sec", "total_sec"]
summary = {}
for s in stages:
    if s not in rows[0]["n"]:
        continue
    effs = [round(r["n"][s] / (4 * r["n4"][s]), 3) for r in rows]
    summary[s] = {"pair_efficiencies": effs,
                  "median": round(statistics.median(effs), 3)}
print(json.dumps(summary, indent=1))
EOF
