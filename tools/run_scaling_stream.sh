#!/bin/bash
# Paired N vs 4N scaling campaign for the streaming KG path
# (round-5 verdict #5). Same protocol as tools/run_scaling.sh: paired
# back-to-back arms (N then 4N in one interference window), unpinned,
# NOTHING else running on the VM. Each arm runs
# tools/scaling_stream_job.py (synth pages -> stream_kg over real
# micro-batches -> docs/s + per-batch trend + state size).
#
# Usage: bash tools/run_scaling_stream.sh [n_pages] [n_batches] [outfile] [--check]
set -u
PAGES=${1:-500000}
BATCHES=${2:-20}
OUT=${3:-/tmp/scaling_stream_runs.jsonl}
CHECK=${4:-}
cd /root/repo
if [ ! -f /tmp/semrex.zip ]; then
  zip -qr /tmp/semrex.zip semanticrelationextractionpolish_spark
fi
mkdir -p /dev/shm/spark-local

run_one () {  # $1=executors $2=shufpart  rest=job args
  ex=$1; sp=$2; shift 2
  spark-submit --master "local-cluster[$ex,2,8192]" \
    --conf spark.sql.shuffle.partitions="$sp" \
    --conf spark.local.dir=/dev/shm/spark-local \
    --driver-memory 8g --conf spark.executor.memory=7g \
    --conf 'spark.executor.extraJavaOptions=-XX:ParallelGCThreads=4 -XX:ConcGCThreads=1 -XX:+UseG1GC' \
    --conf spark.sql.execution.arrow.maxRecordsPerBatch=20000 \
    --conf spark.ui.enabled=false \
    --py-files /tmp/semrex.zip tools/scaling_stream_job.py "$@" 2>/dev/null \
    | grep '"stream_sec"'
}

echo "=== stream pair pages=$PAGES batches=$BATCHES ($(date +%H:%M:%S)) ===" >&2
A=$(run_one 1 8 "$PAGES" "$BATCHES" $CHECK)
echo "{\"arm\": \"N\", \"batches\": $BATCHES, \"r\": $A}" | tee -a "$OUT"
B=$(run_one 4 32 "$PAGES" "$BATCHES" $CHECK)
echo "{\"arm\": \"4N\", \"batches\": $BATCHES, \"r\": $B}" | tee -a "$OUT"
python3 - "$A" "$B" <<'EOF'
import json, sys
a, b = json.loads(sys.argv[1]), json.loads(sys.argv[2])
eff = a["stream_sec"] / (4 * b["stream_sec"])
print(json.dumps({"n_sec": a["stream_sec"], "n4_sec": b["stream_sec"],
                  "n_pps": a["pages_per_sec"], "n4_pps": b["pages_per_sec"],
                  "efficiency": round(eff, 3)}))
EOF
