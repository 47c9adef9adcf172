"""Streaming-KG scale run (round-5 verdict #5): drive ``stream_kg``
over a large synthetic page corpus in ~20 real micro-batches and report
docs/s, the per-batch time trend, and the final rolling-state size.
The round-5 compaction probe showed flat batch time at fixture size
only; this is the >= 500k-page evidence, runnable at N vs 4N executors
for the two-cluster-size criterion.

Protocol:

1. synthesize ``n_pages`` pages + relations (distributed, per-id
   deterministic), write pages as ``n_files`` parquet files;
2. ``stream_kg`` with maxFilesPerTrigger = n_files/20 -> ~20
   micro-batches, each extracting triples and merging mentions into the
   VersionedState (LSH + incremental CC + bucketed assignments);
3. report wall seconds, docs/s, per-batch foreachBatch durations from
   the streaming progress feed (trend = tail3/head3), state dir bytes;
4. ``--check``: assemble ``streamed_graph`` and compare nodes+edges
   EXACTLY against batch ``build_kg(link=True)`` over the same pages
   (set-equality via exceptAll counts, done AFTER timing so the check
   never pollutes the measurement).

Usage:
  spark-submit --master local-cluster[4,2,8192] --py-files semrex.zip \
      tools/scaling_stream_job.py <n_pages> [n_batches] [--check]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

from pyspark.sql import SparkSession


def du(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main():
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    check = "--check" in sys.argv
    args = [a for a in sys.argv[2:] if not a.startswith("--")]
    n_batches = int(args[0]) if args else 20
    # 8 files per trigger: a production trigger over a 100 TB directory
    # pulls files >> cores, so the per-batch SCAN is wide. The first
    # round-6 campaign used 2 files/trigger and measured 0.37 N->4N
    # efficiency - phase attribution (batch_metrics) showed every phase
    # throttled because the scan + repartition write side ran as 2
    # tasks in BOTH arms (data-proportional serial work, the one
    # shape _spread cannot fix).
    files_per_trigger = 8
    n_files = files_per_trigger * n_batches
    spark = SparkSession.builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    master = sc.master or ""
    if master.startswith("local-cluster"):
        n_exec, cores_per = (
            int(x) for x in master.split("[")[1].split("]")[0].split(",")[:2]
        )
        expected = n_exec * cores_per
        for _ in range(60):
            if sc.defaultParallelism >= expected:
                break
            time.sleep(0.5)
    cores = sc.defaultParallelism

    from semanticrelationextractionpolish_spark.sources.synth import synth_pages
    from semanticrelationextractionpolish_spark.streaming.pipeline import (
        stream_kg,
        streamed_graph,
    )

    base = f"/dev/shm/stream_scale_{os.getpid()}"
    shutil.rmtree(base, ignore_errors=True)
    in_dir = os.path.join(base, "pages_in")
    rels_path = os.path.join(base, "rels")
    out_dir = os.path.join(base, "out")
    ck_dir = os.path.join(base, "ck")
    state_dir = os.path.join(base, "state")

    pages, rels = synth_pages(spark, n_pages)
    pages.repartition(n_files).write.parquet(in_dir)
    rels.write.parquet(rels_path)
    n_actual = spark.read.parquet(in_dir).count()

    t0 = time.time()
    phases: list = []
    q = stream_kg(
        spark,
        in_dir,
        rels_path,
        out_dir,
        ck_dir,
        state_dir,
        max_files_per_trigger=files_per_trigger,
        batch_metrics=phases,
    )
    q.awaitTermination()
    wall = time.time() - t0
    def _prog(p):
        # recentProgress entries are JSON strings or progress objects
        # depending on the PySpark minor version
        if isinstance(p, str):
            return json.loads(p)
        j = getattr(p, "json", None)
        return json.loads(j) if j else dict(p)

    def _dur(p):
        ms = p.get("batchDuration") or p.get("durationMs", {}).get(
            "triggerExecution"
        )
        return round(ms / 1000.0, 2) if ms else None

    progress = [_prog(p) for p in q.recentProgress]
    batch_secs = [
        d
        for p in progress
        if p.get("numInputRows", 0) > 0
        for d in [_dur(p)]
        if d is not None
    ]
    head3 = sum(batch_secs[:3]) / max(1, len(batch_secs[:3]))
    tail3 = sum(batch_secs[-3:]) / max(1, len(batch_secs[-3:]))

    result = {
        "cores": cores,
        "n_pages": n_actual,
        "n_batches": len(batch_secs),
        "stream_sec": round(wall, 1),
        "pages_per_sec": round(n_actual / wall, 1),
        "per_batch_sec": batch_secs,
        "batch_tail_over_head": round(tail3 / head3, 2) if head3 else None,
        "state_mb": round(du(state_dir) / 1e6, 1),
        "sink_mb": round(du(out_dir) / 1e6, 1),
    }
    if phases:
        med = lambda xs: sorted(xs)[len(xs) // 2]
        for k in ("extract_sec", "sink_sec", "merge_sec"):
            result[f"{k}_med"] = med([p[k] for p in phases])

    if check:
        from pyspark.sql import functions as F

        from semanticrelationextractionpolish_spark.plans.pipeline import build_kg

        got = streamed_graph(spark, out_dir, state_dir)
        stages = build_kg(
            spark, spark.read.parquet(in_dir), spark.read.parquet(rels_path)
        )
        surf = lambda df: df.select(
            "node_id",
            "canonical",
            F.array_join("surfaces", "|").alias("surfaces"),
            "n_mentions",
        )
        edge_cols = ["src", "dst", "pred", "n_evidence"]
        result["check"] = {
            "edges_stream": got["edges"].count(),
            "edges_batch": stages["edges"].count(),
            "edges_diff": got["edges"]
            .select(*edge_cols)
            .exceptAll(stages["edges"].select(*edge_cols))
            .count()
            + stages["edges"]
            .select(*edge_cols)
            .exceptAll(got["edges"].select(*edge_cols))
            .count(),
            "nodes_stream": got["nodes"].count(),
            "nodes_batch": stages["nodes"].count(),
            "nodes_diff": surf(got["nodes"]).exceptAll(surf(stages["nodes"])).count()
            + surf(stages["nodes"]).exceptAll(surf(got["nodes"])).count(),
        }
        result["check"]["equal"] = (
            result["check"]["edges_diff"] == 0
            and result["check"]["nodes_diff"] == 0
            and result["check"]["edges_stream"] > 0
        )

    shutil.rmtree(base, ignore_errors=True)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
