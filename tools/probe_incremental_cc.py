"""Incremental-linking cost probe: per-batch merge time must stay FLAT
as the accumulated graph grows (round-3 verdict "Next" #4: the old path
re-ran connected components over the ENTIRE accumulated edge set every
batch, so batch N cost grew with total graph size, not batch size).

Protocol: stream B equal-sized batches of FRESH lemmas into
``merge_mentions_batch``. Each batch contains ``per_batch`` near-dup
lemma pairs (lemma_i / lemma_i+suffix share almost all 3-gram shingles,
so LSH links them), disjoint from every other batch. After B batches
the accumulated edge state is ~B x per-batch edges; if the component
merge were still global, per-batch time would climb ~linearly with B.
Report: per-batch wall times, first->last ratio, and the state's final
edge/assignment counts (sanity: every planted pair merged).

Usage: python tools/probe_incremental_cc.py [n_batches] [pairs_per_batch]
Prints one JSON line for PLANS.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_BATCHES = int(sys.argv[1]) if len(sys.argv) > 1 else 10
PER_BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000


def main():
    from pyspark.sql import functions as F

    from semanticrelationextractionpolish_spark.session import get_spark
    from semanticrelationextractionpolish_spark.streaming.linking import (
        merge_mentions_batch,
    )
    from semanticrelationextractionpolish_spark.streaming.state import (
        read_state_table,
    )

    spark = get_spark(cores=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    spark.sparkContext.setLogLevel("ERROR")
    state = "/tmp/probe_inc_cc_state"
    shutil.rmtree(state, ignore_errors=True)

    times = []
    for b in range(N_BATCHES):
        lo, hi = b * PER_BATCH, (b + 1) * PER_BATCH
        # md5-derived lemmas: planted pairs (x, x+"a") share nearly all
        # 3-gram shingles; DISTINCT ids share practically none (the
        # first probe draft used "lemat_entity_<i>" lemmas, whose long
        # common prefixes made every id a near-dup of dozens of others)
        base = spark.range(lo, hi).select(F.md5(F.col("id").cast("string")).alias("lemma"))
        pair = base.select(F.concat("lemma", F.lit("a")).alias("lemma"))
        mentions = (
            base.unionByName(pair)
            .select(
                F.concat(F.lit("https://p/"), F.col("lemma")).alias("url"),
                F.lit(0).alias("sent_idx"),
                F.lit("e1").alias("entity_id"),
                F.lit("city_nam").alias("entity_class"),
                F.lit(0).alias("beg"),
                F.lit(1).alias("end"),
                F.col("lemma").alias("surface"),
                "lemma",
            )
            .localCheckpoint(eager=True)  # exclude synthesis from timing
        )
        t0 = time.time()
        merge_mentions_batch(spark, mentions, state, batch_id=b)
        times.append(round(time.time() - t0, 2))
        print(f"batch {b}: {times[-1]}s", file=sys.stderr)

    edges = read_state_table(spark, state, "edges").count()
    assigns = read_state_table(spark, state, "assignments")
    n_lemmas = assigns.count()
    n_comps = assigns.select("canonical").distinct().count()
    tail = sum(times[-3:]) / 3
    head = sum(times[:3]) / 3
    print(
        json.dumps(
            {
                "probe": "incremental_cc_flat_cost",
                "n_batches": N_BATCHES,
                "pairs_per_batch": PER_BATCH,
                "per_batch_sec": times,
                "head3_avg_sec": round(head, 2),
                "tail3_avg_sec": round(tail, 2),
                "tail_over_head": round(tail / head, 2),
                "accumulated_edges": edges,
                "n_lemmas": n_lemmas,
                "n_components": n_comps,
                "all_pairs_merged": n_comps == N_BATCHES * PER_BATCH,
            }
        )
    )


if __name__ == "__main__":
    main()
