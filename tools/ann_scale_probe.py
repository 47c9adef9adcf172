"""ANN operating points at corpus scale (round-4 verdict #6): the
recall/candidate constants chosen on the 40k fixture need re-validation
at >= 1M vectors before they are design claims - bucket occupancy moves
with corpus size (hyperplane buckets at 8 planes hold n/256 vectors on
average; IVF cells hold n/n_cells).

Protocol (default 1M base vectors + 500 planted near-dups, 100 queries,
dim 64, all derived from per-id PCG64 streams - nothing driver-side):

1. exact baseline: ``brute_force_topk_blocked`` (per-batch partial
   top-k + skinny global merge), timed;
2. hyperplane LSH ``ann_topk`` at (8 planes, probe 1) and the round-4
   multi-probe point (8 planes, probe 4): recall@5, candidate count,
   candidate fraction, wall time;
3. IVF ``ivf_topk`` at 256 / 1024 / 4096 cells with n_probe keeping a
   ~1/64 candidate share; the quantizer trains on a 100k sample
   (standard IVF practice - Lloyd's on the full corpus buys nothing at
   these cell counts), assignment runs over the full corpus.

Prints one JSON line + a markdown table for BENCH/BASELINE.md.

Usage: ANN_SCALE_N=1000000 python tools/ann_scale_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("SPARK_DRIVER_MEM", "24g")

N_BASE = int(os.environ.get("ANN_SCALE_N", "1000000"))
N_QUERIES = 100
K = 5


def main():
    from pyspark.sql import functions as F

    from semanticrelationextractionpolish_spark.operators.similarity import (
        ann_topk,
        assign_cells,
        brute_force_topk_blocked,
        ivf_topk,
        kmeans_centroids,
        planted_embeddings_dist,
    )
    from semanticrelationextractionpolish_spark.session import get_spark

    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    spark = get_spark(
        app_name="ann-scale-probe", cores=cores, shuffle_partitions=2 * cores
    )
    spark.sparkContext.setLogLevel("ERROR")

    qids = list(range(N_QUERIES))
    t0 = time.time()
    emb = (
        planted_embeddings_dist(
            spark, n_base=N_BASE, n_queries=N_QUERIES, n_neighbors=5
        )
        .repartition(4 * cores)
        .localCheckpoint(eager=True)
    )
    n_total = emb.count()
    t_gen = time.time() - t0

    t0 = time.time()
    exact = (
        brute_force_topk_blocked(emb, qids, k=K)
        .select("query_id", F.col("neighbor_id").alias("nid"))
        .localCheckpoint(eager=True)
    )
    n_exact = exact.count()
    t_exact = time.time() - t0

    results = {"n_vectors": n_total, "gen_sec": round(t_gen, 1),
               "exact_baseline_sec": round(t_exact, 1), "lsh": [], "ivf": []}

    def recall(approx):
        hits = exact.join(
            approx.select("query_id", F.col("neighbor_id").alias("nid")),
            ["query_id", "nid"],
        ).count()
        return round(hits / n_exact, 4)

    from semanticrelationextractionpolish_spark.operators.similarity import (
        DEFAULT_MP_PLANES,
        DEFAULT_PROBES,
    )

    # probe sweep (round-5 verdict #2: pick the cheapest point holding
    # recall@5 >= 0.95 AT SCALE): 8-plane probes 4-8 plateau at 0.948,
    # so the sweep includes 7-plane points (double occupancy reaches
    # pairs that differ in >= 2 bits of an 8-plane code)
    for n_planes, n_probe in (
        (8, 1), (8, 4), (8, 6), (8, 8), (7, 3), (7, 4), (7, 5), (12, 8),
    ):
        t0 = time.time()
        approx = ann_topk(
            emb, qids, k=K, n_planes=n_planes, n_probe=n_probe
        ).localCheckpoint(eager=True)
        t_q = time.time() - t0
        rec = recall(approx)
        row = {
            "n_planes": n_planes,
            "n_probe": n_probe,
            "recall": rec,
            "query_sec": round(t_q, 1),
            "expected_candidate_frac": round(n_probe / (1 << n_planes), 6),
            "is_default": (n_planes, n_probe) == (DEFAULT_MP_PLANES, DEFAULT_PROBES),
        }
        results["lsh"].append(row)
        print(f"lsh {row}", file=sys.stderr)

    sample = emb.sample(fraction=min(1.0, 100_000 / max(n_total, 1)), seed=7)
    sample = sample.localCheckpoint(eager=True)
    for n_cells in (256, 1024, 4096):
        n_probe = max(1, n_cells // 64)  # ~1/64 candidate share
        t0 = time.time()
        cents = kmeans_centroids(sample, n_centroids=n_cells, n_iter=3)
        t_kmeans = time.time() - t0
        t0 = time.time()
        assign_cells(emb, cents, n_probe=1).write.format("noop").mode(
            "overwrite"
        ).save()
        t_assign = time.time() - t0
        t0 = time.time()
        approx = ivf_topk(
            emb, qids, k=K, n_centroids=n_cells, n_probe=n_probe,
            centroids=cents,
        )
        t_q = time.time() - t0
        rec = recall(approx)
        row = {
            "n_centroids": n_cells,
            "n_probe": n_probe,
            "recall": rec,
            "kmeans_100k_sample_sec": round(t_kmeans, 1),
            "assign_full_sec": round(t_assign, 1),
            "query_sec": round(t_q, 1),
            "candidate_share": round(n_probe / n_cells, 4),
        }
        results["ivf"].append(row)
        print(f"ivf {row}", file=sys.stderr)

    print("| family | params | recall@5 | query s | cand frac |")
    print("|---|---|---|---|---|")
    for r in results["lsh"]:
        print(
            f"| LSH | {r['n_planes']}p/{r['n_probe']}probe | {r['recall']:.3f} "
            f"| {r['query_sec']} | {r['expected_candidate_frac']} |"
        )
    for r in results["ivf"]:
        print(
            f"| IVF | {r['n_centroids']}c/{r['n_probe']}probe | {r['recall']:.3f} "
            f"| {r['query_sec']} | {r['candidate_share']} |"
        )
    print(json.dumps(results))


if __name__ == "__main__":
    main()
