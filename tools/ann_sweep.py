"""ANN operating-point sweeps on the planted near-neighbor fixture.

* hyperplane LSH: recall vs (n_planes, n_probe) - the bucket-count AND
  multi-probe knobs (round-2 verdict #8, round-3 verdict #6);
* IVF: recall + assignment-stage time vs n_centroids (16/256/1024) at
  fixed candidate share - evidence that the broadcast-numpy cell
  assignment holds at realistic cell counts (round-3 verdict #5; the
  old per-centroid literal plan stopped being compilable long before
  1024 cells).

Prints the markdown tables recorded in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    from pyspark.sql import functions as F

    from semanticrelationextractionpolish_spark.operators.similarity import (
        ann_recall_sweep,
        assign_cells,
        brute_force_topk,
        ivf_topk,
        kmeans_centroids,
        planted_embeddings,
    )
    from semanticrelationextractionpolish_spark.session import get_spark

    spark = get_spark(app_name="ann-sweep", cores=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    emb = planted_embeddings(spark, n_base=2000, n_queries=100, n_neighbors=5)
    emb = emb.localCheckpoint(eager=True)
    rows = ann_recall_sweep(
        emb,
        query_ids=list(range(100)),
        k=5,
        plane_counts=(4, 6, 8, 10, 12, (8, 2), (8, 4), (8, 6), (12, 4), (12, 8)),
    )
    print("| n_planes | n_probe | mean recall@5 | avg candidates | candidate frac |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['n_planes']} | {r['n_probe']} | {r['mean_recall']:.3f} | "
            f"{r['avg_candidates']} | {r['candidate_frac']:.4f} |"
        )
    print(json.dumps(rows))

    # ---- IVF cell-count sweep (bigger corpus so 1024 cells make sense)
    n_base = int(os.environ.get("IVF_SWEEP_N", "40000"))
    big = planted_embeddings(
        spark, n_base=n_base, n_queries=100, n_neighbors=5
    ).localCheckpoint(eager=True)
    qids = list(range(100))
    exact = brute_force_topk(big, qids, k=5).select(
        "query_id", F.col("neighbor_id").alias("nid")
    ).localCheckpoint(eager=True)
    n_exact = exact.count()
    ivf_rows = []
    for n_cells, n_probe in ((16, 1), (256, 4), (1024, 16)):
        t0 = time.time()
        cents = kmeans_centroids(big, n_centroids=n_cells, n_iter=3)
        t_kmeans = time.time() - t0
        t0 = time.time()
        assign_cells(big, cents, n_probe=1).count()  # index build stage
        t_assign = time.time() - t0
        t0 = time.time()
        approx = ivf_topk(
            big,
            qids,
            k=5,
            n_centroids=n_cells,
            n_probe=n_probe,
            n_iter=3,
            centroids=cents,  # reuse the timed quantizer: query_sec is
            # the query stage only, not a second index build
        )
        hits = exact.join(
            approx.select("query_id", F.col("neighbor_id").alias("nid")),
            ["query_id", "nid"],
        ).count()
        t_query = time.time() - t0
        ivf_rows.append(
            {
                "n_centroids": n_cells,
                "n_probe": n_probe,
                "recall": round(hits / n_exact, 4),
                "kmeans_sec": round(t_kmeans, 1),
                "assign_sec": round(t_assign, 1),
                "query_sec": round(t_query, 1),
                "candidate_share": round(n_probe / n_cells, 4),
            }
        )
        print(f"ivf {ivf_rows[-1]}", file=sys.stderr)
    print("| n_centroids | n_probe | recall@5 | kmeans s | assign s | cand share |")
    print("|---|---|---|---|---|---|")
    for r in ivf_rows:
        print(
            f"| {r['n_centroids']} | {r['n_probe']} | {r['recall']:.3f} | "
            f"{r['kmeans_sec']} | {r['assign_sec']} | {r['candidate_share']} |"
        )
    print(json.dumps({"ivf_sweep": ivf_rows, "n_base": n_base}))


if __name__ == "__main__":
    main()
