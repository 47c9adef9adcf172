"""ANN recall-vs-n_planes sweep on the planted near-neighbor fixture.

Prints the markdown table recorded in BENCH/BASELINE.md (round-2 verdict
item #8: make the bucket-count tradeoff a measured knob).
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    from semanticrelationextractionpolish_spark.operators.similarity import (
        ann_recall_sweep,
        planted_embeddings,
    )
    from semanticrelationextractionpolish_spark.session import get_spark

    spark = get_spark(app_name="ann-sweep", cores=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    emb = planted_embeddings(spark, n_base=2000, n_queries=100, n_neighbors=5)
    emb = emb.localCheckpoint(eager=True)
    rows = ann_recall_sweep(emb, query_ids=list(range(100)), k=5)
    print("| n_planes | mean recall@5 | avg candidates | candidate frac |")
    print("|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['n_planes']} | {r['mean_recall']:.3f} | "
            f"{r['avg_candidates']} | {r['candidate_frac']:.4f} |"
        )
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
