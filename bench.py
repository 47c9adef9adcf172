"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Every query is executed to completion through the noop sink (no driver
collect, no column-pruning shortcuts), so timings reflect the full
distributed plan. The flagship metric is KG-construction throughput
(triples/sec) over the synthetic page corpus sized to the sf dir.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_PAGES = {"sf0.001": 500, "sf0.01": 5000, "sf0.1": 50000}

BENCH_QUERIES = [
    "broadcast_dim_join",
    "pair_selfjoin_capped",
    "sessionize",
    "quality_score",
    "exact_dedup",
    "ngram_jaccard_dedup",
    "minhash_neardup",
    "simhash_neardup",
    "cosine_topk",
    "ann_topk",
    "kg_sentence_counts",
]


def run_to_sink(df) -> int:
    df.write.format("noop").mode("overwrite").save()
    return 0


def main():
    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from semanticrelationextractionpolish_spark.plans.pipeline import build_kg
    from semanticrelationextractionpolish_spark.session import get_spark
    from semanticrelationextractionpolish_spark.sources.synth import synth_pages

    sf_tag = os.path.basename(os.path.normpath(SF_DIR))
    spark = get_spark(
        app_name="semrex-bench", cores=CPUS, shuffle_partitions=2 * CPUS
    )
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    qs = entrymod.queries()
    for name in BENCH_QUERIES:
        t0 = time.time()
        run_to_sink(qs[name](spark, SF_DIR))
        timings[name] = round(time.time() - t0, 3)

    # flagship: full KG construction, triples/sec
    n_pages = N_PAGES.get(sf_tag, 50000)
    pages, rels = synth_pages(spark, n_pages)
    pages = pages.persist()
    rels = rels.persist()
    pages.count()
    rels.count()
    t0 = time.time()
    stages = build_kg(spark, pages, rels, link=False)
    n_triples = stages["triples"].count()
    kg_sec = time.time() - t0
    timings["kg_pipeline"] = round(kg_sec, 3)
    from semanticrelationextractionpolish_spark.plans.pipeline import link_kg

    t0 = time.time()
    link_kg(stages)
    run_to_sink(stages["nodes"])
    run_to_sink(stages["edges"])
    timings["kg_linking"] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_tag,
                "cpus": CPUS,
                "n_pages": n_pages,
                "n_triples": n_triples,
                "triples_per_sec": round(n_triples / kg_sec, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
