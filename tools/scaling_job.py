"""Single scaling-run job: full KG construction at a given parallelism.

Launched via spark-submit (the north rule's launch path); master/cores
come from the spark-submit command line. Prints one JSON line.

    spark-submit --master local[8] --py-files semrex.zip \
        tools/scaling_job.py <n_pages>
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import SparkSession


def main():
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 50000
    spark = SparkSession.builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    cores = spark.sparkContext.defaultParallelism

    from semanticrelationextractionpolish_spark.plans.pipeline import build_kg
    from semanticrelationextractionpolish_spark.sources.synth import synth_pages

    pages, rels = synth_pages(spark, n_pages, partitions=4 * cores)
    pages = pages.persist()
    rels = rels.persist()
    pages.count()
    rels.count()

    t0 = time.time()
    stages = build_kg(spark, pages, rels)
    n_triples = stages["triples"].count()
    stages["nodes"].write.format("noop").mode("overwrite").save()
    stages["edges"].write.format("noop").mode("overwrite").save()
    elapsed = time.time() - t0
    print(
        json.dumps(
            {
                "cores": cores,
                "n_pages": n_pages,
                "n_triples": n_triples,
                "sec": round(elapsed, 3),
                "triples_per_sec": round(n_triples / elapsed, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
