"""Hot-domain skew evidence (round-2 verdict item #9).

Two demonstrations on the synthetic corpus (20% of pages share one hot
domain by construction, sources/synth.py):

1. **salted_repartition**: partition row-count distribution for a
   domain-keyed repartition, unsalted vs salted - the write-path skew
   guard (operators/materialize.py).
2. **AQE skew-join splitting**: a domain-keyed sort-merge join against a
   per-domain dim, with skew thresholds sized to the demo data; the
   executed adaptive plan must mark the join ``skew=true`` and split the
   hot partition.

Prints one JSON line for PLANS.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_PAGES = int(os.environ.get("SKEW_DEMO_PAGES", "200000"))


def pct(counts, q):
    s = sorted(counts)
    return s[min(len(s) - 1, int(q * len(s)))]


def main():
    from pyspark.sql import functions as F

    from semanticrelationextractionpolish_spark.operators.materialize import (
        domain_of,
        partition_counters,
        salted_repartition,
    )
    from semanticrelationextractionpolish_spark.session import get_spark
    from semanticrelationextractionpolish_spark.sources.synth import synth_pages

    spark = get_spark(
        app_name="skew-demo",
        cores=8,
        shuffle_partitions=16,
        extra_conf={
            # size the skew detector to demo data (defaults are 256MB/5x)
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1m",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1m",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
            # force SMJ both at planning time and in AQE re-planning
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    pages, _ = synth_pages(spark, N_PAGES)
    keyed = pages.select("url", "text").withColumn("domain", domain_of(F.col("url")))
    keyed = keyed.localCheckpoint(eager=True)

    out = {"n_pages": N_PAGES}

    # --- 1: write-path repartition, unsalted vs salted ---
    plain = keyed.repartition(16, "domain")
    salted = salted_repartition(keyed, "domain", 16)
    for name, df in (("unsalted", plain), ("salted", salted)):
        counts = [r["rows"] for r in partition_counters(df).collect()]
        out[name] = {
            "max_partition_rows": max(counts),
            "p50_partition_rows": pct(counts, 0.5),
            "n_nonempty": len(counts),
        }

    # --- 2: AQE skew-join splitting on the hot domain ---
    # OptimizeSkewedJoin pattern-matches SMJ(Sort(shuffle), Sort(shuffle))
    # only - the dim must be materialized so no agg sits between its Sort
    # and its shuffle; and the downstream agg must NOT require the join's
    # hash partitioning (a global partial-agg is distribution-free),
    # otherwise AQE skips the split as it would introduce a shuffle
    dim = keyed.groupBy("domain").agg(
        F.count(F.lit(1)).alias("domain_pages")
    ).localCheckpoint(eager=True)
    joined = keyed.join(dim, "domain").agg(
        F.sum(F.length("text") + F.col("domain_pages")).alias("x")
    )
    t0 = time.time()
    joined.collect()
    out["skew_join_sec"] = round(time.time() - t0, 2)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    out["aqe_skew_marked"] = "skew=true" in plan
    out["skew_plan_lines"] = [
        l.strip()[:120]
        for l in plan.splitlines()
        if "skew=true" in l or "skewed" in l
    ][:3]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
