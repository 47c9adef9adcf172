"""Assignments-bucket rewrite-cost probe (round-5 verdict #3): with a
bucket count sized to the corpus (``pick_assign_buckets``), the bytes a
batch rewrites must follow the CHANGE SET, not the table size.

Isolates the state layer (``VersionedState.replace_buckets``) from the
LSH merge so the probe runs at 10M+ rows in minutes: build an
assignments table of ``n`` rows, commit it (the one full write every
bucketing pays), then apply a small change set (``n_changed`` keys) and
measure the bytes the rewrite produced (file sizes under the new
segment dirs) and the bucket count it touched. Repeat with an empty
change set: 0 buckets, 0 bytes.

Reported per size: table bytes, per-bucket bytes, changed keys, touched
buckets, rewrite bytes, rewrite_fraction (rewrite/table). O(changed)
evidence = rewrite_fraction tracking touched_buckets/n_buckets (each
touched bucket rewrites ~1/n_buckets of the table) while the ABSOLUTE
per-bucket rewrite stays ~flat as n grows 10x with the scaled count -
vs the fixed-32 counterfactual, where per-bucket bytes grow linearly.

Usage: python tools/probe_assign_buckets.py [sizes_csv] [n_changed]
  default sizes 1000000,10000000; n_changed 10000
Prints one JSON line for BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def du(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main():
    sizes = [
        int(s)
        for s in (sys.argv[1] if len(sys.argv) > 1 else "1000000,10000000").split(",")
    ]
    n_changed = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from semanticrelationextractionpolish_spark.session import get_spark
    from semanticrelationextractionpolish_spark.streaming.linking import (
        pick_assign_buckets,
    )
    from semanticrelationextractionpolish_spark.streaming.state import (
        VersionedState,
    )

    spark = get_spark("probe-assign-buckets", cores=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    results = []
    for n in sizes:
        nb = pick_assign_buckets(n)
        base = f"/dev/shm/probe_assign_{n}"
        shutil.rmtree(base, ignore_errors=True)
        store = VersionedState(spark, base)
        # assignments-shaped table: lemma = md5(id), canonical = lemma
        assigns = (
            spark.range(n)
            .select(F.md5(F.col("id").cast("string")).alias("lemma"))
            .withColumn("canonical", F.col("lemma"))
            .withColumn("node_id", F.xxhash64("canonical"))
            .select("lemma", "node_id", "canonical")
        )
        all_keys = assigns.select("lemma")
        t0 = time.time()
        store.replace_buckets("assignments", assigns, all_keys, "lemma", nb)
        store.commit()
        build_sec = round(time.time() - t0, 3)
        table_bytes = du(os.path.join(base, "assignments"))
        segs_before = {s["path"] for s in store.segments("assignments")}

        # small change set: relabel n_changed keys (recompute contract:
        # unchanged rows reproduced bit-for-bit, which trivially holds
        # here since only changed rows differ)
        changed = (
            spark.range(n_changed)
            .select((F.col("id") * (n // n_changed)).alias("id"))
            .select(F.md5(F.col("id").cast("string")).alias("lemma"))
        )
        updated = assigns.join(changed.withColumn("hit", F.lit(1)), "lemma", "left").select(
            "lemma",
            F.when(
                F.col("hit").isNotNull(), F.xxhash64(F.concat(F.col("canonical"), F.lit("!")))
            )
            .otherwise(F.col("node_id"))
            .alias("node_id"),
            "canonical",
        )
        t0 = time.time()
        store2 = VersionedState(spark, base)
        store2.replace_buckets("assignments", updated, changed, "lemma", nb)
        store2.commit()
        rewrite_sec = round(time.time() - t0, 3)
        segs_after = store2.segments("assignments")
        new_segs = [s for s in segs_after if s["path"] not in segs_before]
        rewrite_bytes = sum(du(os.path.join(base, s["path"])) for s in new_segs)

        # empty change set: must rewrite nothing
        store3 = VersionedState(spark, base)
        store3.replace_buckets(
            "assignments", updated, changed.limit(0), "lemma", nb
        )
        store3.commit()
        paths3 = {s["path"] for s in store3.segments("assignments")}
        zero_rewrite = paths3 == {s["path"] for s in segs_after}

        results.append(
            {
                "n_rows": n,
                "n_buckets": nb,
                "table_mb": round(table_bytes / 1e6, 1),
                "per_bucket_mb": round(table_bytes / nb / 1e6, 3),
                "n_changed": n_changed,
                "touched_buckets": len(new_segs),
                "rewrite_mb": round(rewrite_bytes / 1e6, 1),
                "rewrite_fraction": round(rewrite_bytes / table_bytes, 4),
                "expected_fraction_at_cap": round(
                    min(n_changed, nb) / nb, 4
                ),
                "build_sec": build_sec,
                "rewrite_sec": rewrite_sec,
                "empty_changeset_rewrites_zero": zero_rewrite,
            }
        )
        shutil.rmtree(base, ignore_errors=True)
        print(json.dumps(results[-1]), file=sys.stderr)

    print(json.dumps({"metric": "assign_bucket_rewrite", "results": results}))


if __name__ == "__main__":
    main()
