"""Shuffle-bandwidth control (round-5 verdict #1): the analog of the
extraction phase's CPU-burn control, for the SHUFFLE path. The dedup/
linking family's N->4N efficiency runs below the extraction chain's;
the claimed cause is the shared-box ceiling (all "executor" JVMs share
one memory bus and one tmpfs spark.local.dir), not the operator plans.
This job isolates that: a plan with NO operator logic at all - generate
deterministic skinny rows, hash-repartition them (one full shuffle
write+read of a known byte volume), count - run at N vs 4N. Its
efficiency is the ceiling ANY shuffle-bound plan can reach on this VM;
operator efficiencies at/near this ceiling are host-attributed, gaps
below it are plan-attributed.

Row shape mirrors the band rows the dedup family shuffles: (long key,
long key2, ~40-byte string payload). Two volumes by default (the
second ~the byte volume of the 1M-doc campaign's biggest shuffle).

Usage:
  spark-submit --master local-cluster[4,2,8192] --py-files semrex.zip \
      tools/shuffle_bandwidth_job.py <n_rows>
Prints one JSON line: {"cores": C, "n_rows": N, "shuffle_sec": S,
"rows_per_sec": R}.
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main():
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
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
    shuf = int(spark.conf.get("spark.sql.shuffle.partitions"))

    rows = (
        spark.range(n_rows, numPartitions=4 * cores)
        .select(
            F.xxhash64("id").alias("k1"),
            F.pmod(F.xxhash64("id", "id"), F.lit(99991)).alias("k2"),
            F.md5(F.col("id").cast("string")).alias("payload"),
        )
        .localCheckpoint(eager=True)  # timing excludes generation
    )
    t0 = time.time()
    n = rows.repartition(shuf, "k1", "k2").count()
    shuffle_sec = time.time() - t0
    print(
        json.dumps(
            {
                "cores": cores,
                "n_rows": n,
                "shuffle_sec": round(shuffle_sec, 3),
                "rows_per_sec": round(n / shuffle_sec, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
