"""Single scaling-run job for the DEDUP/LINKING family (round-4 verdict
#5: the three scaling campaigns measured the shuffle-free extraction
chain only; the 100 TB story leans hardest on exactly the shuffling
operators - MinHash banding, SimHash banding, LSH + connected
components - so their N vs 4N efficiency needs its own paired-rep
evidence).

Synthesizes ``n_docs`` deterministic documents with planted near-dup
pairs entirely via Column algebra (md5-derived token streams; every
5th id pair shares a base text, the odd member differing by one
token), plus one mention per doc whose lemma carries the same planted
pairing - so each stage has real positive work, not just hashing.

Per-stage timings, each materialized through count():

* minhash_sec - ``minhash_near_dup_pairs`` (band explode + capped
  bucket join + shingle join-back verification);
* simhash_sec - ``simhash_near_dup_pairs`` (JVM token hashing + numpy
  vote/pack + the round-5 capped band join);
* ngram_sec   - ``ngram_jaccard_pairs`` (inverted index + df-cap +
  doc-length-banded self-join; round-5 verdict #4);
* link_sec    - ``canonicalize`` (LSH blocking + star-contraction CC).

Launched via spark-submit; master/cores come from the command line,
mirroring tools/scaling_job.py. Prints one JSON line.

    spark-submit --master local-cluster[4,2,8192] --py-files semrex.zip \
        tools/scaling_dedup_job.py <n_docs> [stages_csv]

``stages_csv`` (default all four): any of minhash,simhash,ngram,link -
lets a campaign target one stage's open question at a volume where the
others would dominate wall-clock (the round-6 4M-doc minhash/simhash
pairs: link at 4M costs ~18 min per N arm and already has its own
1M-doc campaign evidence).
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import SparkSession


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    stages = set(
        (sys.argv[2] if len(sys.argv) > 2 else "minhash,simhash,ngram,link").split(",")
    )
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

    from pyspark.sql import functions as F

    from semanticrelationextractionpolish_spark.operators.dedup import (
        minhash_near_dup_pairs,
        ngram_jaccard_pairs,
        simhash_near_dup_pairs,
    )
    from semanticrelationextractionpolish_spark.operators.linking import (
        canonicalize,
    )

    # --- deterministic corpus, pure Column algebra ---------------------
    ids = spark.range(n_docs, numPartitions=4 * cores)
    group = (F.col("id") / 2).cast("long")
    planted = (group % 5 == 0) & (F.col("id") % 2 == 1)
    base_id = F.when(planted, group * 2).otherwise(F.col("id"))
    # 24 tokens from two md5 streams of the BASE id; the planted odd
    # member appends one extra token -> shingle overlap ~0.92
    tok_src = F.concat(
        F.md5(base_id.cast("string")), F.md5(F.concat(base_id, F.lit("x")))
    )
    toks = F.transform(
        F.sequence(F.lit(0), F.lit(23)),
        lambda i: F.substring(tok_src, i * 2 + 1, 5),
    )
    docs = ids.select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.when(
                planted, F.concat(F.array_join(toks, " "), F.lit(" zz"))
            ).otherwise(F.array_join(toks, " ")),
        ).alias("text"),
    ).localCheckpoint(eager=True)
    n_actual = docs.count()

    timings = {}
    n_mh = n_sh = n_ng = n_lemmas = None
    if "minhash" in stages:
        t0 = time.time()
        n_mh = minhash_near_dup_pairs(docs, jaccard=0.85).count()
        timings["minhash_sec"] = round(time.time() - t0, 3)
    if "simhash" in stages:
        t0 = time.time()
        n_sh = simhash_near_dup_pairs(docs, max_hamming=6).count()
        timings["simhash_sec"] = round(time.time() - t0, 3)
    # round-5 verdict #4: n-gram Jaccard was the one dedup operator with
    # no at-scale evidence. Planted pairs share 22 of 23 word trigrams
    # (jaccard ~0.956), so threshold 0.9 keeps exactly the planted set.
    if "ngram" in stages:
        t0 = time.time()
        n_ng = ngram_jaccard_pairs(docs, threshold=0.9).count()
        timings["ngram_sec"] = round(time.time() - t0, 3)

    # --- linking: one mention per doc, lemma = md5(base)(+suffix) ------
    mentions = None if "link" not in stages else ids.select(
        F.concat(F.lit("https://p/"), F.col("id")).alias("url"),
        F.lit(0).alias("sent_idx"),
        F.lit("e1").alias("entity_id"),
        F.lit("city_nam").alias("entity_class"),
        F.lit(0).alias("beg"),
        F.lit(1).alias("end"),
        F.md5(base_id.cast("string")).alias("surface"),
        F.when(
            planted, F.concat(F.md5(base_id.cast("string")), F.lit("a"))
        ).otherwise(F.md5(base_id.cast("string"))).alias("lemma"),
    )
    if mentions is not None:
        mentions = mentions.localCheckpoint(eager=True)
        mentions.count()
        t0 = time.time()
        assigns, _nodes = canonicalize(mentions)
        n_lemmas = assigns.count()
        timings["link_sec"] = round(time.time() - t0, 3)

    print(
        json.dumps(
            {
                "cores": cores,
                "n_docs": n_actual,
                "minhash_pairs": n_mh,
                "simhash_pairs": n_sh,
                "ngram_pairs": n_ng,
                "n_lemmas": n_lemmas,
                **timings,
                "total_sec": round(sum(timings.values()), 3),
            }
        )
    )


if __name__ == "__main__":
    main()
