"""Incremental (streaming) entity canonicalization.

Engine addition beyond the reference (which is batch-only): continuous
ingestion keeps a persistent canonical-node state that each micro-batch
of NEW mentions merges into - without re-blocking the whole lemma
universe per batch.

Per batch (``foreachBatch`` over a mentions stream):

1. aggregate the batch to (lemma, n_mentions, surfaces) and MERGE into
   the lemma state (entity-scale, orders of magnitude smaller than the
   corpus; in production this merge and every state write below is an
   Iceberg MERGE INTO / snapshot commit - parquet overwrite after an
   eager materialization stands in, same discipline as
   ``operators/materialize.write_graph``);
2. compute MinHash signatures/band rows for the NEW lemmas ONLY and
   probe them against the accumulated band-row index - an incremental
   index probe costing ~new_lemmas x bucket occupancy, not the full
   O(n) re-blocking of batch ``lsh_candidate_pairs``;
3. Jaccard-verify candidates against the shingle state, append the
   surviving edges to the edge state (graph-scale);
4. re-run star-contraction ``connected_components`` on the accumulated
   edge set and rewrite the assignments table.

Correctness contract (tested): after the stream drains, the
assignments equal batch ``canonicalize()`` over all mentions at once.
One documented divergence: the ``MAX_BUCKET`` skew cap applies to
bucket sizes AS SEEN AT PROBE TIME, so a bucket that only exceeds the
cap in a later batch keeps its earlier edges (batch mode would drop
the whole bucket); equivalence is exact while buckets stay under the
cap.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.linking import (
    DEFAULT_JACCARD,
    MAX_BUCKET,
    _band_rows,
    connected_components,
    shingle_table,
)


def _read_state(spark: SparkSession, path: str, schema: str) -> DataFrame:
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return spark.read.parquet(path)
    return spark.createDataFrame([], schema)


def _overwrite(df: DataFrame, path: str) -> DataFrame:
    # eager materialization BEFORE overwriting a path that fed the plan
    # (Spark cannot overwrite an input it is still lazily reading)
    df = df.localCheckpoint(eager=True)
    df.write.mode("overwrite").parquet(path)
    return df


def merge_mentions_batch(
    spark: SparkSession,
    batch_mentions: DataFrame,
    state_dir: str,
    jaccard: float = DEFAULT_JACCARD,
    batch_id: int = 0,
) -> DataFrame:
    """One incremental merge step; returns the rewritten assignments
    (lemma, node_id, canonical). Usable directly for batch-incremental
    jobs and via ``incremental_canonicalize`` for streams.

    Replay-idempotent (foreachBatch may re-deliver a batch after a
    failure): the lemma state is keyed by ``batch_id`` and the batch's
    rows are replaced, not re-added, so counts never double; edges are
    written BEFORE the signature state, so a crash between the two
    leaves the batch's lemmas "unseen" and the replay recomputes the
    same edges (dropDuplicates makes the re-append a no-op)."""
    lemmas_path = os.path.join(state_dir, "lemmas")
    sigs_path = os.path.join(state_dir, "sigs")
    edges_path = os.path.join(state_dir, "edges")
    assign_path = os.path.join(state_dir, "assignments")

    batch_agg = batch_mentions.groupBy("lemma").agg(
        F.count(F.lit(1)).alias("n_mentions"),
        F.collect_set("surface").alias("surfaces"),
    )
    old_lemmas = _read_state(
        spark, lemmas_path,
        "batch_id long, lemma string, n_mentions long, surfaces array<string>",
    )
    lemma_state = old_lemmas.where(F.col("batch_id") != batch_id).unionByName(
        batch_agg.withColumn("batch_id", F.lit(batch_id).cast("long"))
    )
    merged = lemma_state.groupBy("lemma").agg(
        F.sum("n_mentions").alias("n_mentions"),
        F.array_distinct(F.flatten(F.collect_list("surfaces"))).alias("surfaces"),
    )

    # signatures/bands for lemmas the state has never seen
    old_sigs = _read_state(
        spark, sigs_path,
        "lemma string, shingles array<string>, sigs array<int>",
    )
    new_lemmas = batch_agg.select("lemma").join(
        old_sigs.select("lemma"), "lemma", "left_anti"
    )
    # distinct checkpoint name per batch: the durable-barrier mode must
    # never resume a PREVIOUS batch's signature table for this one
    new_sigs = shingle_table(new_lemmas, "lemma", ckpt_name=f"inc_sigs_b{batch_id}")
    all_sigs = old_sigs.unionByName(new_sigs).localCheckpoint(eager=True)

    # incremental LSH probe: NEW band rows vs the full band index
    # (recomputing band rows from the sig state is a cheap codegen map
    # over graph-scale rows; at larger scale the band index itself is a
    # stored state table appended per batch)
    new_bands = _band_rows(new_sigs, "lemma")
    all_bands = _band_rows(all_sigs, "lemma").localCheckpoint(eager=True)
    sizes = all_bands.groupBy("band_idx", "band_hash").agg(
        F.count(F.lit(1)).alias("bsz")
    )
    probe = new_bands.join(
        sizes.where(F.col("bsz") <= MAX_BUCKET), ["band_idx", "band_hash"]
    )
    cand = (
        probe.select("band_idx", "band_hash", F.col("lemma").alias("x"))
        .join(
            all_bands.select("band_idx", "band_hash", F.col("lemma").alias("y")),
            ["band_idx", "band_hash"],
        )
        .where(F.col("x") != F.col("y"))
        .select(
            F.least("x", "y").alias("a"), F.greatest("x", "y").alias("b")
        )
        .dropDuplicates(["a", "b"])
    )
    sh = all_sigs.select("lemma", "shingles")
    cand = cand.join(
        sh.select(F.col("lemma").alias("a"), F.col("shingles").alias("sh_a")), "a"
    ).join(sh.select(F.col("lemma").alias("b"), F.col("shingles").alias("sh_b")), "b")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    new_edges = (
        cand.where(inter / F.greatest(union, F.lit(1)) >= F.lit(jaccard))
        .select("a", "b")
    )

    old_edges = _read_state(spark, edges_path, "a string, b string")
    edges = old_edges.unionByName(new_edges).dropDuplicates(["a", "b"])

    # persist state (merge-into in production; see module docstring).
    # merged materializes BEFORE the lemma path it lazily reads is
    # overwritten; edges BEFORE sigs for crash-safety (docstring).
    merged = merged.localCheckpoint(eager=True)
    _overwrite(lemma_state, lemmas_path)
    edges = _overwrite(edges, edges_path)
    _overwrite(all_sigs, sigs_path)

    comp = connected_components(edges, "a", "b", ckpt_scope=f"inc_cc_b{batch_id}")
    assignments = (
        merged.select("lemma")
        .join(comp.withColumnRenamed("id", "lemma"), "lemma", "left")
        .withColumn("comp", F.coalesce("comp", "lemma"))
    )
    canon = assignments.groupBy("comp").agg(F.min("lemma").alias("canonical"))
    assignments = assignments.join(canon, "comp").select(
        "lemma", F.xxhash64("canonical").alias("node_id"), "canonical"
    )
    return _overwrite(assignments, assign_path)


def incremental_canonicalize(
    spark: SparkSession,
    mentions_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    jaccard: float = DEFAULT_JACCARD,
    available_now: bool = True,
):
    """foreachBatch driver for the merge step. Returns the started
    StreamingQuery; exactly-once batch replay is the streaming
    checkpoint's job, and the state writes are idempotent under replay
    (re-merging the same batch reproduces the same state)."""

    def process_batch(batch_df: DataFrame, batch_id: int):
        if batch_df.isEmpty():
            return
        merge_mentions_batch(spark, batch_df, state_dir, jaccard, batch_id=batch_id)

    writer = mentions_stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
