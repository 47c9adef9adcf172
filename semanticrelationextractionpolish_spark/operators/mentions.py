"""Mention table derivation - pure DataFrame ops, zero Python.

The reference never materializes a mention table (mentions live as
parallel label arrays); the linking stage needs one. Derived relationally
so it stays inside whole-stage codegen:

    posexplode(zip(entities, entity_ids, tokens))
      -> filter mention tokens
      -> groupBy (url, sent_idx, entity_id): span extent = min/max pos
         (the reference's list.index / max-idx scan, readers.py:341-343)
      -> surface = detokenized slice, lemma = rule-based normalizer

The groupBy shuffles on (url, sent_idx, entity_id) with map-side partial
aggregation; at 100 TB this is the first (and a cheap, high-cardinality,
well-spread) shuffle of the pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.lemmatize import lemma_col
from ..functions.tokenizer import WORD_MARKER


def detok_col(tokens_col):
    """JVM-side detokenizer mirroring DeterministicTokenizer.detokenize:
    '▁'-prefixed pieces start a new space-separated word."""
    joined = F.array_join(tokens_col, "")
    spaced = F.regexp_replace(joined, WORD_MARKER, " ")
    return F.trim(spaced)


def mentions_from_sentences(sentences: DataFrame) -> DataFrame:
    # Shuffle hygiene: only mention tokens survive the explode (the filter
    # runs map-side before the groupBy exchange), and each row carries its
    # OWN token string - never the whole sentence array. The mention's
    # surface is reassembled from the collected (pos, token) pieces.
    exploded = (
        sentences.select(
            "url",
            "sent_idx",
            F.posexplode(
                F.arrays_zip("entities", "entity_ids", "tokens")
            ).alias("pos", "z"),
        )
        .where(F.col("z.entity_ids").isNotNull())
        .select(
            "url",
            "sent_idx",
            "pos",
            F.col("z.tokens").alias("token"),
            F.col("z.entity_ids").alias("entity_id"),
            F.regexp_replace(F.col("z.entities"), "^[BI]-", "").alias("entity_class"),
        )
    )
    spans = exploded.groupBy("url", "sent_idx", "entity_id").agg(
        F.first("entity_class").alias("entity_class"),
        F.min("pos").alias("beg"),
        F.max("pos").alias("end"),
        F.array_sort(F.collect_list(F.struct("pos", "token"))).alias("pieces"),
    )
    surface = detok_col(F.transform("pieces", lambda p: p["token"]))
    return spans.select(
        "url",
        "sent_idx",
        "entity_id",
        "entity_class",
        "beg",
        "end",
        surface.alias("surface"),
        lemma_col(surface).alias("lemma"),
    )
