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
    exploded = (
        sentences.select(
            "url",
            "sent_idx",
            "tokens",
            F.posexplode(F.arrays_zip("entities", "entity_ids")).alias("pos", "z"),
        )
        .where(F.col("z.entity_ids").isNotNull())
        .select(
            "url",
            "sent_idx",
            "tokens",
            "pos",
            F.col("z.entity_ids").alias("entity_id"),
            F.regexp_replace(F.col("z.entities"), "^[BI]-", "").alias("entity_class"),
        )
    )
    spans = exploded.groupBy("url", "sent_idx", "entity_id").agg(
        F.first("entity_class").alias("entity_class"),
        F.min("pos").alias("beg"),
        F.max("pos").alias("end"),
        F.first("tokens").alias("tokens"),
    )
    surface = detok_col(
        F.slice(F.col("tokens"), F.col("beg") + 1, F.col("end") - F.col("beg") + 1)
    )
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
