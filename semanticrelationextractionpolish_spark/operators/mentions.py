"""Mention table derivation - pure DataFrame ops, zero Python.

The reference never materializes a mention table (mentions live as
parallel label arrays); the linking stage needs one. Derived relationally
so it stays inside whole-stage codegen.

Round-7 plan: ZERO-shuffle derivation. The entities/entity_ids/tokens
arrays are parallel arrays WITHIN each sentence row, so every mention's
span extent, class, surface and lemma are computable per row with array
higher-order functions - the previous posexplode -> groupBy(url,
sent_idx, entity_id) -> collect_list(struct) plan shuffled ~0.5M skinny
rows and rebuilt with an ObjectHashAggregate exactly the grouping the
input row already had (measured at 50k pages: 14.0 s first run / 0.9 s
warm for the explode+groupBy plan vs 0.6 s / 0.3 s for this one, output
row-set identical via exceptAll both ways). At 100 TB the difference is
a full shuffle of the mention universe vs an embarrassingly parallel
map over the sentence scan.

Semantics notes vs the old groupBy plan:

* pieces arrive in position order (the old plan array_sorted the
  collected (pos, token) structs - same order);
* entity_class comes from the mention's FIRST position (the old plan's
  ``F.first`` picked an arbitrary arriving row; IOB classes are
  constant within a mention, so the value is the same - this form is
  additionally deterministic by construction);
* a repeated entity_id with non-contiguous positions still yields ONE
  mention spanning min..max position, exactly like the groupBy;
* DUPLICATE (url, sent_idx) input rows (e.g. an un-deduped re-crawl
  feeding the same url twice) now yield one mention row per sentence
  row, where the old groupBy would have merged the two crawls' token
  positions into a single garbage span. Every in-engine source emits
  unique (url, sent_idx), so pipeline output is unchanged; for
  duplicated inputs the per-row behavior is the defensible one (and
  matches the per-annotation oracle counts).
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
    ids = F.col("entity_ids")
    n = F.size(ids)
    uniq = F.array_distinct(F.filter(ids, lambda x: x.isNotNull()))

    def mk(eid):
        positions = F.filter(
            F.sequence(F.lit(0), n - 1),
            lambda i: F.element_at(ids, i + 1) == eid,
        )
        pieces = F.transform(
            positions, lambda i: F.element_at(F.col("tokens"), i + 1)
        )
        cls = F.regexp_replace(
            F.element_at(F.col("entities"), F.element_at(positions, 1) + 1),
            "^[BI]-",
            "",
        )
        return F.struct(
            eid.alias("entity_id"),
            cls.alias("entity_class"),
            F.array_min(positions).alias("beg"),
            F.array_max(positions).alias("end"),
            detok_col(pieces).alias("surface"),
        )

    return (
        sentences.select("url", "sent_idx", F.explode(F.transform(uniq, mk)).alias("m"))
        .select(
            "url",
            "sent_idx",
            F.col("m.entity_id").alias("entity_id"),
            F.col("m.entity_class").alias("entity_class"),
            F.col("m.beg").alias("beg"),
            F.col("m.end").alias("end"),
            F.col("m.surface").alias("surface"),
            lemma_col(F.col("m.surface")).alias("lemma"),
        )
    )
