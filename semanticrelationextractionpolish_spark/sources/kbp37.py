"""KBP-37 line-format reader (S6 in SURVEY.md §2.1).

The reference reads records of two consecutive lines - ``"id<TAB>text"``
then the relation line - in a serial Python loop
(/root/reference/DataProvider.py:360-389). Spark restatement: read lines
with stable ordering metadata, pair consecutive lines with a window, and
normalize the relation (X6, readers.py:677-689) - all DataFrame ops; the
per-sentence marker tokenization (U4) then runs in the standard pairs
kernel.

Sharding (round-2): lines come from ``sources.lines`` with true byte
offsets, so a record's two lines pair by "nearest preceding sentence
line" - computed as a BUCKETED equi-join (sentence lines replicated
into their own and the next ``bucket_bytes`` bucket, then ``max_by``
per relation line), never a per-file window. Every stage shards across
file splits; the only bound is that one record must be shorter than
``bucket_bytes`` (1 MiB default - a 1 MiB *sentence* is corrupt input).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .lines import DEFAULT_BUCKET_BYTES, bucket, lines_with_offsets


def read_kbp37(
    spark: SparkSession,
    path: str,
    ignore_directionality: bool = False,
    bucket_bytes: int = DEFAULT_BUCKET_BYTES,
) -> DataFrame:
    """-> (doc_id string, text string, relation string, is_reversed bool)

    Record layout (reference docstring, DataProvider.py:360-389):
        line 2k:   ``<id>\\t<sentence with <e1>/<e2> markers>``
        line 2k+1: ``<relation>(e1,e2)`` / ``no_relation``
    Blank separator lines are tolerated.
    """
    lines = lines_with_offsets(spark, path).where(F.trim(F.col("value")) != "")
    is_sent = F.col("value").rlike("^[^\t]+\t")
    sents = lines.where(is_sent).select(
        "file",
        F.col("off").alias("s_off"),
        F.split(F.col("value"), "\t").getItem(0).alias("doc_id"),
        F.split(F.col("value"), "\t").getItem(1).alias("text"),
    )
    rels = lines.where(~is_sent).select(
        "file", F.col("off").alias("r_off"), F.trim(F.col("value")).alias("raw_rel")
    )
    # boundary-repaired candidate join: a sentence is visible from its
    # own bucket and the next, so the relation line one line below it
    # always finds it regardless of which split boundary fell between
    s_rep = sents.withColumn(
        "bkt",
        F.explode(
            F.array(bucket(F.col("s_off"), bucket_bytes), bucket(F.col("s_off"), bucket_bytes) + 1)
        ),
    )
    r_b = rels.withColumn("bkt", bucket(F.col("r_off"), bucket_bytes))
    joined = (
        r_b.join(s_rep, ["file", "bkt"])
        .where(F.col("s_off") < F.col("r_off"))
        .groupBy("file", "r_off", "raw_rel")
        .agg(F.max_by(F.struct("doc_id", "text"), F.col("s_off")).alias("s"))
        .select("file", F.col("s.doc_id").alias("doc_id"), F.col("s.text").alias("text"), "raw_rel")
    )
    raw = F.col("raw_rel")
    rel = (
        F.when(raw == "no_relation", F.lit("NO_RELATION"))
        .when(raw.contains("(e1,e2)"), F.regexp_replace(raw, r"\(e1,e2\)", ""))
        .when(
            raw.contains("(e2,e1)"),
            F.concat(F.regexp_replace(raw, r"\(e2,e1\)", ""), F.lit("_rev"))
            if not ignore_directionality
            else F.regexp_replace(raw, r"\(e2,e1\)", ""),
        )
        .otherwise(F.lit(None))  # malformed -> quarantine (F7)
    )
    is_rev = raw.contains("(e2,e1)") & F.lit(not ignore_directionality)
    return joined.select(
        "doc_id",
        # strip the reference's quoted-sentence convention if present
        F.regexp_replace(F.col("text"), r'^"|"$', "").alias("text"),
        rel.alias("relation"),
        is_rev.alias("is_reversed"),
    )


def kbp37_quarantine(df: DataFrame) -> DataFrame:
    """Rows whose relation line was malformed (MalformedRelationException
    path, readers.py:688) - routed to a side table instead of raising."""
    return df.where(F.col("relation").isNull())
