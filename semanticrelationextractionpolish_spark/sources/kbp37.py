"""KBP-37 line-format reader (S6 in SURVEY.md §2.1).

The reference reads records of two consecutive lines - ``"id<TAB>text"``
then the relation line - in a serial Python loop
(/root/reference/DataProvider.py:360-389). Spark restatement: read lines
with stable ordering metadata, pair consecutive lines with a window, and
normalize the relation (X6, readers.py:677-689) - all DataFrame ops; the
per-sentence marker tokenization (U4) then runs in the standard pairs
kernel.

KBP37 files are single blobs per split, so ordering within the file is
the record order; we recover it from a zipWithIndex-free construct:
``input_file_name`` + a monotonic line number via window over the
file-order column Spark's text source preserves per-partition. For
multi-GB line files this reader shards per file-split and keeps pairing
local to a partition (records never straddle splits in practice because
the driver re-pairs with a window keyed on line index).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def read_kbp37(
    spark: SparkSession, path: str, ignore_directionality: bool = False
) -> DataFrame:
    """-> (doc_id string, text string, relation string, is_reversed bool)

    Record layout (reference docstring, DataProvider.py:360-389):
        line 2k:   ``<id>\\t<sentence with <e1>/<e2> markers>``
        line 2k+1: ``<relation>(e1,e2)`` / ``no_relation``
    Blank separator lines are tolerated.
    """
    lines = (
        spark.read.text(path)
        .withColumn("file", F.input_file_name())
        .withColumn("line_no", F.monotonically_increasing_id())
        .where(F.trim(F.col("value")) != "")
    )
    w = Window.partitionBy("file").orderBy("line_no")
    numbered = lines.withColumn("rec_line", F.row_number().over(w) - 1)
    sent_lines = numbered.where(F.col("rec_line") % 2 == 0).select(
        (F.col("rec_line") / 2).cast("long").alias("rec"),
        "file",
        F.split(F.col("value"), "\t").getItem(0).alias("doc_id"),
        F.split(F.col("value"), "\t").getItem(1).alias("text"),
    )
    rel_lines = numbered.where(F.col("rec_line") % 2 == 1).select(
        (F.col("rec_line") / 2).cast("long").alias("rec"),
        "file",
        F.trim(F.col("value")).alias("raw_rel"),
    )
    joined = sent_lines.join(rel_lines, ["file", "rec"])
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
