"""SemEval-2018 Task 7 sources (S1 + S2 in SURVEY.md §2.1).

S1 - relations scan: regex-parse ``CLASS(id1,id2[,REVERSE])`` lines into
the normalized relations table; directionality becomes a ``REV_`` prefix
when not ignored (/root/reference/DataProvider.py:66-91).

S2 - corpus scan: per-``<text id=...>`` document extraction of title +
abstract with tag stripping (/root/reference/DataProvider.py:93-119).
The reference uses ElementTree; here the whole-file XML is split into
<text> blocks relationally (the inline ``<entity>`` markup must survive
verbatim for the tagging stage, which rules out a generic XML parser
anyway - the reference strips only title/abstract wrappers, 111,116).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

REL_LINE_RE = r"^([A-Z_-]+)\((.*?),(.*?)(,REVERSE)?\)"


def read_semeval_relations(
    spark: SparkSession, path: str, ignore_directionality: bool = False
) -> DataFrame:
    """-> (doc_id, e1_id, e2_id, rel_class). The doc id is the prefix of
    the entity id before the first dot (DataProvider.py:76-77)."""
    lines = spark.read.text(path).where(F.trim("value") != "")
    cls = F.regexp_extract("value", REL_LINE_RE, 1)
    e1 = F.regexp_extract("value", REL_LINE_RE, 2)
    e2 = F.regexp_extract("value", REL_LINE_RE, 3)
    rev = F.regexp_extract("value", REL_LINE_RE, 4) != ""
    rel = (
        F.when(rev & F.lit(not ignore_directionality), F.concat(F.lit("REV_"), cls))
        .otherwise(cls)
    )
    return lines.select(
        F.regexp_extract(e1, r"^(.*?)\.", 1).alias("doc_id"),
        e1.alias("e1_id"),
        e2.alias("e2_id"),
        rel.alias("rel_class"),
    ).where(F.col("e1_id") != "")


def read_semeval_corpus(
    spark: SparkSession, path: str, append_titles: bool = True
) -> DataFrame:
    """-> (doc_id, text) with <title>/<abstract> wrappers stripped and the
    title prepended when ``append_titles`` (DataProvider.py:103-118)."""
    raw = spark.read.text(path, wholetext=True).select(
        F.explode(
            F.expr(r"regexp_extract_all(value, '(?s)<text id=\"(.*?)\">(.*?)</text>', 0)")
        ).alias("block")
    )
    doc_id = F.regexp_extract("block", r'<text id="(.*?)">', 1)
    title = F.regexp_extract("block", r"(?s)<title>(.*?)</title>", 1)
    abstract = F.regexp_extract("block", r"(?s)<abstract>(.*?)</abstract>", 1)
    text = (
        F.concat_ws(" ", F.trim(title), F.trim(abstract))
        if append_titles
        else F.trim(abstract)
    )
    return raw.select(doc_id.alias("doc_id"), F.trim(text).alias("text"))
