"""HTML -> text extraction (batched, byte-identical per url).

The driver invariant (BASELINE.json input_hint) demands byte-identical
extracted text per url. The extractor is a vectorized pandas UDF: decode
utf-8, take the ``<article>..</article>`` payload when present (the
deterministic wrapper written by the synthetic source), else strip tags -
all via pandas' vectorized string engine, no per-row Python loop.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

_ARTICLE_RE = r"(?s)<article>(.*)</article>"


def extract_series(html: pd.Series) -> pd.Series:
    """The extraction kernel body on a pandas Series of html bytes ->
    object Series of extracted text (str or None). Shared by the
    column UDF below and the fused segment kernel
    (``segment.segment_and_tag(from_html=True)``) so both paths are
    byte-identical by construction."""
    decoded = html.map(lambda b: b.decode("utf-8", errors="replace"), na_action="ignore")
    decoded = decoded.astype("string")
    payload = decoded.str.extract(_ARTICLE_RE, expand=False)
    # fallback for pages without the wrapper: strip all tags - computed
    # ONLY for the rows that need it (the tag-strip regex over full
    # documents is the expensive path; running it on every row just to
    # fillna threw the work away for wrapped pages)
    miss = payload.isna() & decoded.notna()
    if miss.any():
        payload = payload.copy()
        payload[miss] = (
            decoded[miss]
            .str.replace(r"(?s)<[^>]+>", " ", regex=True)
            .str.strip()
        )
    # plain python str / None cells (callers truth-test the values)
    return payload.astype(object).where(payload.notna(), None)


@pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    return extract_series(html)


def extract(pages: DataFrame, validate: bool = False) -> DataFrame:
    """pages(url, warc_ts, html, ...) -> + extracted_text column.

    With ``validate=True`` also emits ``extraction_ok`` comparing against a
    pre-existing ``text`` column (the byte-parity check used in tests).
    """
    out = pages.withColumn("extracted_text", extract_text_udf(F.col("html")))
    if validate and "text" in pages.columns:
        out = out.withColumn(
            "extraction_ok", F.col("extracted_text").eqNullSafe(F.col("text"))
        )
    return out
