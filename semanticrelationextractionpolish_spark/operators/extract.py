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


@pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    decoded = html.map(lambda b: b.decode("utf-8", errors="replace"), na_action="ignore")
    decoded = decoded.astype("string")
    payload = decoded.str.extract(_ARTICLE_RE, expand=False)
    # fallback for pages without the wrapper: strip all tags
    stripped = decoded.str.replace(r"(?s)<[^>]+>", " ", regex=True).str.strip()
    return payload.fillna(stripped).astype(object)


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
