"""Text-analysis operators for large-scale training-data pipelines.

Language-ID (n-gram/stopword heuristic), quality scoring, token
counting, and document fingerprinting over a ``documents(doc_id, text,
lang, ...)`` table. Every op is pure Column algebra (JVM-side,
whole-stage codegen) and each has an exactly-equivalent ANSI-SQL
formulation used as the DuckDB oracle - no UDFs, no floats that could
drift between engines (ratios are rounded where surfaced).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# tiny per-language marker-word lists (public stopword knowledge); the
# heuristic votes by marker-word hits
LANG_MARKERS = {
    "en": ["the", "and", "of", "is", "to"],
    "de": ["der", "und", "die", "ist", "das"],
    "es": ["el", "los", "de", "es", "y"],
    "fr": ["le", "et", "les", "est", "la"],
    "pl": ["w", "i", "się", "jest", "na"],
}

STOPWORDS = sorted({w for ws in LANG_MARKERS.values() for w in ws})


def tokens_col(text_col):
    return F.split(F.trim(F.lower(text_col)), r"\s+")


def token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + distinct-token count per document."""
    toks = tokens_col(F.col(text_col))
    return df.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct_tokens"),
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation-ratio / stopword-ratio / type-token-ratio
    quality features with a composite score. All ratios rounded to 6
    decimals so the DuckDB oracle hashes identically."""
    toks = tokens_col(F.col(text_col))
    n_tokens = F.size(toks)
    n_chars = F.length(F.col(text_col))
    stop_lit = F.array(*[F.lit(w) for w in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda w: F.array_contains(stop_lit, w)))
    punct = F.length(F.regexp_replace(F.col(text_col), r"[^.,!?;:]", ""))
    ttr = F.round(F.size(F.array_distinct(toks)) / n_tokens, 6)
    stop_ratio = F.round(n_stop / n_tokens, 6)
    punct_ratio = F.round(punct / n_chars, 6)
    score = F.round(
        F.least(n_tokens / F.lit(100.0), F.lit(1.0)) * 0.4
        + stop_ratio * 0.3
        + ttr * 0.3,
        6,
    )
    return df.select(
        "doc_id",
        n_tokens.cast("long").alias("n_tokens"),
        n_chars.cast("long").alias("n_chars"),
        stop_ratio.alias("stopword_ratio"),
        punct_ratio.alias("punct_ratio"),
        ttr.alias("type_token_ratio"),
        score.alias("quality"),
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word voting language identifier. Deterministic argmax with
    lexicographic tie-break (greatest votes, then smallest lang code)."""
    toks = tokens_col(F.col(text_col))
    scores = []
    for lang in sorted(LANG_MARKERS):
        markers = F.array(*[F.lit(w) for w in LANG_MARKERS[lang]])
        hits = F.size(F.filter(toks, lambda w: F.array_contains(markers, w)))
        scores.append(F.struct(hits.alias("hits"), F.lit(lang).alias("lang")))
    # max of structs: highest hits, then LARGEST lang code would win on tie
    # -> invert lang ordering via struct of (hits, negated-rank)
    best = F.greatest(*[
        F.struct(
            s["hits"].alias("hits"),
            F.lit(-i).alias("rank"),
            s["lang"].alias("lang"),
        )
        for i, s in enumerate(scores)
    ])
    return df.select(
        "doc_id",
        best["lang"].alias("pred_lang"),
        best["hits"].cast("long").alias("marker_hits"),
    )


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Content fingerprints: md5 of whitespace-normalized text (exact-dup
    key) + md5 of the first 8 tokens (prefix fingerprint)."""
    norm = F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", " ")
    prefix = F.array_join(F.slice(F.split(norm, " "), 1, 8), " ")
    return df.select(
        "doc_id",
        F.md5(norm).alias("content_md5"),
        F.md5(prefix).alias("prefix_md5"),
    )


# ---- matching DuckDB oracle SQL (kept adjacent so drift is obvious) --------

def _marker_hits_sql(lang: str) -> str:
    markers = ", ".join(f"'{w}'" for w in LANG_MARKERS[lang])
    return (
        "len(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),"
        f" w -> list_contains([{markers}], w)))"
    )


def lang_id_oracle_sql() -> str:
    """Argmax with alphabetically-first tie-break, as nested CASE."""
    langs = sorted(LANG_MARKERS)
    hits = {l: f"h_{l}" for l in langs}
    inner = ", ".join(f"{_marker_hits_sql(l)} AS h_{l}" for l in langs)
    cases = []
    for i, l in enumerate(langs):
        rest = langs[i + 1 :]
        if rest:
            cond = " AND ".join(f"{hits[l]} >= {hits[r]}" for r in rest)
            cases.append(f"WHEN {cond} THEN '{l}'")
        else:
            cases.append(f"ELSE '{l}'")
    case_sql = "CASE " + " ".join(cases) + " END"
    greatest = "greatest(" + ", ".join(hits[l] for l in langs) + ")"
    return (
        f"SELECT doc_id, {case_sql} AS pred_lang, {greatest} AS marker_hits "
        f"FROM (SELECT doc_id, {inner} FROM documents)"
    )


def quality_oracle_sql() -> str:
    stops = "[" + ", ".join(f"'{w}'" for w in STOPWORDS) + "]"
    stop_ratio = (
        f"round(len(list_filter(toks, w -> list_contains({stops}, w)))"
        " / CAST(len(toks) AS DOUBLE), 6)"
    )
    ttr = "round(len(list_distinct(toks)) / CAST(len(toks) AS DOUBLE), 6)"
    return f"""
        SELECT doc_id,
               len(toks) AS n_tokens,
               length(text) AS n_chars,
               {stop_ratio} AS stopword_ratio,
               round(length(regexp_replace(text, '[^.,!?;:]', '', 'g'))
                     / CAST(length(text) AS DOUBLE), 6) AS punct_ratio,
               {ttr} AS type_token_ratio,
               round(least(len(toks) / 100.0, 1.0) * 0.4
                     + {stop_ratio} * 0.3 + {ttr} * 0.3, 6) AS quality
        FROM (SELECT doc_id, text,
                     regexp_split_to_array(trim(lower(text)), '\\s+') AS toks
              FROM documents)
    """


def token_count_oracle_sql() -> str:
    return """
        SELECT doc_id,
               len(regexp_split_to_array(trim(lower(text)), '\\s+')) AS n_tokens,
               len(list_distinct(regexp_split_to_array(trim(lower(text)), '\\s+'))) AS n_distinct_tokens
        FROM documents
    """


def fingerprint_oracle_sql() -> str:
    return """
        SELECT doc_id,
               md5(norm) AS content_md5,
               md5(array_to_string(list_slice(string_split(norm, ' '), 1, 8), ' ')) AS prefix_md5
        FROM (SELECT doc_id,
                     regexp_replace(trim(lower(text)), '\\s+', ' ', 'g') AS norm
              FROM documents)
    """
