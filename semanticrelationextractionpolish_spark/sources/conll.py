"""CoNLL-2003 reader (S7 in SURVEY.md §2.1).

The reference splits the file on blank lines in Python
(/root/reference/ogolny_ner_bert.py:73-83, conll_helpers.py). Spark
restatement (round-2, shardable): each token line's sentence key is the
byte offset of the nearest preceding boundary line (blank/-DOCSTART-),
found with a BUCKETED as-of join on ``floor(off / bucket_bytes)`` with
boundaries replicated one bucket forward - not a per-file running-sum
window, so multi-GB files shard across splits. Bound: one sentence must
span < ``bucket_bytes`` (1 MiB default). Dense sent_ids are ranked over
the slim (file, sentence-key) projection only - token payloads never
enter a window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .lines import DEFAULT_BUCKET_BYTES, bucket, lines_with_offsets


def read_conll(
    spark: SparkSession,
    path: str,
    token_col: int = 0,
    label_col: int = -1,
    bucket_bytes: int = DEFAULT_BUCKET_BYTES,
) -> DataFrame:
    """-> (file, sent_id, tokens array<string>, labels array<string>)"""
    lines = lines_with_offsets(spark, path)
    is_boundary = (F.trim(F.col("value")) == "") | F.col("value").startswith(
        "-DOCSTART-"
    )
    bounds = lines.where(is_boundary).select("file", F.col("off").alias("b_off"))
    toks = lines.where(~is_boundary)
    b_rep = bounds.withColumn(
        "bkt",
        F.explode(
            F.array(bucket(F.col("b_off"), bucket_bytes), bucket(F.col("b_off"), bucket_bytes) + 1)
        ),
    )
    t_b = toks.withColumn("bkt", bucket(F.col("off"), bucket_bytes))
    # nearest preceding boundary per token (file start -> sentinel -1)
    per_tok = (
        t_b.join(b_rep, ["file", "bkt"], "left")
        .groupBy("file", "off", "value")
        .agg(
            F.coalesce(
                F.max(F.when(F.col("b_off") < F.col("off"), F.col("b_off"))),
                F.lit(-1),
            ).alias("sent_key")
        )
    )
    parts = F.split(F.trim(F.col("value")), r"\s+")
    tok = parts.getItem(token_col)
    lab = F.element_at(parts, label_col) if label_col < 0 else parts.getItem(label_col)
    sent_rows = (
        per_tok.select("file", "sent_key", "off", tok.alias("token"), lab.alias("label"))
        .groupBy("file", "sent_key")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("off", "token", "label"))
            ).alias("z")
        )
    )
    # dense per-file sentence ids: window over the SLIM key projection
    # (one short row per sentence), then joined back to the payloads
    keys = sent_rows.select("file", "sent_key")
    w = Window.partitionBy("file").orderBy("sent_key")
    ranked = keys.withColumn("sent_id", F.row_number().over(w) - 1)
    return (
        sent_rows.join(ranked, ["file", "sent_key"])
        .select(
            "file",
            "sent_id",
            F.transform("z", lambda s: s["token"]).alias("tokens"),
            F.transform("z", lambda s: s["label"]).alias("labels"),
        )
    )


def subword_label_propagation(
    sentences: DataFrame, repeat_word_label: bool = True
) -> DataFrame:
    """W2: propagate word labels to subwords. The CoNLL variant repeats
    the word label for every subword (ogolny_ner_bert.py:39-48); the
    IOB variant rewrites B- to I- on continuation pieces
    (readers.py:306-314). Pure Column algebra over the tokens array."""
    from ..functions.tokenizer import WORD_MARKER

    def split_word(raw):
        # mirror DeterministicTokenizer's lowercasing + fixed-stride split
        # in SQL: a word of length L yields ceil(L/6) pieces
        w = F.lower(raw)
        n_pieces = F.ceil(F.length(w) / 6).cast("int")
        return F.transform(
            F.sequence(F.lit(1), F.greatest(n_pieces, F.lit(1))),
            lambda i: F.when(i == 1, F.concat(F.lit(WORD_MARKER), F.substring(w, 1, 6)))
            .otherwise(F.substr(w, (i - 1) * 6 + 1, F.lit(6))),
        )

    zipped = F.zip_with(
        F.col("tokens"),
        F.col("labels"),
        lambda t, l: F.struct(split_word(t).alias("pieces"), l.alias("label")),
    )
    if repeat_word_label:
        sub = F.transform(
            zipped,
            lambda z: F.transform(z["pieces"], lambda p: F.struct(p.alias("piece"), z["label"].alias("label"))),
        )
    else:
        sub = F.transform(
            zipped,
            lambda z: F.transform(
                z["pieces"],
                lambda p, i: F.struct(
                    p.alias("piece"),
                    F.when(i == 0, z["label"])
                    .otherwise(F.regexp_replace(z["label"], "^B-", "I-"))
                    .alias("label"),
                ),
            ),
        )
    flat = F.flatten(sub)
    return sentences.select(
        "file",
        "sent_id",
        F.transform(flat, lambda s: s["piece"]).alias("subwords"),
        F.transform(flat, lambda s: s["label"]).alias("subword_labels"),
    )
