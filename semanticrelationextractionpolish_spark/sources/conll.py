"""CoNLL-2003 reader (S7 in SURVEY.md §2.1).

The reference splits the file on blank lines in Python
(/root/reference/ogolny_ner_bert.py:73-83, conll_helpers.py). Spark
restatement: blank lines are sentence boundaries -> a running sum over a
blank-line indicator sessionizes lines into sentences (the same window
trick as event sessionization), then tokens/labels aggregate per
sentence with order preserved.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def read_conll(
    spark: SparkSession, path: str, token_col: int = 0, label_col: int = -1
) -> DataFrame:
    """-> (file, sent_id, tokens array<string>, labels array<string>)"""
    lines = (
        spark.read.text(path)
        .withColumn("file", F.input_file_name())
        .withColumn("line_no", F.monotonically_increasing_id())
    )
    w = Window.partitionBy("file").orderBy("line_no")
    is_blank = (F.trim(F.col("value")) == "") | F.col("value").startswith(
        "-DOCSTART-"
    )
    sents = lines.withColumn(
        "sent_id", F.sum(is_blank.cast("int")).over(w)
    ).where(~is_blank)
    parts = F.split(F.trim(F.col("value")), r"\s+")
    tok = parts.getItem(token_col)
    lab = F.element_at(parts, label_col) if label_col < 0 else parts.getItem(label_col)
    per_tok = sents.select("file", "sent_id", "line_no", tok.alias("token"), lab.alias("label"))
    return (
        per_tok.groupBy("file", "sent_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("line_no", "token", "label"))
            ).alias("z")
        )
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
