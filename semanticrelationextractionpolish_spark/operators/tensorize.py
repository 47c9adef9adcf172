"""Model-input preparation: the reference's ``_mangle_inputs`` family
(U7/U8/W4/F5/F10/O4 in SURVEY.md §2) as one Arrow-batched stage.

Mirrors /root/reference/RelacjoSzukaczBERT.py:65-121 semantics:

* [CLS]/[SEP] insertion with +1 shift of all four marker indices and the
  [SEP] pinned after the last real token (W4, :72-83);
* too-long filter: drop pairs where any shifted marker lands strictly
  beyond ``max_seq_len - 1``; unmarked rows are kept with all-zero
  masks (F5, :84-98);
* pad/truncate token ids to ``max_seq_len`` (O4);
* ``attention_mask = (ids != 0)`` - the reference's vectorization lesson
  (F10, :105-106: per-element map_fn was "extremely slow");
* binary e1/e2 span masks over the marker spans inclusive of markers
  (U8, :54-63).

Rows stay variable-length arrays in the table; the dense rectangles are
produced per Arrow batch right at the model boundary - Spark never
stores padded tensors.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

CLS_ID = 101  # fixed special ids (any stable ints work for the engine)
SEP_ID = 102

MODEL_INPUTS = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("sent_idx", T.IntegerType(), False),
        T.StructField("e1_id", T.StringType(), True),
        T.StructField("e2_id", T.StringType(), True),
        T.StructField("input_ids", T.ArrayType(T.IntegerType()), True),
        T.StructField("attention_mask", T.ArrayType(T.IntegerType()), True),
        T.StructField("e1_mask", T.ArrayType(T.IntegerType()), True),
        T.StructField("e2_mask", T.ArrayType(T.IntegerType()), True),
        T.StructField("gold_class", T.StringType(), True),
    ]
)


def filter_too_long(pairs: DataFrame, max_seq_len: int = 80) -> DataFrame:
    """F5 (RelacjoSzukaczBERT.py:84-98): a sentence is dropped only when
    any CLS-shifted marker position lands STRICTLY beyond max_seq_len-1,
    i.e. keep while ``pos + 1 <= max_seq_len - 1`` for all four markers.
    Rows with no marker info at all (unmarked NO_RELATION sentences) are
    KEPT - the reference only shifts/checks when e1_beg is present and
    such rows get all-zero entity masks downstream."""
    shifted_max = F.greatest("e1_beg", "e1_end", "e2_beg", "e2_end") + 1
    return pairs.where(
        F.col("e1_beg").isNull() | (shifted_max <= max_seq_len - 1)
    )


def prepare_model_inputs(pairs: DataFrame, max_seq_len: int = 80) -> DataFrame:
    """pairs (marker-inserted rows) -> dense model inputs."""
    src = filter_too_long(pairs, max_seq_len).select(
        "url",
        "sent_idx",
        "e1_id",
        "e2_id",
        "token_ids",
        "e1_beg",
        "e1_end",
        "e2_beg",
        "e2_end",
        "gold_class",
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            ids = np.zeros((n, max_seq_len), dtype=np.int32)
            e1m = np.zeros((n, max_seq_len), dtype=np.int32)
            e2m = np.zeros((n, max_seq_len), dtype=np.int32)
            for r in range(n):
                toks = list(pdf["token_ids"].iloc[r])[: max_seq_len - 2]
                seq = [CLS_ID] + toks + [SEP_ID]
                ids[r, : len(seq)] = seq
                if pd.isna(pdf["e1_beg"].iloc[r]):
                    # unmarked row: all-zero masks (RelacjoSzukaczBERT.py
                    # shifts/masks only when e1_beg is present)
                    continue
                # +1 shift for [CLS] (RelacjoSzukaczBERT.py:79-83)
                b1 = int(pdf["e1_beg"].iloc[r]) + 1
                f1 = int(pdf["e1_end"].iloc[r]) + 1
                b2 = int(pdf["e2_beg"].iloc[r]) + 1
                f2 = int(pdf["e2_end"].iloc[r]) + 1
                e1m[r, b1 : min(f1 + 1, max_seq_len)] = 1
                e2m[r, b2 : min(f2 + 1, max_seq_len)] = 1
            att = (ids != 0).astype(np.int32)  # F10 vectorized mask
            yield pd.DataFrame(
                {
                    "url": pdf["url"],
                    "sent_idx": pdf["sent_idx"],
                    "e1_id": pdf["e1_id"],
                    "e2_id": pdf["e2_id"],
                    "input_ids": list(ids),
                    "attention_mask": list(att),
                    "e1_mask": list(e1m),
                    "e2_mask": list(e2m),
                    "gold_class": pdf["gold_class"],
                }
            )

    return src.mapInPandas(kernel, schema=MODEL_INPUTS)
