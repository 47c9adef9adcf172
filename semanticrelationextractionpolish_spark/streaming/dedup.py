"""Stateful streaming deduplication (engine addition, SURVEY §2.10).

Continuous-ingestion twin of ``operators/dedup.exact_dedup``: an
unbounded page/document stream is grouped by normalized-content hash and
an ``applyInPandasWithState`` kernel keeps per-hash state (keeper id +
copies seen), emitting each distinct content exactly once - across
micro-batches AND across stream restarts (state lives in the streaming
checkpoint, the same exactly-once discipline as the batch pipeline's
stage checkpoints).

Scale design: state is partitioned by the 128-bit content hash - no hot
keys by construction (hashes are uniform), state size = one tiny row per
distinct document, and the pre-grouping hash projection is pure Column
algebra. The state schema carries only (keeper_doc_id, n_copies): the
document body never enters the state store.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DEDUP_OUT = T.StructType(
    [
        T.StructField("content_md5", T.StringType(), False),
        T.StructField("keeper_doc_id", T.LongType(), True),
        T.StructField("n_copies_in_batch", T.LongType(), True),
        T.StructField("first_seen", T.BooleanType(), True),
    ]
)

DEDUP_STATE = T.StructType(
    [
        T.StructField("keeper_doc_id", T.LongType(), True),
        T.StructField("n_copies", T.LongType(), True),
    ]
)


def _norm(text_col):
    return F.regexp_replace(F.trim(F.lower(text_col)), r"\s+", " ")


def _dedup_kernel(
    key: Tuple[Any], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    content_md5 = key[0]
    batch_ids = []
    for pdf in pdfs:
        batch_ids.extend(int(x) for x in pdf["doc_id"])
    if not batch_ids:
        return
    batch_ids.sort()
    if state.exists:
        keeper, n_copies = state.get
        first_seen = False
    else:
        keeper, n_copies = batch_ids[0], 0
        first_seen = True
    state.update((keeper, n_copies + len(batch_ids)))
    yield pd.DataFrame(
        {
            "content_md5": [content_md5],
            "keeper_doc_id": [keeper],
            "n_copies_in_batch": [len(batch_ids)],
            "first_seen": [first_seen],
        }
    )


def streaming_exact_dedup(
    doc_stream: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """doc stream -> per-batch (content_md5, keeper_doc_id,
    n_copies_in_batch, first_seen). Filter ``first_seen`` to get the
    keep-stream; the state store remembers every hash ever seen, so a
    re-ingested duplicate is flagged even million batches later."""
    keyed = doc_stream.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.md5(_norm(F.col(text_col))).alias("content_md5"),
    )
    return keyed.groupBy("content_md5").applyInPandasWithState(
        _dedup_kernel,
        outputStructType=DEDUP_OUT,
        stateStructType=DEDUP_STATE,
        outputMode="append",  # emitted rows are final (parquet sink compatible)
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
