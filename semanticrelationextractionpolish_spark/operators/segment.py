"""Sentence segmentation + entity-aware subword tokenization.

Re-expresses the reference's per-document loop (readers.py:447-493:
``nltk.sent_tokenize`` then the inline-``<entity>`` regex scan with IOB
tagging) as one ``mapInPandas`` stage: pages in, one row per sentence out
with the reference's five parallel arrays. The tokenizer is constructed
once per Arrow-batch iterator (executor-local singleton pattern - the
reference's frozen-embedding trick, EncjoSzukaczLSTM.py:16-26).

Scale notes: the stage is embarrassingly parallel (no shuffle); input
partitioning is preserved, so at 100 TB it runs as a pure map over the
page-scan partitions with predicate pushdown (lang filter) happening at
the parquet/Iceberg scan *before* any Python is invoked.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from .. import schemas
from ..functions.kernels import tag_sentence_inline
from ..functions.tokenizer import DeterministicTokenizer, sent_tokenize


def segment_and_tag(
    pages: DataFrame,
    text_col: str = "text",
    entity_encoding_scheme: str = "iob",
    use_entity_classes: bool = True,
    from_html: bool = False,
) -> DataFrame:
    """pages -> SENTENCES (url, sent_idx, sent_text, tokens, token_ids,
    entities, entity_ids, n_entities).

    ``from_html=True`` fuses HTML->text extraction (the exact
    ``extract.extract_text_udf`` semantics, byte-identical) into this
    kernel: ``text_col`` then names the binary html column. Without the
    fusion the extracted text crosses the JVM<->Python Arrow boundary
    twice more than necessary (UDF out, kernel in) - ~2 extra copies of
    the full corpus text moved and transposed per run (round-7, guide
    §4.1: you control how many columns cross, and how often).
    """
    cols = ["url", text_col]
    src = pages.select(*cols)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .extract import extract_series

        tokenizer = DeterministicTokenizer()
        for pdf in batches:
            texts = (
                extract_series(pdf[text_col]) if from_html else pdf[text_col]
            )
            out = {k.name: [] for k in schemas.SENTENCES.fields}
            for url, text in zip(pdf["url"], texts):
                if not text:
                    continue
                for sent_idx, sent in enumerate(sent_tokenize(text)):
                    toks, tids, ents, eids, uniq = tag_sentence_inline(
                        sent,
                        tokenizer,
                        entity_encoding_scheme=entity_encoding_scheme,
                        use_entity_classes=use_entity_classes,
                    )
                    out["url"].append(url)
                    out["sent_idx"].append(sent_idx)
                    out["sent_text"].append(sent)
                    out["tokens"].append(toks)
                    out["token_ids"].append(tids)
                    out["entities"].append(ents)
                    out["entity_ids"].append(eids)
                    out["n_entities"].append(len(uniq))
            yield pd.DataFrame(out)

    return src.mapInPandas(kernel, schema=schemas.SENTENCES)
