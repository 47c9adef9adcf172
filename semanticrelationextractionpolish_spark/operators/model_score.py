"""Batched model inference over prepared inputs (U9-U11 shape).

The reference scores pair-sentences with trained TF models
(RelacjoSzukaczLSTM.py:38-57 BiLSTM+maxpool; RelacjoSzukaczBERT.py:123-169
R-BERT masked span means). The engine-level contract is: a deterministic
batch function (dense inputs) -> (label, score), with weights loaded once
per executor and reused across Arrow batches (the reference's
frozen-embedding discipline, EncjoSzukaczLSTM.py:16-26).

This module implements that contract with a pure-numpy linear model over
deterministic hashed token embeddings - the same dataflow, masks and
decode as the reference (A6 masked mean-pool over e1/e2 spans, A7
max-pool over time, A8 argmax decode), with pluggable weights: swap
``HashedLinearModel`` for a real ONNX/TF predictor without touching the
plan.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

EMB_DIM = 32


class HashedLinearModel:
    """Deterministic stand-in weights: embedding row e(id) is a seeded
    pseudo-random vector of token id; class logits come from
    [mean-pool(e1 span); mean-pool(e2 span); max-pool(all)] @ W."""

    def __init__(self, classes: list[str], seed: int = 7):
        self.classes = list(classes)
        rng = np.random.RandomState(seed)
        self.w = rng.randn(3 * EMB_DIM, len(self.classes)).astype(np.float32)

    @classmethod
    def from_weights(cls, classes: list[str], w: np.ndarray) -> "HashedLinearModel":
        model = cls.__new__(cls)
        model.classes = list(classes)
        model.w = np.asarray(w, dtype=np.float32)
        return model

    def _emb(self, ids: np.ndarray) -> np.ndarray:
        # hash-derived embeddings: stable across executors, no table
        out = np.zeros(ids.shape + (EMB_DIM,), dtype=np.float32)
        for d in range(EMB_DIM):
            out[..., d] = np.sin((ids.astype(np.float64) * (d + 1) * 2654435761) % 65536 / 65536 * 6.283)
        out[ids == 0] = 0.0
        return out

    def predict(self, input_ids, attention, e1_mask, e2_mask):
        e = self._emb(input_ids)  # (B, L, D)

        def masked_mean(mask):
            m = mask[..., None].astype(np.float32)
            s = (e * m).sum(axis=1)
            d = np.maximum(m.sum(axis=1), 1.0)  # divide_no_nan (A6)
            return s / d

        pooled = np.concatenate(
            [
                masked_mean(e1_mask),
                masked_mean(e2_mask),
                (e * attention[..., None]).max(axis=1),  # A7 max-pool
            ],
            axis=1,
        )
        logits = pooled @ self.w
        probs = np.exp(logits - logits.max(axis=1, keepdims=True))
        probs /= probs.sum(axis=1, keepdims=True)
        idx = np.argmax(probs, axis=1)  # A8 argmax decode
        return (
            [self.classes[i] for i in idx],
            probs[np.arange(len(idx)), idx].astype(float),
        )


SCORED = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("sent_idx", T.IntegerType(), False),
        T.StructField("e1_id", T.StringType(), True),
        T.StructField("e2_id", T.StringType(), True),
        T.StructField("gold_class", T.StringType(), True),
        T.StructField("model_class", T.StringType(), True),
        T.StructField("model_score", T.DoubleType(), True),
    ]
)


def save_model(model: HashedLinearModel, path: str) -> None:
    """S9 sink half (EncjoSzukaczLSTM.py:128-133 save_variables /
    RelacjoSzukaczBERT.py:263-268): persist weights + label inventory as
    a directory artifact. The format is engine-owned (npz + json), not a
    TF checkpoint - the lifecycle (train once, restore on every scoring
    cluster) is what's restated."""
    import json
    import os

    os.makedirs(path, exist_ok=True)
    np.savez(os.path.join(path, "weights.npz"), w=model.w)
    with open(os.path.join(path, "classes.json"), "w", encoding="utf-8") as f:
        json.dump(model.classes, f, ensure_ascii=False)


def load_model(path: str) -> HashedLinearModel:
    """S9 restore half (EncjoSzukaczLSTM.py:135-138 restore_variables /
    RelacjoSzukaczBERT.py:270-274): rebuild the exact scorer from the
    artifact - no re-seeding, byte-identical weights."""
    import json
    import os

    with open(os.path.join(path, "classes.json"), encoding="utf-8") as f:
        classes = json.load(f)
    w = np.load(os.path.join(path, "weights.npz"))["w"]
    return HashedLinearModel.from_weights(classes, w)


def score_with_model(
    model_inputs: DataFrame,
    classes: list[str] | None = None,
    model_path: str | None = None,
) -> DataFrame:
    """MODEL_INPUTS -> per-pair (model_class, model_score). The model is
    constructed once per batch iterator (executor-local singleton).

    With ``model_path``, the artifact is loaded ONCE on the driver and
    shipped to executors via a Spark broadcast (the production restore
    path: weights move once per executor, not once per task)."""
    if (classes is None) == (model_path is None):
        raise ValueError("pass exactly one of classes= or model_path=")
    bc = None
    if model_path is not None:
        restored = load_model(model_path)
        sc = model_inputs.sparkSession.sparkContext
        bc = sc.broadcast((restored.classes, restored.w))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if bc is not None:
            model = HashedLinearModel.from_weights(*bc.value)
        else:
            model = HashedLinearModel(classes)
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame(columns=[f.name for f in SCORED.fields])
                continue
            ids = np.stack(pdf["input_ids"].to_numpy())
            att = np.stack(pdf["attention_mask"].to_numpy())
            e1 = np.stack(pdf["e1_mask"].to_numpy())
            e2 = np.stack(pdf["e2_mask"].to_numpy())
            labels, scores = model.predict(ids, att, e1, e2)
            yield pd.DataFrame(
                {
                    "url": pdf["url"],
                    "sent_idx": pdf["sent_idx"],
                    "e1_id": pdf["e1_id"],
                    "e2_id": pdf["e2_id"],
                    "gold_class": pdf["gold_class"],
                    "model_class": labels,
                    "model_score": scores,
                }
            )

    return model_inputs.mapInPandas(kernel, schema=SCORED)
