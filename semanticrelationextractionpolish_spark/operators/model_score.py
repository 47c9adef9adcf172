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

    def pooled_features(self, input_ids, attention, e1_mask, e2_mask):
        """[mean-pool(e1); mean-pool(e2); max-pool(all)] - the feature
        map shared by inference AND the training gradient (U12)."""
        e = self._emb(input_ids)  # (B, L, D)

        def masked_mean(mask):
            m = mask[..., None].astype(np.float32)
            s = (e * m).sum(axis=1)
            d = np.maximum(m.sum(axis=1), 1.0)  # divide_no_nan (A6)
            return s / d

        return np.concatenate(
            [
                masked_mean(e1_mask),
                masked_mean(e2_mask),
                (e * attention[..., None]).max(axis=1),  # A7 max-pool
            ],
            axis=1,
        )

    def predict(self, input_ids, attention, e1_mask, e2_mask):
        pooled = self.pooled_features(input_ids, attention, e1_mask, e2_mask)
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
    model: HashedLinearModel | None = None,
) -> DataFrame:
    """MODEL_INPUTS -> per-pair (model_class, model_score). The model is
    constructed once per batch iterator (executor-local singleton).

    With ``model_path``, the artifact is loaded ONCE on the driver and
    shipped to executors via a Spark broadcast (the production restore
    path: weights move once per executor, not once per task). With
    ``model=``, an in-memory ``HashedLinearModel`` (e.g. fresh out of
    ``train_model``) is broadcast the same way."""
    if sum(x is not None for x in (classes, model_path, model)) != 1:
        raise ValueError("pass exactly one of classes=, model_path= or model=")
    bc = None
    if model_path is not None:
        model = load_model(model_path)
    if model is not None:
        sc = model_inputs.sparkSession.sparkContext
        bc = sc.broadcast((model.classes, model.w))

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

# --------------------------------------------------------------------------
# U12: distributed training loop (config train_params semantics)
# --------------------------------------------------------------------------

_GRAD_SCHEMA = T.StructType(
    [
        T.StructField("grad", T.ArrayType(T.DoubleType()), False),
        T.StructField("n", T.LongType(), False),
        T.StructField("loss_sum", T.DoubleType(), False),
        T.StructField("correct", T.LongType(), False),
    ]
)


def _adam_comp_factor(n_total: int, batch_size: int, cap: int) -> int:
    """Full-batch Adam step compensation factor: ceil(n/B), capped.

    The uncapped factor grows linearly with dataset size (round-4
    advice: n=1e6, B=32 -> ~31250x adam_lr in one step), so it is
    bounded by ``cap``; at fixture scale (n <= cap*B) the cap is
    inactive and behavior matches rounds 3-4 bit-for-bit."""
    return min(max(1, -(-n_total // batch_size)), max(1, cap))


def train_model(
    model_inputs: DataFrame,
    classes: list[str],
    num_epochs: int = 12,
    batch_size: int = 32,
    lr: float = 0.5,
    seed: int = 7,
    l2: float = 0.0,
    optimizer: str = "gd",
    adam_lr: float = 5e-4,
    adam_betas: tuple[float, float] = (0.9, 0.999),
    adam_eps: float = 1e-7,
    adam_step_compensation: bool = True,
    adam_step_comp_cap: int = 64,
) -> tuple[HashedLinearModel, list[dict]]:
    """U12: the reference's training loop (``train_params``:
    ``num_epochs=12, batch_size=32``, config_kpwr.json:26), restated as
    data-parallel distributed gradient descent over the SAME pooled
    features the scorer uses (RelacjoSzukaczLSTM.py train()/BERT
    fine-tune, minus the TF backend - softmax cross-entropy over the
    linear head, the only trainable surface of the sandbox model).

    Each epoch: broadcast the current weights; every executor computes
    per-Arrow-batch cross-entropy gradients (``batch_size`` bounds the
    in-kernel chunking, so executor memory is independent of partition
    size); the driver sums the (tiny: 3*EMB_DIM x n_classes) gradients
    and steps. One full-batch step per epoch - the reference's
    minibatch SGD becomes its distributed-deterministic equivalent
    (order-independent gradient sum, seeded init: same weights on every
    run and under task retry - the O5 seeded-determinism discipline).
    Early stopping mirrors the reference: not implemented
    (config_kpwr.json:28 "TODO_not_supported_yet").

    ``optimizer="adam"`` runs the reference's optimizer
    (RelacjoSzukaczLSTM.py:62: Adam, lr 5e-4; betas/eps at the library
    defaults) with the moment vectors held on the driver - they are the
    same tiny shape as ``w``, so the distributed part is unchanged (one
    order-independent gradient sum per epoch). Documented delta vs the
    reference: it steps once per MINIBATCH (~n/batch_size steps/epoch),
    we step once per epoch on the full-batch gradient; since an Adam
    step's magnitude is ~lr regardless of gradient scale,
    ``adam_step_compensation`` (default on) multiplies the step by
    ceil(n/batch_size) so one epoch moves the weights about as far as
    the reference's epoch of minibatch steps — but that heuristic
    ignores direction cancellation and curvature, and at corpus scale
    (n=1e6, B=32) an unbounded factor of ~31250x adam_lr is a single
    divergent step. The factor is therefore capped at
    ``adam_step_comp_cap`` (default 64 ~= the fixture-scale regime the
    approximation was validated in); past the cap, raise ``num_epochs``
    or lower ``batch_size``'s role by training on a sampled subset with
    true minibatch steps instead. ``optimizer="gd"`` keeps the round-3
    plain gradient-descent behavior bit-for-bit.

    Returns (trained model, per-epoch history of loss/accuracy).
    """
    if optimizer not in ("gd", "adam"):
        raise ValueError(f"Unknown optimizer {optimizer!r}")
    sc = model_inputs.sparkSession.sparkContext
    classes = list(classes)
    cls_idx = {c: i for i, c in enumerate(classes)}
    model = HashedLinearModel(classes, seed=seed)
    # Adam moments live on the driver: same (tiny) shape as w
    adam_m = np.zeros_like(model.w, dtype=np.float64)
    adam_v = np.zeros_like(model.w, dtype=np.float64)
    src = model_inputs.select(
        "input_ids", "attention_mask", "e1_mask", "e2_mask", "gold_class"
    ).localCheckpoint(eager=True)  # scan once, reuse across epochs

    history: list[dict] = []
    for epoch in range(num_epochs):
        bc = sc.broadcast((classes, model.w))

        def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            cls, w = bc.value
            m = HashedLinearModel.from_weights(cls, w)
            idx_map = {c: i for i, c in enumerate(cls)}
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                g = np.zeros_like(m.w, dtype=np.float64)
                n = 0
                loss_sum = 0.0
                correct = 0
                for s in range(0, len(pdf), batch_size):
                    chunk = pdf.iloc[s : s + batch_size]
                    y = np.array(
                        [idx_map.get(c, -1) for c in chunk["gold_class"]],
                        dtype=np.int64,
                    )
                    keep = y >= 0
                    if not keep.any():
                        continue
                    ids = np.stack(chunk["input_ids"].to_numpy())[keep]
                    att = np.stack(chunk["attention_mask"].to_numpy())[keep]
                    e1 = np.stack(chunk["e1_mask"].to_numpy())[keep]
                    e2 = np.stack(chunk["e2_mask"].to_numpy())[keep]
                    yk = y[keep]
                    pooled = m.pooled_features(ids, att, e1, e2)
                    logits = pooled @ m.w
                    probs = np.exp(logits - logits.max(axis=1, keepdims=True))
                    probs /= probs.sum(axis=1, keepdims=True)
                    rows = np.arange(len(yk))
                    loss_sum += float(-np.log(probs[rows, yk] + 1e-12).sum())
                    correct += int((probs.argmax(axis=1) == yk).sum())
                    delta = probs
                    delta[rows, yk] -= 1.0
                    g += pooled.T.astype(np.float64) @ delta.astype(np.float64)
                    n += int(len(yk))
                if n:
                    yield pd.DataFrame(
                        {
                            "grad": [g.ravel().tolist()],
                            "n": [n],
                            "loss_sum": [loss_sum],
                            "correct": [correct],
                        }
                    )

        parts = src.mapInPandas(kernel, schema=_GRAD_SCHEMA).collect()
        bc.unpersist()
        n_total = sum(r["n"] for r in parts)
        if n_total == 0:
            raise ValueError("train_model: no rows with a known gold_class")
        grad = np.zeros_like(model.w, dtype=np.float64)
        for r in parts:
            grad += np.asarray(r["grad"], dtype=np.float64).reshape(model.w.shape)
        grad /= n_total
        if l2:
            grad += l2 * model.w
        if optimizer == "adam":
            b1, b2 = adam_betas
            t = epoch + 1
            adam_m = b1 * adam_m + (1.0 - b1) * grad
            adam_v = b2 * adam_v + (1.0 - b2) * grad * grad
            m_hat = adam_m / (1.0 - b1**t)
            v_hat = adam_v / (1.0 - b2**t)
            step = adam_lr
            if adam_step_compensation:
                step *= _adam_comp_factor(n_total, batch_size, adam_step_comp_cap)
            model.w = (
                model.w - step * m_hat / (np.sqrt(v_hat) + adam_eps)
            ).astype(np.float32)
        else:
            model.w = (model.w - lr * grad).astype(np.float32)
        history.append(
            {
                "epoch": epoch,
                "loss": sum(r["loss_sum"] for r in parts) / n_total,
                "accuracy": sum(r["correct"] for r in parts) / n_total,
                "n": n_total,
            }
        )
    return model, history
