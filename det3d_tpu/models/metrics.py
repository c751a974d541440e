"""Streaming classification metrics, jit-pure.

Parity: det3d/models/losses/metrics.py (Scalar :7, Accuracy :27,
Precision :79, Recall :129, PrecisionRecall :197). The reference keeps
running totals in mutable module buffers; under jit metrics must be pure,
so each metric here is ``init() -> state`` plus
``update(state, labels, preds, weights) -> (state, value)`` over an explicit
state pytree — the state threads through ``lax.scan``/train steps and psums
cleanly across a mesh. The reference wires these into MultiGroupHead's loss
but keeps them commented out (mg_head.py:669-685); they are provided here
for the same ad-hoc use.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def _flatten(labels, pred_labels):
    n = labels.shape[0]
    return labels.reshape(n, -1), pred_labels.reshape(n, -1)


def _weights_or_default(labels, weights, ignore_idx):
    if weights is None:
        return (labels != ignore_idx).astype(jnp.float32)
    return weights.astype(jnp.float32)


@dataclass(frozen=True)
class Scalar:
    """Running mean of nonzero scalars. metrics.py:7-25."""

    def init(self):
        return {"total": jnp.zeros(()), "count": jnp.zeros(())}

    def update(self, state, scalar):
        hit = (scalar != 0.0).astype(jnp.float32)
        state = {"total": state["total"] + scalar * hit,
                 "count": state["count"] + hit}
        return state, self.value(state)

    def value(self, state):
        return state["total"] / jnp.maximum(state["count"], 1.0)


@dataclass(frozen=True)
class Accuracy:
    """metrics.py:27-76. preds: (N, ..., C) logits; labels: (N, ...)."""
    ignore_idx: int = -1
    threshold: float = 0.5
    encode_background_as_zeros: bool = True

    def init(self):
        return {"total": jnp.zeros(()), "count": jnp.zeros(())}

    def update(self, state, labels, preds, weights=None):
        if self.encode_background_as_zeros:
            scores = jax.nn.sigmoid(preds)
            pred_labels = jnp.where(
                (scores > self.threshold).any(-1),
                jnp.argmax(preds, axis=-1) + 1, 0)
        else:
            pred_labels = jnp.argmax(preds, axis=-1)
        labels_f, pred_f = _flatten(labels, pred_labels)
        w = _weights_or_default(labels_f, weights, self.ignore_idx)
        num = jnp.maximum(w.sum(), 1.0)
        total = (pred_f == labels_f).astype(jnp.float32).sum()
        state = {"total": state["total"] + total,
                 "count": state["count"] + num}
        return state, self.value(state)

    def value(self, state):
        return state["total"] / jnp.maximum(state["count"], 1.0)


def _binary_counts(labels, pred_labels, w):
    trues = labels > 0
    falses = labels == 0
    p_trues = pred_labels > 0
    p_falses = pred_labels == 0
    tp = (w * (trues & p_trues)).sum()
    tn = (w * (falses & p_falses)).sum()
    fp = (w * (falses & p_trues)).sum()
    fn = (w * (trues & p_falses)).sum()
    return tp, tn, fp, fn


def _binary_pred_labels(preds, threshold):
    if preds.shape[-1] == 1:
        return (jax.nn.sigmoid(preds) > threshold).astype(jnp.int32)[..., 0]
    assert preds.shape[-1] == 2, "precision/recall support 2 classes"
    return jnp.argmax(preds, axis=-1)


@dataclass(frozen=True)
class Precision:
    """tp / (tp + fp), streamed. metrics.py:79-126."""
    ignore_idx: int = -1
    threshold: float = 0.5

    def init(self):
        return {"total": jnp.zeros(()), "count": jnp.zeros(())}

    def update(self, state, labels, preds, weights=None):
        pred_labels = _binary_pred_labels(preds, self.threshold)
        labels_f, pred_f = _flatten(labels, pred_labels)
        w = _weights_or_default(labels_f, weights, self.ignore_idx)
        tp, _, fp, _ = _binary_counts(labels_f, pred_f, w)
        count = tp + fp
        hit = (count > 0).astype(jnp.float32)
        state = {"total": state["total"] + tp * hit,
                 "count": state["count"] + count * hit}
        return state, self.value(state)

    def value(self, state):
        return state["total"] / jnp.maximum(state["count"], 1.0)


@dataclass(frozen=True)
class Recall:
    """tp / (tp + fn), streamed. metrics.py:129-176."""
    ignore_idx: int = -1
    threshold: float = 0.5

    def init(self):
        return {"total": jnp.zeros(()), "count": jnp.zeros(())}

    def update(self, state, labels, preds, weights=None):
        pred_labels = _binary_pred_labels(preds, self.threshold)
        labels_f, pred_f = _flatten(labels, pred_labels)
        w = _weights_or_default(labels_f, weights, self.ignore_idx)
        tp, _, _, fn = _binary_counts(labels_f, pred_f, w)
        count = tp + fn
        hit = (count > 0).astype(jnp.float32)
        state = {"total": state["total"] + tp * hit,
                 "count": state["count"] + count * hit}
        return state, self.value(state)

    def value(self, state):
        return state["total"] / jnp.maximum(state["count"], 1.0)


@dataclass(frozen=True)
class PrecisionRecall:
    """Multi-threshold streaming precision/recall over max-class score.
    metrics.py:197-284."""
    thresholds: Sequence[float] = (0.5,)
    ignore_idx: int = -1
    use_sigmoid_score: bool = True
    encode_background_as_zeros: bool = True

    def init(self):
        t = len(tuple(self.thresholds))
        z = jnp.zeros((t,))
        return {"prec_total": z, "prec_count": z,
                "rec_total": z, "rec_count": z}

    def update(self, state, labels, preds, weights=None):
        if self.encode_background_as_zeros:
            assert self.use_sigmoid_score
            total_scores = jax.nn.sigmoid(preds)
        elif self.use_sigmoid_score:
            total_scores = jax.nn.sigmoid(preds)[..., 1:]
        else:
            total_scores = jax.nn.softmax(preds, axis=-1)[..., 1:]
        scores = jnp.max(total_scores, axis=-1)
        labels_f = labels.reshape(labels.shape[0], -1)
        scores_f = scores.reshape(labels.shape[0], -1)
        w = _weights_or_default(labels_f, weights, self.ignore_idx)

        new = dict(state)
        for i, thresh in enumerate(tuple(self.thresholds)):
            pred_f = (scores_f > thresh).astype(jnp.int32)
            tp, _, fp, fn = _binary_counts(labels_f, pred_f, w)
            rc, pc = tp + fn, tp + fp
            rhit = (rc > 0).astype(jnp.float32)
            phit = (pc > 0).astype(jnp.float32)
            new["rec_total"] = new["rec_total"].at[i].add(tp * rhit)
            new["rec_count"] = new["rec_count"].at[i].add(rc * rhit)
            new["prec_total"] = new["prec_total"].at[i].add(tp * phit)
            new["prec_count"] = new["prec_count"].at[i].add(pc * phit)
        return new, self.value(new)

    def value(self, state) -> Tuple[jnp.ndarray, jnp.ndarray]:
        prec = state["prec_total"] / jnp.maximum(state["prec_count"], 1.0)
        rec = state["rec_total"] / jnp.maximum(state["rec_count"], 1.0)
        return prec, rec
