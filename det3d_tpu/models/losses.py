"""Weighted detection losses (TF-object-detection style).

Parity targets: det3d/models/losses/losses.py — WeightedSmoothL1Loss (:147),
SigmoidFocalLoss (:270), WeightedSigmoidClassificationLoss (:235),
WeightedSoftmaxClassificationLoss (:408), WeightedL2LocalizationLoss (:106).
All are pure jax functions wrapped in light config dataclasses; XLA fuses
them into the backward pass (the reference needed a dedicated CUDA kernel for
focal loss — det3d/ops/sigmoid_focal_loss — which is unnecessary here).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from det3d_tpu.models.registry import LOSSES


def _sigmoid_cross_entropy_with_logits(labels, logits):
    """Numerically-stable elementwise sigmoid CE (TF semantics)."""
    return jnp.maximum(logits, 0.0) - logits * labels + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))


def _softmax_cross_entropy_with_logits(labels, logits):
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.sum(labels * logp, axis=-1)


@LOSSES.register_module
@dataclass
class WeightedSmoothL1Loss:
    """Per-element smooth-L1 with sigma transition. losses.py:147-212.

    Note the reference constructor ignores ``code_weights`` (it is commented
    out — losses.py:167-173); we accept and ignore it identically.
    """
    sigma: float = 3.0
    reduction: str = "mean"
    code_weights: Optional[Sequence[float]] = None
    codewise: bool = True
    loss_weight: float = 1.0

    @property
    def _loss_weight(self):
        return self.loss_weight

    def __call__(self, pred, target, weights=None):
        diff = pred - target
        abs_diff = jnp.abs(diff)
        k = 1.0 / (self.sigma ** 2)
        lt = (abs_diff <= k).astype(abs_diff.dtype)
        loss = lt * 0.5 * (abs_diff * self.sigma) ** 2 + (abs_diff - 0.5 * k) * (
            1.0 - lt)
        if self.codewise:
            if weights is not None:
                loss = loss * weights[..., None]
        else:
            loss = jnp.sum(loss, axis=2)
            if weights is not None:
                loss = loss * weights
        return loss


@LOSSES.register_module
@dataclass
class WeightedL2LocalizationLoss:
    """losses.py:106-134."""
    loss_weight: float = 1.0

    @property
    def _loss_weight(self):
        return self.loss_weight

    def __call__(self, pred, target, weights=None):
        diff = pred - target
        if weights is not None:
            diff = diff * weights[..., None]
        return 0.5 * diff * diff


@LOSSES.register_module
@dataclass
class SigmoidFocalLoss:
    """Sigmoid focal CE. losses.py:270-338."""
    gamma: float = 2.0
    alpha: float = 0.25
    reduction: str = "mean"
    loss_weight: float = 1.0

    @property
    def _loss_weight(self):
        return self.loss_weight

    def __call__(self, pred, target, weights=None):
        ce = _sigmoid_cross_entropy_with_logits(labels=target, logits=pred)
        p = jax.nn.sigmoid(pred)
        p_t = target * p + (1.0 - target) * (1.0 - p)
        modulating = jnp.power(1.0 - p_t, self.gamma) if self.gamma else 1.0
        if self.alpha is not None:
            alpha_w = target * self.alpha + (1.0 - target) * (1.0 - self.alpha)
        else:
            alpha_w = 1.0
        loss = modulating * alpha_w * ce
        if weights is not None:
            loss = loss * weights[..., None] if weights.ndim == loss.ndim - 1 \
                else loss * weights
        return loss


@LOSSES.register_module
@dataclass
class WeightedSigmoidClassificationLoss:
    """losses.py:235-267."""
    loss_weight: float = 1.0

    @property
    def _loss_weight(self):
        return self.loss_weight

    def __call__(self, pred, target, weights=None):
        loss = _sigmoid_cross_entropy_with_logits(labels=target, logits=pred)
        if weights is not None:
            loss = loss * weights[..., None]
        return loss


@LOSSES.register_module
@dataclass
class WeightedSoftmaxClassificationLoss:
    """Softmax CE over (B, A, num_classes) one-hot targets, weighted per
    anchor. losses.py:408-446. Used as the direction classifier loss."""
    logit_scale: float = 1.0
    loss_weight: float = 1.0
    name: str = ""

    @property
    def _loss_weight(self):
        return self.loss_weight

    def __call__(self, pred, target, weights):
        pred = pred / self.logit_scale
        ce = _softmax_cross_entropy_with_logits(labels=target, logits=pred)
        return ce * weights


def build_loss(cfg: dict):
    from det3d_tpu.utils.registry import build_from_cfg
    cfg = dict(cfg)
    # reference configs may carry 'name' fields for some losses; keep them
    return build_from_cfg(cfg, LOSSES)
