"""Temporal feature alignment + aggregation, TPU-native.

Parity: det3d/ops/align_aggregation — the Correlation CUDA op
(correlation/src), the AlignFeature CUDA op (alignfeature/src), and the
Aggregation / Align_Feature_and_Aggregation modules
(align_feature_and_aggregation.py:7-59), used by the reference's
video/sequence experiments to warp a keyframe's BEV features onto the
current frame.

Both CUDA kernels are local-window primitives and lower to one XLA
``conv_general_dilated_patches`` (an im2col the compiler fuses into the
consuming contraction) — no scalar loops, MXU-friendly:
* ``correlation(a, b)``: per-position dot product of ``a``'s feature with
  ``b``'s features over a patch_size x patch_size displacement window
  (kernel_size=1, the only configuration the reference instantiates).
* ``align_feature(feat, w)``: per-position weighted sum of ``feat``'s
  window by the (softmaxed) correlation weights — local cross-attention
  with fixed geometry.

Layout NHWC (the reference is NCHW).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn
from jax import lax


def _window_patches(x: jnp.ndarray, patch: int) -> jnp.ndarray:
    """x (B, H, W, C) -> (B, H, W, C, patch*patch) zero-padded window."""
    b, h, w, c = x.shape
    p = lax.conv_general_dilated_patches(
        x, filter_shape=(patch, patch), window_strides=(1, 1),
        padding=((patch // 2, patch // 2), (patch // 2, patch // 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    # patches are ordered channel-major: (C, patch*patch) flattened
    return p.reshape(b, h, w, c, patch * patch)


def correlation(a: jnp.ndarray, b: jnp.ndarray, patch_size: int = 9
                ) -> jnp.ndarray:
    """(B, H, W, C) x (B, H, W, C) -> (B, H, W, patch_size^2) cost volume.

    corr[..., k] = <a[y, x, :], b[y + dy_k, x + dx_k, :]> — the
    spatial-correlation-sampler semantics at kernel_size=1, stride 1,
    zero padding outside the frame.
    """
    pb = _window_patches(b, patch_size)                  # (B,H,W,C,K)
    return jnp.einsum("bhwc,bhwck->bhwk", a, pb)


def align_feature(feat: jnp.ndarray, weights: jnp.ndarray,
                  patch_size: int = 9) -> jnp.ndarray:
    """(B, H, W, C) x (B, H, W, patch_size^2) -> (B, H, W, C).

    out[y, x, c] = sum_k w[y, x, k] * feat[y + dy_k, x + dx_k, c] —
    the AlignFeature CUDA op: warp the keyframe features by the
    per-position window weights.
    """
    pf = _window_patches(feat, patch_size)               # (B,H,W,C,K)
    return jnp.einsum("bhwck,bhwk->bhwc", pf, weights)


class Aggregation(nn.Module):
    """Quality-weighted blend of aligned keyframe + current features
    (align_feature_and_aggregation.py:7-27). The conv tower is SHARED
    between the two inputs (the reference applies self.conv1/2/3 to both),
    and its two scalar outputs softmax into blend weights."""
    num_channel: int

    @nn.compact
    def __call__(self, align_feat, feat):
        conv1 = nn.Conv(64, (1, 1))
        conv2 = nn.Conv(32, (3, 3), padding="SAME")
        conv3 = nn.Conv(1, (1, 1))

        def tower(x):
            return conv3(conv2(conv1(x)))                # (B, H, W, 1)

        logits = jnp.concatenate([tower(align_feat), tower(feat)], axis=-1)
        w = nn.softmax(logits, axis=-1)                  # (B, H, W, 2)
        return w[..., :1] * align_feat + w[..., 1:] * feat


class AlignFeatureAndAggregation(nn.Module):
    """Full temporal block (align_feature_and_aggregation.py:30-59):
    embed both frames with 1x1 convs, correlate over a neighbor x neighbor
    window, softmax the cost volume, warp the keyframe, blend."""
    num_channel: int
    neighbor: int = 9

    @nn.compact
    def __call__(self, feature_select, feature_current):
        emb_key = nn.Conv(64, (1, 1), name="embed_keyframe_conv")
        emb_cur = nn.Conv(64, (1, 1), name="embed_current_conv")
        w = correlation(emb_cur(feature_current), emb_key(feature_select),
                        self.neighbor)
        w = nn.softmax(w, axis=-1)
        aligned = align_feature(feature_select, w, self.neighbor)
        return Aggregation(self.num_channel)(aligned, feature_current)
