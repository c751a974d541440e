"""Normalization layers with mask support and mesh-synced statistics.

The reference needs three separate BatchNorm mechanisms (torch BN, a custom
CUDA SyncBN — det3d/ops/syncbn/syncbn.py:15-130 — and an all-gather
NaiveSyncBatchNorm — det3d/models/utils/norm.py:10-57). On TPU they collapse
into one module: batch statistics are reduced with ``lax.pmean`` over the
data-parallel mesh axis when ``axis_name`` is set, which under pjit/shard_map
rides the ICI and is mathematically identical to SyncBN.

``MaskedBatchNorm`` additionally supports an element mask so statistics for
pillar/voxel features (batch, V, T, C layouts with padding) match the
reference, which computes BN1d over exactly the real-voxel rows produced by
its ragged collate (torchie/parallel/collate.py:90).

Conventions follow torch BN with eps=1e-3, momentum=0.01 (the values every
reference config uses, e.g. backbones/scn.py:104): running stats are updated
as ``(1 - momentum) * running + momentum * batch``; normalization uses biased
batch variance, running variance stores the unbiased estimate.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


class MaskedBatchNorm(nn.Module):
    """BatchNorm over all leading axes, optionally masked and mesh-synced.

    Input x: (..., C). mask: broadcastable to x.shape[:-1] — True rows
    contribute to statistics. use_running_average selects eval behavior.
    """
    momentum: float = 0.01
    epsilon: float = 1e-3
    axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, use_running_average: bool = False):
        c = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            reduce_axes = tuple(range(x.ndim - 1))
            if mask is None:
                cnt = jnp.asarray(
                    jnp.prod(jnp.asarray(x.shape[:-1])), jnp.float32)
                s1 = jnp.sum(xf, axis=reduce_axes)
                s2 = jnp.sum(xf * xf, axis=reduce_axes)
            else:
                m = jnp.broadcast_to(
                    mask.astype(jnp.float32)[..., None], x.shape)
                cnt = jnp.sum(m[..., 0])
                s1 = jnp.sum(xf * m, axis=reduce_axes)
                s2 = jnp.sum(xf * xf * m, axis=reduce_axes)
            if self.axis_name is not None:
                # SyncBN: reduce sufficient statistics over the mesh axis
                cnt = jax.lax.psum(cnt, self.axis_name)
                s1 = jax.lax.psum(s1, self.axis_name)
                s2 = jax.lax.psum(s2, self.axis_name)
            cnt = jnp.maximum(cnt, 1.0)
            mean = s1 / cnt
            var = jnp.maximum(s2 / cnt - mean * mean, 0.0)

            if not self.is_initializing():
                unbiased = var * cnt / jnp.maximum(cnt - 1.0, 1.0)
                ra_mean.value = ((1.0 - self.momentum) * ra_mean.value
                                 + self.momentum * mean)
                ra_var.value = ((1.0 - self.momentum) * ra_var.value
                                + self.momentum * unbiased)

        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        y = (x.astype(jnp.float32) - mean) * inv + bias
        return y.astype(self.dtype if self.dtype is not None else x.dtype)


def build_norm(norm_cfg: Optional[dict], axis_name: Optional[str] = None,
               dtype=jnp.float32) -> MaskedBatchNorm:
    """Map reference norm_cfg dicts (models/utils/norm.py:60-80) to modules.

    BN / BN1d / SyncBN / NaiveSyncBN all resolve to MaskedBatchNorm; SyncBN
    additionally syncs over the mesh axis (on TPU the non-sync variants are
    pointless, but we honor the distinction: plain BN gets axis_name=None).
    """
    cfg = dict(norm_cfg or {"type": "BN", "eps": 1e-3, "momentum": 0.01})
    kind = cfg.get("type", "BN")
    sync = kind in ("SyncBN", "NaiveSyncBN", "DistributedSyncBN")
    return MaskedBatchNorm(
        momentum=float(cfg.get("momentum", 0.01)),
        epsilon=float(cfg.get("eps", 1e-3)),
        axis_name=axis_name if sync else None,
        dtype=dtype,
    )
