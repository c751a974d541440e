"""Dense backbones: pillar scatter (and the dense middle for SECOND bring-up).

Parity targets:
  * PointPillarsScatter — scatter per-pillar features onto a BEV canvas
    (reference: det3d/models/readers/pillar_encoder.py:158-211; registered as
    a BACKBONE there too). The reference loops batch elements and uses dense
    indexing; here a single batched scatter-with-drop does all samples at
    once. Canvas layout is NHWC (TPU-native) — (B, ny, nx, C).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from det3d_tpu.models.registry import BACKBONES


@BACKBONES.register_module
class PointPillarsScatter(nn.Module):
    num_input_features: int = 64
    norm_cfg: Optional[dict] = None
    ds_factor: int = 1
    name_str: str = "PointPillarsScatter"

    @nn.compact
    def __call__(self, voxel_features, coords, input_shape, train: bool = False):
        """voxel_features: (B, V, C); coords: (B, V, 3) int32 zyx with -1 rows
        for padding; input_shape: static (nx, ny, nz) grid.

        Returns (B, ny, nx, C) canvas."""
        nx, ny = int(input_shape[0]), int(input_shape[1])
        c = voxel_features.shape[-1]

        y = coords[..., 1]
        x = coords[..., 2]
        valid = (y >= 0) & (x >= 0)
        flat_idx = jnp.where(valid, y * nx + x, ny * nx)     # OOB -> dropped

        def scatter_one(feats, idx):
            canvas = jnp.zeros((ny * nx, c), feats.dtype)
            return canvas.at[idx].set(feats, mode="drop")

        canvas = jax.vmap(scatter_one)(voxel_features, flat_idx)
        return canvas.reshape(-1, ny, nx, c)
