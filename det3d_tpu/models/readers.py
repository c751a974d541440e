"""Point-cloud feature readers (VFE / PFN).

Inputs use the TPU batched-padded layout: voxels (B, V, T, C_in) with
per-voxel point counts (B, V) and zyx coords (B, V, 3); V/T are static.
This replaces the reference's ragged concat-across-batch layout produced by
collate_kitti (torchie/parallel/collate.py:90).

Parity targets:
  * VoxelFeatureExtractorV3 — mean of points per voxel
    (reference: det3d/models/readers/voxel_encoder.py:198-211)
  * PillarFeatureNet / PFNLayer — decorated points, masked MLP + max
    (reference: det3d/models/readers/pillar_encoder.py:17-155)
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from det3d_tpu.models.norm import build_norm
from det3d_tpu.models.precision import act_dtype
from det3d_tpu.models.registry import READERS


def paddings_indicator(num_points, max_points):
    """(B, V) counts -> (B, V, T) bool mask of real point slots.
    Parity: models/utils/misc.py get_paddings_indicator."""
    ids = jnp.arange(max_points, dtype=num_points.dtype)
    return ids[None, None, :] < num_points[..., None]


@READERS.register_module
class VoxelFeatureExtractorV3(nn.Module):
    """Mean of the (valid) points in each voxel. voxel_encoder.py:198-211."""
    num_input_features: int = 4
    norm_cfg: Optional[dict] = None
    name: str = "VoxelFeatureExtractorV3"

    @nn.compact
    def __call__(self, voxels, num_points, coors=None, train: bool = False):
        # voxels: (B, V, T, C); num_points: (B, V). A 3-D input is the
        # fused voxelize_mean path (core/voxelize.py): means already
        # computed during voxelization, nothing left to do here.
        if voxels.ndim == 3:
            return voxels
        denom = jnp.maximum(num_points, 1).astype(voxels.dtype)[..., None]
        mask = paddings_indicator(num_points, voxels.shape[2])
        pts = voxels * mask[..., None].astype(voxels.dtype)
        return pts.sum(axis=2) / denom                      # (B, V, C)


class PFNLayer(nn.Module):
    """Linear (no bias) + masked BN + ReLU + per-pillar max.
    Parity: pillar_encoder.py:17-58 (BN over real pillars incl. their padded
    point slots — matched via MaskedBatchNorm pillar mask)."""
    units: int
    last_layer: bool = False
    norm_cfg: Optional[dict] = None
    axis_name: Optional[str] = None
    precision: str = "fp32"

    @nn.compact
    def __call__(self, x, pillar_mask, train: bool = False):
        # x: (B, V, T, C_in); pillar_mask: (B, V) bool (real pillars)
        dt = act_dtype(self.precision)
        units = self.units if self.last_layer else self.units // 2
        x = nn.Dense(units, use_bias=False, dtype=dt, name="linear")(
            x.astype(dt))
        norm = build_norm(self.norm_cfg, axis_name=self.axis_name, dtype=dt)
        mask_bt = jnp.broadcast_to(pillar_mask[..., None], x.shape[:-1])
        x = norm(x, mask=mask_bt, use_running_average=not train)
        x = nn.relu(x)
        x_max = jnp.max(x, axis=2, keepdims=True)           # (B, V, 1, U)
        if self.last_layer:
            return x_max
        x_rep = jnp.broadcast_to(x_max, x.shape[:2] + (x.shape[2], units))
        return jnp.concatenate([x, x_rep], axis=-1)


@READERS.register_module
class PillarFeatureNet(nn.Module):
    """Decorate points with cluster/center offsets then run PFN layers.
    Parity: pillar_encoder.py:61-155."""
    num_input_features: int = 4
    num_filters: Sequence[int] = (64,)
    with_distance: bool = False
    voxel_size: Tuple[float, ...] = (0.2, 0.2, 4.0)
    pc_range: Tuple[float, ...] = (0.0, -40.0, -3.0, 70.4, 40.0, 1.0)
    norm_cfg: Optional[dict] = None
    axis_name: Optional[str] = None
    precision: str = "fp32"
    name_str: str = "PillarFeatureNet"

    @nn.compact
    def __call__(self, voxels, num_points, coors, train: bool = False):
        # voxels: (B, V, T, C); num_points: (B, V); coors: (B, V, 3) zyx
        dtype = voxels.dtype
        T = voxels.shape[2]
        mask = paddings_indicator(num_points, T)            # (B, V, T)
        maskf = mask[..., None].astype(dtype)
        denom = jnp.maximum(num_points, 1).astype(dtype)[..., None, None]

        # f_cluster: offsets from the mean of the pillar's (valid) points
        xyz = voxels[..., :3]
        points_mean = (xyz * maskf).sum(axis=2, keepdims=True) / denom
        f_cluster = xyz - points_mean

        # f_center: offsets from the pillar's grid-cell center
        vx, vy = self.voxel_size[0], self.voxel_size[1]
        x_offset = vx / 2 + self.pc_range[0]
        y_offset = vy / 2 + self.pc_range[1]
        cx = coors[..., 2].astype(dtype)[..., None] * vx + x_offset  # (B, V, 1)
        cy = coors[..., 1].astype(dtype)[..., None] * vy + y_offset
        f_center = jnp.stack(
            [voxels[..., 0] - cx, voxels[..., 1] - cy], axis=-1)

        feats = [voxels, f_cluster, f_center]
        if self.with_distance:
            feats.append(jnp.linalg.norm(xyz, axis=-1, keepdims=True))
        features = jnp.concatenate(feats, axis=-1)

        # zero decorated features at padded point slots (pillar_encoder.py:146-150)
        features = features * maskf

        pillar_mask = num_points > 0                         # (B, V)
        filters = list(self.num_filters)
        for i, units in enumerate(filters):
            features = PFNLayer(
                units=units,
                last_layer=(i == len(filters) - 1),
                norm_cfg=self.norm_cfg,
                axis_name=self.axis_name,
                precision=self.precision,
                name=f"pfn_{i}",
            )(features, pillar_mask, train=train)
        out = features.squeeze(2)                            # (B, V, U)
        # empty pillar rows must stay zero for the scatter
        return out * pillar_mask[..., None].astype(out.dtype)


class VFELayer(nn.Module):
    """Original VoxelNet VFE layer: linear+BN+ReLU per point, per-voxel max,
    concat pointwise with the aggregated max. Parity: voxel_encoder.py:14-42
    (the reference BN runs over all point slots of all voxels; we mask to
    real voxel rows like the rest of this codebase's masked BN usage)."""
    out_channels: int
    norm_cfg: Optional[dict] = None
    axis_name: Optional[str] = None
    precision: str = "fp32"

    @nn.compact
    def __call__(self, x, voxel_mask, train: bool = False):
        # x: (B, V, T, C); voxel_mask: (B, V) real voxels
        dt = act_dtype(self.precision)
        units = self.out_channels // 2
        x = nn.Dense(units, use_bias=False, dtype=dt, name="linear")(
            x.astype(dt))
        mask_bt = jnp.broadcast_to(voxel_mask[..., None], x.shape[:-1])
        x = build_norm(self.norm_cfg, axis_name=self.axis_name, dtype=dt)(
            x, mask=mask_bt, use_running_average=not train)
        pointwise = nn.relu(x)                               # (B, V, T, U)
        aggregated = jnp.max(pointwise, axis=2, keepdims=True)
        repeated = jnp.broadcast_to(aggregated, pointwise.shape)
        return jnp.concatenate([pointwise, repeated], axis=-1)


@READERS.register_module
class VoxelFeatureExtractor(nn.Module):
    """Original VoxelNet VFE: decorate with cluster-mean offsets, two
    VFELayers with padding-mask zeroing, final linear+BN, per-voxel max.
    Parity: voxel_encoder.py:46-176."""
    num_input_features: int = 4
    num_filters: Sequence[int] = (32, 128)
    with_distance: bool = False
    norm_cfg: Optional[dict] = None
    axis_name: Optional[str] = None
    precision: str = "fp32"
    name_str: str = "VoxelFeatureExtractor"

    @nn.compact
    def __call__(self, voxels, num_points, coors=None, train: bool = False):
        assert len(self.num_filters) == 2
        dtype = voxels.dtype
        t = voxels.shape[2]
        denom = jnp.maximum(num_points, 1).astype(dtype)[..., None, None]
        mask = paddings_indicator(num_points, t)             # (B, V, T)
        maskf = mask[..., None].astype(dtype)

        points_mean = (voxels[..., :3] * maskf).sum(
            axis=2, keepdims=True) / denom
        rel = voxels[..., :3] - points_mean
        feats = [voxels, rel]
        if self.with_distance:
            feats.append(jnp.linalg.norm(voxels[..., :3], axis=-1,
                                         keepdims=True))
        x = jnp.concatenate(feats, axis=-1) * maskf

        voxel_mask = num_points > 0
        x = VFELayer(self.num_filters[0], self.norm_cfg, self.axis_name,
                     self.precision, name="vfe1")(x, voxel_mask, train)
        x = x * maskf.astype(x.dtype)
        x = VFELayer(self.num_filters[1], self.norm_cfg, self.axis_name,
                     self.precision, name="vfe2")(x, voxel_mask, train)
        x = x * maskf.astype(x.dtype)
        dt = act_dtype(self.precision)
        x = nn.Dense(self.num_filters[1], use_bias=False, dtype=dt,
                     name="linear")(x)
        mask_bt = jnp.broadcast_to(voxel_mask[..., None], x.shape[:-1])
        x = build_norm(self.norm_cfg, axis_name=self.axis_name, dtype=dt)(
            x, mask=mask_bt, use_running_average=not train)
        x = nn.relu(x)
        out = jnp.max(x, axis=2)                             # (B, V, U)
        return (out * voxel_mask[..., None].astype(out.dtype)).astype(
            jnp.float32)


@READERS.register_module
class VFEV3_ablation(nn.Module):
    """Mean of (x, y, intensity) + inverse point count channel — the
    VFEv3 ablation reader (voxel_encoder.py:180-196)."""
    num_input_features: int = 4
    norm_cfg: Optional[dict] = None
    name: str = "VFEV3_ablation"

    @nn.compact
    def __call__(self, voxels, num_points, coors=None, train: bool = False):
        denom = jnp.maximum(num_points, 1).astype(voxels.dtype)[..., None]
        mask = paddings_indicator(num_points, voxels.shape[2])
        pts = voxels * mask[..., None].astype(voxels.dtype)
        mean = pts[..., (0, 1, 3)].sum(axis=2) / denom        # (B, V, 3)
        return jnp.concatenate([mean, 1.0 / denom], axis=-1)  # (B, V, 4)


@READERS.register_module
class SimpleVoxel(nn.Module):
    """Mean-pooled voxel reduced to (range_xy, z, reflectance...) — "z is
    important for z regression, x/y are not" (voxel_encoder.py:215-235)."""
    num_input_features: int = 4
    norm_cfg: Optional[dict] = None
    name: str = "SimpleVoxel"

    @nn.compact
    def __call__(self, voxels, num_points, coors=None, train: bool = False):
        denom = jnp.maximum(num_points, 1).astype(voxels.dtype)[..., None]
        mask = paddings_indicator(num_points, voxels.shape[2])
        pts = voxels[..., :self.num_input_features] \
            * mask[..., None].astype(voxels.dtype)
        mean = pts.sum(axis=2) / denom                        # (B, V, C)
        rng = jnp.linalg.norm(mean[..., :2], axis=-1, keepdims=True)
        return jnp.concatenate(
            [rng, mean[..., 2:self.num_input_features]], axis=-1)
