"""PointNet++ set-abstraction / feature-propagation modules, flax.

Parity: det3d/ops/pointnet2/pointnet2_modules.py — PointnetSAModule(MSG)
(:80,:132), GroupAll path (npoint=None), PointnetFPModule (:389) — and
pytorch_utils.SharedMLP. The reference builds these on CUDA primitives;
here they sit on the XLA ops in ``det3d_tpu.ops.pointnet2`` and everything
(FPS, ball query, grouping, the MLP GEMMs, max-pool) fuses into one jitted
program. Layout is channels-last: features are (B, N, C).

These serve the reference's point-based experiment families (PointRCNN /
VoteNet-style models, ops/pointnet2/*); no shipped lidar config uses them,
so they are importable modules rather than registry entries (matching the
reference, which also does not register them).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from det3d_tpu.models.norm import build_norm
from det3d_tpu.ops import pointnet2 as p2


class SharedMLP(nn.Module):
    """Per-point MLP: Dense + BN + ReLU per layer (pytorch_utils.SharedMLP;
    a 1x1 conv2d over (B, C, M, S) is a Dense over channels-last)."""
    features: Sequence[int]
    norm_cfg: Optional[dict] = None
    axis_name: Optional[str] = None
    use_bn: bool = True

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        for f in self.features:
            x = nn.Dense(f, use_bias=not self.use_bn)(x)
            if self.use_bn:
                x = build_norm(self.norm_cfg, axis_name=self.axis_name)(
                    x, mask=mask, use_running_average=not train)
            x = nn.relu(x)
        return x


def query_and_group(xyz, new_xyz, features, radius, nsample, valid=None,
                    use_xyz=True, normalize_xyz=False):
    """Ball-query grouping (pointnet2_utils.QueryAndGroup:292).

    xyz (B, N, 3), new_xyz (B, M, 3), features (B, N, C) or None ->
    (grouped (B, M, S, 3+C or C or 3), found (B, M, S) bool).
    Grouped xyz are recentered on the query point; ``found`` marks real
    (non-padded) neighbors so downstream max-pools can mask them.
    """
    idx, found = p2.ball_query(xyz, new_xyz, radius, nsample, valid=valid)
    grouped_xyz = p2.group_points(xyz, idx) - new_xyz[:, :, None, :]
    if normalize_xyz:
        grouped_xyz = grouped_xyz / radius
    if features is None:
        return grouped_xyz, found
    grouped = p2.group_points(features, idx)
    if use_xyz:
        grouped = jnp.concatenate([grouped_xyz, grouped], axis=-1)
    return grouped, found


def group_all(xyz, features, valid=None, use_xyz=True):
    """GroupAll (pointnet2_utils.py:387): one group holding every point."""
    grouped = xyz[:, None, :, :]                              # (B, 1, N, 3)
    if features is not None:
        feats = features[:, None, :, :]
        grouped = (jnp.concatenate([grouped, feats], axis=-1)
                   if use_xyz else feats)
    b, n = xyz.shape[:2]
    found = (valid if valid is not None
             else jnp.ones((b, n), bool))[:, None, :]
    return grouped, found


class PointnetSAModuleMSG(nn.Module):
    """Multi-scale-grouping set abstraction (pointnet2_modules.py:80).

    npoint=None selects the GroupAll path (global abstraction), matching
    PointnetSAModule(npoint=None). The masked max-pool ignores padded
    ball-query slots (strictly better than the reference, which max-pools
    duplicated fill points — identical result when every ball has >= 1 hit,
    the only regime the reference runs in).
    """
    npoint: Optional[int]
    radii: Sequence[float]
    nsamples: Sequence[int]
    mlps: Sequence[Sequence[int]]
    use_xyz: bool = True
    norm_cfg: Optional[dict] = None
    axis_name: Optional[str] = None
    use_bn: bool = True

    @nn.compact
    def __call__(self, xyz, features=None, valid=None, train: bool = False):
        assert len(self.radii) == len(self.nsamples) == len(self.mlps)
        if self.npoint is not None:
            fps_idx = p2.furthest_point_sample(xyz, self.npoint, valid=valid)
            new_xyz = p2.gather_points(xyz, fps_idx)
            new_valid = (jnp.take_along_axis(valid, fps_idx, axis=1)
                         if valid is not None else None)
        else:
            new_xyz = jnp.zeros((xyz.shape[0], 1, 3), xyz.dtype)
            new_valid = None

        outs = []
        for radius, nsample, mlp in zip(self.radii, self.nsamples,
                                        self.mlps):
            if self.npoint is not None:
                grouped, found = query_and_group(
                    xyz, new_xyz, features, radius, nsample, valid=valid,
                    use_xyz=self.use_xyz)
            else:
                grouped, found = group_all(xyz, features, valid=valid,
                                           use_xyz=self.use_xyz)
            h = SharedMLP(mlp, self.norm_cfg, self.axis_name,
                          self.use_bn)(grouped, mask=found, train=train)
            h = jnp.max(jnp.where(found[..., None], h, -jnp.inf), axis=2)
            h = jnp.where(jnp.any(found, axis=2)[..., None], h, 0.0)
            outs.append(h)
        return new_xyz, jnp.concatenate(outs, axis=-1), new_valid


def PointnetSAModule(mlp, npoint=None, radius=None, nsample=None,
                     use_xyz=True, norm_cfg=None, axis_name=None,
                     use_bn=True):
    """Single-scale wrapper (pointnet2_modules.py:132) — flax modules are
    frozen dataclasses, so this is a factory, not a subclass."""
    return PointnetSAModuleMSG(npoint=npoint, radii=[radius],
                               nsamples=[nsample], mlps=[mlp],
                               use_xyz=use_xyz, norm_cfg=norm_cfg,
                               axis_name=axis_name, use_bn=use_bn)


class PointnetFPModule(nn.Module):
    """Feature propagation (pointnet2_modules.py:389): 3-NN inverse-distance
    interpolation of coarse features up to the dense set, concat with skip
    features, shared MLP."""
    mlp: Sequence[int]
    norm_cfg: Optional[dict] = None
    axis_name: Optional[str] = None
    use_bn: bool = True

    @nn.compact
    def __call__(self, unknown, known, unknown_feats, known_feats,
                 known_valid=None, train: bool = False):
        if known is not None:
            dist, idx = p2.three_nn(unknown, known, valid=known_valid)
            w = p2.interpolation_weights(dist)
            interp = p2.three_interpolate(known_feats, idx, w)
        else:                       # global feature broadcast (:421-424)
            interp = jnp.broadcast_to(
                known_feats, (known_feats.shape[0], unknown.shape[1],
                              known_feats.shape[-1]))
        x = (jnp.concatenate([interp, unknown_feats], axis=-1)
             if unknown_feats is not None else interp)
        return SharedMLP(self.mlp, self.norm_cfg, self.axis_name,
                         self.use_bn)(x, train=train)
