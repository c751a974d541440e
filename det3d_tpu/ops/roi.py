"""RoI ops for two-stage refinement, TPU-native.

Parity targets:
* det3d/ops/roipool3d (src/roipool3d.cpp/_kernel.cu; wrapper
  roipool3d_utils.py:7-97) — points-in-boxes3d + per-RoI point pooling
  with a fixed sampled point budget.
* det3d/ops/rroi_align (ROIAlign_cuda.cpp/_kernel.cu; RoI.py:12-73) —
  rotated RoI Align over BEV feature maps.

The reference kernels are sequential per-RoI CUDA scans; here each op is a
fixed-shape XLA program. Two convention changes (consistent with the rest
of this framework):
* boxes are LIDAR-frame (x, y, z, w, l, h, yaw) with a CENTER origin — the
  reference's roipool3d uses PointRCNN's camera-frame bottom-origin
  (x, y, z, h, w, l, ry) boxes; callers converting reference assets should
  go through core.box_ops.box_camera_to_lidar first.
* feature maps are NHWC.

Selection of "first sampled_pt_num in-box points" reuses the top_k-over-
index-keys trick from ops/pointnet2.ball_query: the smallest nsample
point-order keys of the membership mask are exactly the CUDA kernel's
sequential-scan output.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from jax import lax, vmap


def points_in_boxes3d(points: jnp.ndarray, boxes: jnp.ndarray,
                      extra_width: float = 0.0) -> jnp.ndarray:
    """points (N, 3), boxes (M, 7) lidar center-origin -> (M, N) bool.

    Parity: roipool3d_utils.pts_in_boxes3d_cpu (+ enlarge_box3d when
    extra_width > 0, which pads w/l/h symmetrically).
    """
    centers = boxes[:, :3]                                  # (M, 3)
    dims = boxes[:, 3:6] + extra_width                      # (M, 3) w, l, h
    yaw = boxes[:, 6]
    rel = points[None, :, :] - centers[:, None, :]          # (M, N, 3)
    # inverse of core.box_ops.rotation_2d (the framework's corner-generation
    # rotation, itself matching reference box_np_ops.rotation_2d :334)
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    lx = rel[..., 0] * c[:, None] - rel[..., 1] * s[:, None]
    ly = rel[..., 0] * s[:, None] + rel[..., 1] * c[:, None]
    half = dims / 2.0
    return ((jnp.abs(lx) <= half[:, None, 0])
            & (jnp.abs(ly) <= half[:, None, 1])
            & (jnp.abs(rel[..., 2]) <= half[:, None, 2]))


def _first_k_indices(mask: jnp.ndarray, k: int
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """mask (M, N) -> (idx (M, k) int32, found (M, k) bool): the first k
    True columns per row in column order, 0-filled when empty."""
    n = mask.shape[-1]
    key = jnp.where(mask, jnp.arange(n, dtype=jnp.int32), n)
    negk, _ = lax.top_k(-key, k)
    idx = -negk
    found = idx < n
    return jnp.where(found, idx, 0).astype(jnp.int32), found


def roipool3d(points: jnp.ndarray, feats: Optional[jnp.ndarray],
              boxes: jnp.ndarray, extra_width: float = 1.0,
              sampled_pt_num: int = 512, canonical: bool = True,
              valid: Optional[jnp.ndarray] = None):
    """Pool raw points (+ features) inside enlarged RoIs, fixed budget.

    points (B, N, 3), feats (B, N, C) or None, boxes (B, M, 7) ->
    (pooled_xyz (B, M, S, 3), pooled_feats (B, M, S, C), empty (B, M)).

    Parity: roipool3d_utils.roipool3d_gpu (pool_extra_width, sampled_pt_num,
    zeroed output + empty flag for point-free RoIs) and roipool3d_cpu's
    canonical_transform (translate to RoI center, rotate by -yaw so +x is
    the box heading).
    """
    def one(pts, ft, bx, vld):
        mask = points_in_boxes3d(pts, bx, extra_width)       # (M, N)
        if vld is not None:
            mask = mask & vld[None, :]
        idx, found = _first_k_indices(mask, sampled_pt_num)  # (M, S)
        px = pts[idx]                                        # (M, S, 3)
        if canonical:
            px = px - bx[:, None, :3]
            yaw = bx[:, 6]
            c, s = jnp.cos(yaw)[:, None], jnp.sin(yaw)[:, None]
            px = jnp.stack([px[..., 0] * c - px[..., 1] * s,
                            px[..., 0] * s + px[..., 1] * c,
                            px[..., 2]], axis=-1)
        px = jnp.where(found[..., None], px, 0.0)
        pf = None
        if ft is not None:
            pf = jnp.where(found[..., None], ft[idx], 0.0)   # (M, S, C)
        empty = ~jnp.any(found, axis=1)
        return px, pf, empty

    if feats is None:
        px, _, empty = vmap(lambda p, b, v: one(p, None, b, v))(
            points, boxes,
            valid if valid is not None else jnp.ones(points.shape[:2], bool))
        return px, None, empty
    return vmap(one)(points, feats, boxes,
                     valid if valid is not None
                     else jnp.ones(points.shape[:2], bool))


def _bilinear(feat: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray
              ) -> jnp.ndarray:
    """feat (H, W, C); x, y (...,) continuous pixel coords -> (..., C).

    Out-of-bounds samples contribute zero (the CUDA kernel's empty
    handling)."""
    h, w = feat.shape[:2]
    inb = (x >= -1.0) & (x <= w * 1.0) & (y >= -1.0) & (y <= h * 1.0)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx1, wy1 = x - x0, y - y0
    wx0, wy0 = 1.0 - wx1, 1.0 - wy1
    out = 0.0
    for dy, wy in ((0, wy0), (1, wy1)):
        for dx, wx in ((0, wx0), (1, wx1)):
            xi = jnp.clip(x0.astype(jnp.int32) + dx, 0, w - 1)
            yi = jnp.clip(y0.astype(jnp.int32) + dy, 0, h - 1)
            ok = inb & (x0 + dx >= 0) & (x0 + dx <= w - 1) \
                     & (y0 + dy >= 0) & (y0 + dy <= h - 1)
            out = out + jnp.where((ok * wy * wx)[..., None] > 0,
                                  feat[yi, xi] * (wy * wx * ok)[..., None],
                                  0.0)
    return out


def rotated_roi_align(feat: jnp.ndarray, rois: jnp.ndarray,
                      output_size: Tuple[int, int], spatial_scale: float,
                      sampling_ratio: int = 2) -> jnp.ndarray:
    """Rotated RoI Align. feat (B, H, W, C) NHWC; rois (R, 6) =
    (batch_idx, cx, cy, w, h, angle_rad) in input coordinates ->
    (R, ph, pw, C).

    Parity: rroi_align/RoI.py::RotateRoIAlign — each output bin averages
    ``sampling_ratio^2`` bilinear samples on a grid rotated by the RoI
    angle about its center. Differentiable through the bilinear weights
    (the reference needs a hand-written backward kernel; XLA autodiffs
    this one).
    """
    ph, pw = output_size
    sr = max(int(sampling_ratio), 1)

    # sample offsets in the RoI's local frame, normalized to [-0.5, 0.5)
    ys = (jnp.arange(ph)[:, None] + (jnp.arange(sr) + 0.5)[None, :] / sr
          ).reshape(-1) / ph - 0.5                              # (ph*sr,)
    xs = (jnp.arange(pw)[:, None] + (jnp.arange(sr) + 0.5)[None, :] / sr
          ).reshape(-1) / pw - 0.5                              # (pw*sr,)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")                # (ph*sr, pw*sr)

    def one_roi(roi):
        bidx = roi[0].astype(jnp.int32)
        cx, cy, rw, rh = (r * spatial_scale for r in
                          (roi[1], roi[2], roi[3], roi[4]))
        ang = roi[5]
        lx, ly = gx * rw, gy * rh
        c, s = jnp.cos(ang), jnp.sin(ang)
        sx = cx + lx * c - ly * s - 0.5
        sy = cy + lx * s + ly * c - 0.5
        samples = _bilinear(feat[bidx], sx, sy)        # (ph*sr, pw*sr, C)
        pooled = samples.reshape(ph, sr, pw, sr, -1).mean(axis=(1, 3))
        return pooled

    return vmap(one_roi)(rois)
