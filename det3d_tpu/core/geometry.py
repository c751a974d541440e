"""Rotated-box intersection geometry, fully vectorized for TPU/XLA.

One kernel replaces the reference's four separate native rotated-IoU
implementations (reference: det3d/ops/nms/nms_gpu.py:500 ``rotate_iou_kernel``,
det3d/ops/iou3d/src/iou3d_kernel.cu, det3d/ops/box2d_iou_rotated/src,
det3d/datasets/utils/kitti_object_eval_python/rotate_iou.py:249
``rotate_iou_gpu_eval``). Algorithm: candidate intersection points =
{vertices of A inside B} ∪ {vertices of B inside A} ∪ {edge-edge crossings},
angle-sorted around their centroid, shoelace area. All shapes are static; the
whole pairwise matrix computes as one fused XLA program (no scalar loops).

Boxes are BEV rotated rectangles ``[cx, cy, w, l, angle]`` with the lidar
angle convention shared with :mod:`det3d_tpu.core.box_ops`.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from det3d_tpu.core import box_ops

_EPS = 1e-8


def box_to_corners(boxes):
    """(..., 5) rotated boxes -> (..., 4, 2) BEV corners (consistent winding)."""
    flat = boxes.reshape(-1, 5)
    corners = box_ops.center_to_corner_box2d(flat[:, :2], flat[:, 2:4], flat[:, 4])
    return corners.reshape(*boxes.shape[:-1], 4, 2)


def _cross2(o, a, b):
    """z of cross((a-o), (b-o)) — positive when o->a->b turns counterclockwise."""
    return (a[..., 0] - o[..., 0]) * (b[..., 1] - o[..., 1]) - (
        a[..., 1] - o[..., 1]) * (b[..., 0] - o[..., 0])


def _points_in_quad(points, quad):
    """points: (..., P, 2), quad: (..., 4, 2) convex, any winding -> (..., P) bool."""
    # signed area sign fixes the winding
    area2 = (
        _cross2(quad[..., 0, :], quad[..., 1, :], quad[..., 2, :])
        + _cross2(quad[..., 0, :], quad[..., 2, :], quad[..., 3, :])
    )
    sign = jnp.where(area2 >= 0, 1.0, -1.0)[..., None]  # (..., 1)
    inside = None
    for i in range(4):
        a = quad[..., i, :][..., None, :]            # (..., 1, 2)
        b = quad[..., (i + 1) % 4, :][..., None, :]
        s = _cross2(a, b, points) * sign             # (..., P)
        ok = s >= -_EPS
        inside = ok if inside is None else (inside & ok)
    return inside


def _segment_intersections(ca, cb):
    """All 16 edge-edge crossing points between two quads.

    ca, cb: (..., 4, 2). Returns pts (..., 16, 2), valid (..., 16).
    """
    p1 = ca[..., :, None, :]                       # (..., 4, 1, 2)
    p2 = jnp.roll(ca, -1, axis=-2)[..., :, None, :]
    q1 = cb[..., None, :, :]                       # (..., 1, 4, 2)
    q2 = jnp.roll(cb, -1, axis=-2)[..., None, :, :]

    r = p2 - p1                                    # (..., 4, 1, 2)
    s = q2 - q1                                    # (..., 1, 4, 2)
    denom = r[..., 0] * s[..., 1] - r[..., 1] * s[..., 0]   # (..., 4, 4)
    qp = q1 - p1
    t_num = qp[..., 0] * s[..., 1] - qp[..., 1] * s[..., 0]
    u_num = qp[..., 0] * r[..., 1] - qp[..., 1] * r[..., 0]
    safe = jnp.where(jnp.abs(denom) > _EPS, denom, 1.0)
    t = t_num / safe
    u = u_num / safe
    valid = (
        (jnp.abs(denom) > _EPS)
        & (t >= -_EPS) & (t <= 1.0 + _EPS)
        & (u >= -_EPS) & (u <= 1.0 + _EPS)
    )
    pts = p1 + t[..., None] * r                     # (..., 4, 4, 2)
    shape = pts.shape[:-3] + (16, 2)
    return pts.reshape(shape), valid.reshape(valid.shape[:-2] + (16,))


def rotated_intersection_area(corners_a, corners_b):
    """Intersection area of two convex quads. (..., 4, 2) x2 -> (...,)."""
    in_b = _points_in_quad(corners_a, corners_b)    # (..., 4)
    in_a = _points_in_quad(corners_b, corners_a)    # (..., 4)
    cross_pts, cross_valid = _segment_intersections(corners_a, corners_b)

    pts = jnp.concatenate([corners_a, corners_b, cross_pts], axis=-2)   # (..., 24, 2)
    valid = jnp.concatenate([in_b, in_a, cross_valid], axis=-1)         # (..., 24)

    n_valid = valid.sum(axis=-1)
    vf = valid.astype(pts.dtype)
    center = (pts * vf[..., None]).sum(axis=-2) / jnp.maximum(
        n_valid.astype(pts.dtype), 1.0)[..., None]

    rel = pts - center[..., None, :]
    ang = jnp.arctan2(rel[..., 1], rel[..., 0])
    key = jnp.where(valid, ang, 1e9)                 # invalid -> end
    order = jnp.argsort(key, axis=-1)
    sorted_pts = jnp.take_along_axis(pts, order[..., None], axis=-2)
    sorted_valid = jnp.take_along_axis(valid, order, axis=-1)

    # fill invalid tail slots with the first point so they contribute zero
    first = sorted_pts[..., 0:1, :]
    poly = jnp.where(sorted_valid[..., None], sorted_pts, first)

    nxt = jnp.roll(poly, -1, axis=-2)
    contrib = poly[..., 0] * nxt[..., 1] - nxt[..., 0] * poly[..., 1]
    area = 0.5 * jnp.abs(contrib.sum(axis=-1))
    return jnp.where(n_valid >= 3, area, 0.0)


def rotated_iou_matrix(boxes, qboxes, criterion=-1):
    """Pairwise rotated IoU/overlap of BEV boxes.

    boxes: (N, 5), qboxes: (K, 5) -> (N, K).
    criterion -1: intersection / union (IoU);
    criterion 0: intersection / area(boxes);
    criterion 1: intersection / area(qboxes)
    — matching rotate_iou_gpu_eval's ``criterion`` (rotate_iou.py:249-341).
    """
    boxes = jnp.asarray(boxes)
    qboxes = jnp.asarray(qboxes)
    ca = box_to_corners(boxes)[:, None]              # (N, 1, 4, 2)
    cb = box_to_corners(qboxes)[None, :]             # (1, K, 4, 2)
    n, k = boxes.shape[0], qboxes.shape[0]
    ca = jnp.broadcast_to(ca, (n, k, 4, 2))
    cb = jnp.broadcast_to(cb, (n, k, 4, 2))
    inter = rotated_intersection_area(ca, cb)
    area_a = (boxes[:, 2] * boxes[:, 3])[:, None]
    area_b = (qboxes[:, 2] * qboxes[:, 3])[None, :]
    if criterion == -1:
        denom = area_a + area_b - inter
    elif criterion == 0:
        denom = jnp.broadcast_to(area_a, inter.shape)
    elif criterion == 1:
        denom = jnp.broadcast_to(area_b, inter.shape)
    else:
        raise ValueError("criterion must be -1, 0 or 1")
    return jnp.where(denom > 0, inter / jnp.where(denom > 0, denom, 1.0), 0.0)


def points_in_rbbox(points, boxes, origin=(0.5, 0.5, 0.5)):
    """Which lidar points fall inside which 3D rotated boxes.

    points: (P, >=3), boxes: (N, 7) -> (P, N) bool.
    Parity: box_np_ops.points_in_rbbox (:1100) via corner surfaces; here we
    test in the box frame directly (rotate points into each box's local frame)
    which is algebraically identical for axis-2 rotated boxes.
    """
    xp = jnp if isinstance(points, (jax.Array, jax.core.Tracer)) else np
    centers = boxes[:, :3]
    dims = boxes[:, 3:6]
    angles = boxes[:, -1]
    # shift when origin is not centered (lidar boxes use bottom-origin z=0)
    origin = np.asarray(origin, dtype=np.float32)
    shift = (0.5 - origin)[None, :] * dims  # (N, 3)
    true_centers = centers + shift
    rel = points[:, None, :3] - true_centers[None, :, :]    # (P, N, 3)
    c, s = xp.cos(angles), xp.sin(angles)
    # rotate into box frame: inverse of rotation_3d_in_axis(axis=2)
    x = rel[..., 0] * c[None, :] + rel[..., 1] * s[None, :]
    y = -rel[..., 0] * s[None, :] + rel[..., 1] * c[None, :]
    z = rel[..., 2]
    half = dims / 2
    return (
        (xp.abs(x) <= half[None, :, 0])
        & (xp.abs(y) <= half[None, :, 1])
        & (xp.abs(z) <= half[None, :, 2])
    )


def box_collision_test(boxes, qboxes):
    """BEV rotated-box overlap test (any positive intersection).

    boxes: (N, 5), qboxes: (K, 5) -> (N, K) bool. Used by the GT-paste
    augmentation collision rejection (reference: core/sampler/preprocess.py:877).
    """
    iou = rotated_iou_matrix(np.asarray(boxes, np.float32),
                             np.asarray(qboxes, np.float32), criterion=-1)
    return np.asarray(iou) > 1e-6
