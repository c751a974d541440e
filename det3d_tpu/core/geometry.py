"""Rotated-box intersection geometry, fully vectorized for TPU/XLA.

One kernel replaces the reference's four separate native rotated-IoU
implementations (reference: det3d/ops/nms/nms_gpu.py:500 ``rotate_iou_kernel``,
det3d/ops/iou3d/src/iou3d_kernel.cu, det3d/ops/box2d_iou_rotated/src,
det3d/datasets/utils/kitti_object_eval_python/rotate_iou.py:249
``rotate_iou_gpu_eval``). Algorithm: sort-free Liang-Barsky edge clipping —
the boundary of A∩B is (∂A∩B) ∪ (∂B∩A) and the shoelace integral is additive
over directed segments in any order, so each edge's clipped contribution is
accumulated directly, in structure-of-arrays layout (pair dims stay in the
TPU lane dimension). All shapes static; one fused XLA program, no scalar
loops, no sorts, no gathers. See docs/DESIGN_NOTES.md §2.

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



def _ccw(corners):
    """Force counterclockwise winding. (..., 4, 2) -> (..., 4, 2)."""
    area2 = (
        _cross2(corners[..., 0, :], corners[..., 1, :], corners[..., 2, :])
        + _cross2(corners[..., 0, :], corners[..., 2, :], corners[..., 3, :]))
    return jnp.where((area2 >= 0)[..., None, None], corners,
                     corners[..., ::-1, :])


def _clip_contrib(px, py, qx, qy, open_side):
    """Shoelace contribution of quad-P edges Liang-Barsky-clipped to quad Q.

    px/py/qx/qy: length-4 lists of (...)-shaped coordinate arrays, CCW.
    ``open_side``: clip against the open interior of Q (excludes segments
    lying exactly on Q's boundary — used for the second quad so coincident
    boundary pieces are counted once, not twice).

    All geometry dims are unrolled in Python so every array op runs on
    full (...)-shaped tensors — the batch/pair dims stay in the TPU lane
    dimension instead of being buried under (4, 2) minor axes.
    """
    total = 0.0
    for i in range(4):
        x1, y1 = px[i], py[i]
        x2, y2 = px[(i + 1) % 4], py[(i + 1) % 4]
        dx, dy = x2 - x1, y2 - y1
        t_lo = jnp.zeros_like(x1)
        t_hi = jnp.ones_like(x1)
        ok = jnp.ones(x1.shape, bool)
        for j in range(4):
            ex = qx[(j + 1) % 4] - qx[j]
            ey = qy[(j + 1) % 4] - qy[j]
            # inside(t): cross(e, p(t) - q_j) = a + t*b >= 0
            a = ex * (y1 - qy[j]) - ey * (x1 - qx[j])
            b = ex * dy - ey * dx
            b_safe = jnp.where(jnp.abs(b) > _EPS, b, 1.0)
            tj = -a / b_safe
            moving = jnp.abs(b) > _EPS
            t_lo = jnp.where(moving & (b > 0), jnp.maximum(t_lo, tj), t_lo)
            t_hi = jnp.where(moving & (b < 0), jnp.minimum(t_hi, tj), t_hi)
            # parallel edge: whole segment in/out of this half-plane
            border_ok = (a > _EPS) if open_side else (a >= -_EPS)
            ok = ok & (moving | border_ok)
        valid = ok & (t_lo < t_hi)
        sx1 = x1 + t_lo * dx
        sy1 = y1 + t_lo * dy
        sx2 = x1 + t_hi * dx
        sy2 = y1 + t_hi * dy
        total = total + jnp.where(valid, sx1 * sy2 - sx2 * sy1, 0.0)
    return total


def rotated_intersection_area(corners_a, corners_b):
    """Intersection area of two convex quads. (..., 4, 2) x2 -> (...,).

    Sort-free formulation: the boundary of A∩B is (∂A∩B) ∪ (∂B∩A), and the
    shoelace line integral ∮(x dy − y dx) is additive over directed boundary
    segments in any order, so each edge is clipped to the other quad
    (Liang-Barsky interval clip) and its contribution accumulated directly.
    B's edges clip against the *open* interior of A so exactly-coincident
    boundary runs are counted once. Replaces the candidate-point +
    angular-argsort construction, which forced (…,24,2)-shaped sorts and
    gathers in the two minor axes — catastrophic TPU tiling.
    """
    A = _ccw(corners_a)
    B = _ccw(corners_b)
    ax = [A[..., i, 0] for i in range(4)]
    ay = [A[..., i, 1] for i in range(4)]
    bx = [B[..., i, 0] for i in range(4)]
    by = [B[..., i, 1] for i in range(4)]
    total = (_clip_contrib(ax, ay, bx, by, open_side=False)
             + _clip_contrib(bx, by, ax, ay, open_side=True))
    return jnp.maximum(0.5 * total, 0.0)


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
    # rotate into box frame: corners are R(-theta) @ local + center
    # (box_np_ops.rotation_2d convention), so local = R(theta) @ rel
    x = rel[..., 0] * c[None, :] - rel[..., 1] * s[None, :]
    y = rel[..., 0] * s[None, :] + rel[..., 1] * c[None, :]
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
