"""3D box math: encode/decode, corners, rotations, standup IoU.

Array-namespace generic: every function works on numpy arrays (host data
pipeline) and on jax arrays / tracers (inside jit). Behavior parity targets
the reference numpy implementations (reference: det3d/core/bbox/box_np_ops.py
— second_box_encode :52, second_box_decode :116, corners_nd :214,
rotation_2d :334, center_to_corner_box3d :345, iou_jit :956) and their torch
mirrors (det3d/core/bbox/box_torch_ops.py).

Box layout (lidar frame, z-center): ``[x, y, z, w, l, h, (vx, vy,) theta]``.
Anchors and targets use the same layout; 9-dim boxes carry velocities for
nuScenes.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def _xp(*arrays):
    """Pick the array namespace: jnp when any input is a jax array/tracer."""
    for a in arrays:
        if isinstance(a, (jax.Array, jax.core.Tracer)):
            return jnp
    return np


# ---------------------------------------------------------------------------
# encode / decode (SECOND parametrization)
# ---------------------------------------------------------------------------

def second_box_encode(boxes, anchors, encode_angle_to_vector=False, smooth_dim=False,
                      norm_velo=False):
    """Encode gt boxes against anchors.

    Center offsets are normalized by the anchor BEV diagonal, z by anchor
    height, dims log-encoded (or ratio-1 when ``smooth_dim``), angle either as
    a residual or as a (cos, sin) vector difference. 9-dim boxes additionally
    carry velocity residuals. Parity: box_np_ops.py:52-113.
    """
    xp = _xp(boxes, anchors)
    ndim = anchors.shape[-1]
    xa, ya, za = anchors[..., 0:1], anchors[..., 1:2], anchors[..., 2:3]
    wa, la, ha = anchors[..., 3:4], anchors[..., 4:5], anchors[..., 5:6]
    ra = anchors[..., ndim - 1:ndim]
    xg, yg, zg = boxes[..., 0:1], boxes[..., 1:2], boxes[..., 2:3]
    wg, lg, hg = boxes[..., 3:4], boxes[..., 4:5], boxes[..., 5:6]
    rg = boxes[..., ndim - 1:ndim]

    diagonal = xp.sqrt(la ** 2 + wa ** 2)
    xt = (xg - xa) / diagonal
    yt = (yg - ya) / diagonal
    zt = (zg - za) / ha
    if smooth_dim:
        lt = lg / la - 1.0
        wt = wg / wa - 1.0
        ht = hg / ha - 1.0
    else:
        lt = xp.log(lg / la)
        wt = xp.log(wg / wa)
        ht = xp.log(hg / ha)
    parts = [xt, yt, zt, wt, lt, ht]

    if ndim > 7:
        vxa, vya = anchors[..., 6:7], anchors[..., 7:8]
        vxg, vyg = boxes[..., 6:7], boxes[..., 7:8]
        if norm_velo:
            parts.extend([(vxg - vxa) / diagonal, (vyg - vya) / diagonal])
        else:
            parts.extend([vxg - vxa, vyg - vya])

    if encode_angle_to_vector:
        parts.extend([xp.cos(rg) - xp.cos(ra), xp.sin(rg) - xp.sin(ra)])
    else:
        parts.append(rg - ra)
    return xp.concatenate(parts, axis=-1)


def second_box_decode(box_encodings, anchors, encode_angle_to_vector=False,
                      smooth_dim=False, norm_velo=False):
    """Inverse of :func:`second_box_encode`. Parity: box_np_ops.py:116-198."""
    xp = _xp(box_encodings, anchors)
    ndim = anchors.shape[-1]
    xa, ya, za = anchors[..., 0:1], anchors[..., 1:2], anchors[..., 2:3]
    wa, la, ha = anchors[..., 3:4], anchors[..., 4:5], anchors[..., 5:6]
    ra = anchors[..., ndim - 1:ndim]
    xt, yt, zt = box_encodings[..., 0:1], box_encodings[..., 1:2], box_encodings[..., 2:3]
    wt, lt, ht = box_encodings[..., 3:4], box_encodings[..., 4:5], box_encodings[..., 5:6]

    diagonal = xp.sqrt(la ** 2 + wa ** 2)
    xg = xt * diagonal + xa
    yg = yt * diagonal + ya
    zg = zt * ha + za
    if smooth_dim:
        lg = (lt + 1.0) * la
        wg = (wt + 1.0) * wa
        hg = (ht + 1.0) * ha
    else:
        lg = xp.exp(lt) * la
        wg = xp.exp(wt) * wa
        hg = xp.exp(ht) * ha
    parts = [xg, yg, zg, wg, lg, hg]

    off = 6
    if ndim > 7:
        vxa, vya = anchors[..., 6:7], anchors[..., 7:8]
        vxt, vyt = box_encodings[..., 6:7], box_encodings[..., 7:8]
        if norm_velo:
            parts.extend([vxt * diagonal + vxa, vyt * diagonal + vya])
        else:
            parts.extend([vxt + vxa, vyt + vya])
        off = 8

    if encode_angle_to_vector:
        rtx = box_encodings[..., off:off + 1]
        rty = box_encodings[..., off + 1:off + 2]
        rg = xp.arctan2(rty + xp.sin(ra), rtx + xp.cos(ra))
    else:
        rg = box_encodings[..., off:off + 1] + ra
    parts.append(rg)
    return xp.concatenate(parts, axis=-1)


# ---------------------------------------------------------------------------
# corners / rotations
# ---------------------------------------------------------------------------

def corners_nd(dims, origin=0.5):
    """Generate unit-box corner offsets scaled by dims.

    dims: (N, ndim). Returns (N, 2**ndim, ndim) corners around the origin
    fraction. Corner ordering matches the reference (box_np_ops.py:214-254):
    for ndim=2 -> (-w/2,-l/2), (-w/2,l/2), (w/2,l/2), (w/2,-l/2) for
    origin=0.5 in the reference's x-major, last-dim-reversed-for-odd order.
    """
    xp = _xp(dims)
    ndim = int(dims.shape[-1])
    corners_norm = np.stack(
        np.unravel_index(np.arange(2 ** ndim), [2] * ndim), axis=1
    ).astype(np.float32)
    # reference ordering: reverse middle elements for a convex traversal
    if ndim == 2:
        corners_norm = corners_norm[[0, 1, 3, 2]]
    elif ndim == 3:
        corners_norm = corners_norm[[0, 1, 3, 2, 4, 5, 7, 6]]
    corners_norm = corners_norm - np.asarray(origin, dtype=np.float32)
    if xp is jnp:
        corners_norm = jnp.asarray(corners_norm, dtype=dims.dtype)
    else:
        corners_norm = corners_norm.astype(dims.dtype)
    return dims.reshape(-1, 1, ndim) * corners_norm.reshape(1, 2 ** ndim, ndim)


def rotation_2d(points, angles):
    """Rotate (N, P, 2) points by per-box angles (N,).

    Matches reference box_np_ops.rotation_2d (:334): counterclockwise when
    angle is positive (note the reference composes with einsum 'aij,jka->aik',
    equivalent to p @ [[c, s], [-s, c]] with rot_mat_T stacked as
    [[c, -s], [s, c]] transposed)."""
    xp = _xp(points, angles)
    c, s = xp.cos(angles), xp.sin(angles)
    # rows indexed by input dim, cols by output dim: out = p @ [[c,-s],[s,c]]
    row0 = xp.stack([c, -s], axis=-1)    # (N, 2)
    row1 = xp.stack([s, c], axis=-1)
    rot = xp.stack([row0, row1], axis=-2)  # (N, 2, 2)
    return xp.einsum("npi,nij->npj", points, rot)


def rotation_3d_in_axis(points, angles, axis=2):
    """Rotate (N, P, 3) points around one axis. Parity: box_np_ops.py:295-331."""
    xp = _xp(points, angles)
    c, s = xp.cos(angles), xp.sin(angles)
    ones, zeros = xp.ones_like(c), xp.zeros_like(c)
    # rows indexed by input dim, cols by output dim (matches the reference's
    # rot_mat_T stacking + 'aij,jka->aik' einsum exactly, incl. its axis-0
    # permuted form — box_np_ops.py:358-391)
    if axis == 2 or axis == -1:
        rot = xp.stack([
            xp.stack([c, -s, zeros], axis=-1),
            xp.stack([s, c, zeros], axis=-1),
            xp.stack([zeros, zeros, ones], axis=-1),
        ], axis=-2)
    elif axis == 1:
        rot = xp.stack([
            xp.stack([c, zeros, -s], axis=-1),
            xp.stack([zeros, ones, zeros], axis=-1),
            xp.stack([s, zeros, c], axis=-1),
        ], axis=-2)
    elif axis == 0:
        rot = xp.stack([
            xp.stack([zeros, c, -s], axis=-1),
            xp.stack([zeros, s, c], axis=-1),
            xp.stack([ones, zeros, zeros], axis=-1),
        ], axis=-2)
    else:
        raise ValueError("axis must be 0, 1 or 2")
    return xp.einsum("npi,nij->npj", points, rot)


def center_to_corner_box2d(centers, dims, angles=None, origin=0.5):
    """(N,2) centers + (N,2) dims + (N,) angles -> (N,4,2) BEV corners.
    Parity: box_np_ops.py:404-432."""
    xp = _xp(centers, dims, angles)
    corners = corners_nd(dims, origin=origin)
    if angles is not None:
        corners = rotation_2d(corners, angles)
    return corners + centers.reshape(-1, 1, 2)


def center_to_corner_box3d(centers, dims, angles=None, origin=(0.5, 0.5, 0.5), axis=2):
    """(N,3) centers/dims + angles -> (N,8,3) corners. Parity: box_np_ops.py:345-380."""
    corners = corners_nd(dims, origin=origin)
    if angles is not None:
        corners = rotation_3d_in_axis(corners, angles, axis=axis)
    return corners + centers.reshape(-1, 1, 3)


def corner_to_standup_nd(corners):
    """(N, C, ndim) corners -> (N, 2*ndim) axis-aligned [min..., max...] boxes.
    Parity: box_np_ops.py:470."""
    xp = _xp(corners)
    return xp.concatenate([corners.min(axis=1), corners.max(axis=1)], axis=-1)


def limit_period(val, offset=0.5, period=np.pi):
    """Wrap val into [-offset*period, (1-offset)*period). Parity: box_np_ops.py:496."""
    xp = _xp(val)
    return val - xp.floor(val / period + offset) * period


# ---------------------------------------------------------------------------
# axis-aligned IoU (standup boxes) — similarity for nearest_iou matching
# ---------------------------------------------------------------------------

def iou_matrix(boxes, qboxes, eps=0.0):
    """Pairwise IoU of axis-aligned [x1, y1, x2, y2] boxes.

    boxes: (N, 4), qboxes: (K, 4) -> (N, K). Parity: box_np_ops.iou_jit (:956),
    including its +eps area convention (eps=1.0 for pixel boxes, 0.0 here).
    """
    xp = _xp(boxes, qboxes)
    lt = xp.maximum(boxes[:, None, :2], qboxes[None, :, :2])
    rb = xp.minimum(boxes[:, None, 2:4], qboxes[None, :, 2:4])
    wh = xp.maximum(rb - lt + eps, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (boxes[:, 2] - boxes[:, 0] + eps) * (boxes[:, 3] - boxes[:, 1] + eps)
    area_b = (qboxes[:, 2] - qboxes[:, 0] + eps) * (qboxes[:, 3] - qboxes[:, 1] + eps)
    union = area_a[:, None] + area_b[None, :] - inter
    return xp.where(union > 0, inter / xp.where(union > 0, union, 1.0), 0.0)


def rbbox2d_to_near_bbox(rbboxes):
    """Convert rotated BEV boxes [x, y, w, l, r] to their nearest axis-aligned
    box [x1, y1, x2, y2]: if the (period-limited) rotation is closer to pi/2
    the w/l extents swap. Parity: box_np_ops.rbbox2d_to_near_bbox (:1040)."""
    xp = _xp(rbboxes)
    rots = rbboxes[..., -1]
    rots_0_pi_div_2 = xp.abs(limit_period(rots, 0.5, np.pi))
    cond = (rots_0_pi_div_2 > np.pi / 4)[..., None]
    dims_swapped = xp.concatenate(
        [rbboxes[..., 0:2], rbboxes[..., 3:4], rbboxes[..., 2:3]], axis=-1)
    bboxes_center = xp.where(cond, dims_swapped, rbboxes[..., :4])
    centers, dims = bboxes_center[..., :2], bboxes_center[..., 2:]
    return xp.concatenate([centers - dims / 2, centers + dims / 2], axis=-1)


def center_to_minmax_2d(centers, dims):
    """(N,2),(N,2) -> (N,4) [x1,y1,x2,y2]. Parity: box_np_ops.py:489."""
    xp = _xp(centers, dims)
    return xp.concatenate([centers - dims / 2, centers + dims / 2], axis=-1)


# ---------------------------------------------------------------------------
# camera <-> lidar frame conversions (KITTI). Parity: box_np_ops.py:900-952
# ---------------------------------------------------------------------------

def project_to_image(points_3d, proj_mat):
    """Camera-frame 3D points -> image pixels via P (3x4 or 4x4)."""
    xp = _xp(points_3d)
    pad = xp.zeros(points_3d.shape[:-1] + (1,), dtype=points_3d.dtype)
    points_4 = xp.concatenate([points_3d, pad], axis=-1)
    point_2d = points_4 @ proj_mat.T
    return point_2d[..., :2] / point_2d[..., 2:3]


def camera_to_lidar(points, r_rect, velo2cam):
    xp = _xp(points)
    if points.shape[-1] == 3:
        ones = xp.ones(points.shape[:-1] + (1,), dtype=points.dtype)
        points = xp.concatenate([points, ones], axis=-1)
    lidar_points = points @ np.linalg.inv(np.asarray(r_rect @ velo2cam).T) \
        if xp is np else points @ jnp.linalg.inv((r_rect @ velo2cam).T)
    return lidar_points[..., :3]


def lidar_to_camera(points, r_rect, velo2cam):
    xp = _xp(points)
    if points.shape[-1] == 3:
        ones = xp.ones(points.shape[:-1] + (1,), dtype=points.dtype)
        points = xp.concatenate([points, ones], axis=-1)
    camera_points = points @ (r_rect @ velo2cam).T
    return camera_points[..., :3]


def box_camera_to_lidar(data, r_rect, velo2cam):
    """Camera boxes [x,y,z,l,h,w,r] -> lidar boxes [x,y,z,w,l,h,r]."""
    xp = _xp(data)
    xyz_lidar = camera_to_lidar(data[:, 0:3], r_rect, velo2cam)
    l, h, w, r = data[:, 3:4], data[:, 4:5], data[:, 5:6], data[:, 6:7]
    return xp.concatenate([xyz_lidar, w, l, h, r], axis=1)


def box_lidar_to_camera(data, r_rect, velo2cam):
    """Lidar boxes [x,y,z,w,l,h,r] -> camera boxes [x,y,z,l,h,w,r]."""
    xp = _xp(data)
    xyz = lidar_to_camera(data[:, 0:3], r_rect, velo2cam)
    w, l, h, r = data[:, 3:4], data[:, 4:5], data[:, 5:6], data[:, 6:7]
    return xp.concatenate([xyz, l, h, w, r], axis=1)


def change_box3d_center_(box3d, src, dst):
    """In-place (numpy) origin shift of boxes. Parity: box_np_ops.py:1346."""
    dst = np.asarray(dst, dtype=box3d.dtype)
    src = np.asarray(src, dtype=box3d.dtype)
    box3d[..., :3] += box3d[..., 3:6] * (dst - src)
    return box3d
