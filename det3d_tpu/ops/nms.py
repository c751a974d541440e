"""Fixed-shape greedy NMS (rotated and axis-aligned) for TPU.

Replaces the reference's CUDA bitmask kernels (reference: det3d/ops/nms/
nms_gpu.py:68 ``nms_kernel``, :420 ``rotate_nms_kernel``; wrapped by
det3d/core/bbox/box_torch_ops.py:506 ``nms`` and :528 ``rotate_nms``).

Design: top-k by score to ``pre_max_size`` (static), one fused pairwise-IoU
matrix, then a greedy suppression scan expressed as ``lax.fori_loop`` over the
score-sorted order — identical keep set as the sequential reference algorithm.
Outputs are fixed-size index arrays plus a validity mask, so the op composes
under jit/vmap (ragged results are resolved on the host at the very end of
prediction).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp

from det3d_tpu.core import box_ops
from det3d_tpu.core.geometry import box_to_corners, rotated_intersection_area

_NEG = -1e9


def _rotated_backend() -> str:
    """'pallas' on real TPU (the fused VMEM kernel), 'xla' elsewhere.
    Override with DET3D_TPU_NMS=pallas|xla."""
    forced = os.environ.get("DET3D_TPU_NMS")
    if forced in ("pallas", "xla"):
        return forced
    return "pallas" if jax.devices()[0].platform == "tpu" else "xla"


def _pairwise_rotated_iou_from_corners(corners):
    """corners: (K, 4, 2) -> (K, K) IoU."""
    k = corners.shape[0]
    ca = jnp.broadcast_to(corners[:, None], (k, k, 4, 2))
    cb = jnp.broadcast_to(corners[None, :], (k, k, 4, 2))
    inter = rotated_intersection_area(ca, cb)
    # polygon area from corners (boxes may carry w*l but corners are canonical)
    nxt = jnp.roll(corners, -1, axis=-2)
    area = 0.5 * jnp.abs(
        (corners[..., 0] * nxt[..., 1] - nxt[..., 0] * corners[..., 1]).sum(-1))
    union = area[:, None] + area[None, :] - inter
    return jnp.where(union > 0, inter / jnp.where(union > 0, union, 1.0), 0.0)


def _pairwise_standup_iou(boxes_standup):
    """boxes_standup: (K, 4) [x1,y1,x2,y2] -> (K, K) IoU."""
    return box_ops.iou_matrix(boxes_standup, boxes_standup)


def _greedy_suppress(iou, valid, iou_threshold):
    """Greedy NMS over score-descending order, as a parallel fixpoint.

    The sequential greedy scan solves ``keep[j] = valid[j] and not
    exists i<j: keep[i] and iou[i,j] > thr``. Because the suppression
    relation is a strictly upper-triangular DAG, Jacobi iteration of that
    equation converges to the (unique) greedy solution in at most
    longest-suppression-chain steps — each step one (K,K) masked reduction,
    which the VPU eats, instead of K sequential loop iterations (the naive
    ``fori_loop`` costs ~0.6ms/iteration of loop overhead on TPU).

    iou: (K, K) of already-sorted boxes. valid: (K,) bool. Returns keep (K,).
    """
    k = iou.shape[0]
    idx = jnp.arange(k)
    sup = (iou > iou_threshold) & (idx[:, None] < idx[None, :]) \
        & valid[:, None] & valid[None, :]

    def cond(state):
        keep, prev, it = state
        return jnp.any(keep != prev) & (it < k)

    def body(state):
        keep, _, it = state
        suppressed = jnp.any(sup & keep[:, None], axis=0)
        return valid & ~suppressed, keep, it + 1

    keep, _, _ = jax.lax.while_loop(
        cond, body, (valid, jnp.zeros_like(valid), jnp.int32(0)))
    return keep


@partial(jax.jit, static_argnames=("pre_max_size", "post_max_size",
                                   "iou_threshold", "rotated"))
def nms(boxes_for_nms, scores, *, pre_max_size: int, post_max_size: int,
        iou_threshold: float, rotated: bool = True):
    """Greedy NMS with fixed output size.

    boxes_for_nms: (N, 5) rotated BEV boxes [x, y, w, l, r] when ``rotated``,
      else (N, 4) standup [x1, y1, x2, y2].
    scores: (N,) — entries below the caller's score threshold must already be
      masked to a negative value (they are treated as invalid).

    Returns (indices, valid): (post_max_size,) int32 indices into the input
    and a bool mask; index order is score-descending, matching the
    sequential reference output order.
    """
    n = scores.shape[0]
    k = min(pre_max_size, n)
    top_scores, top_idx = jax.lax.top_k(scores, k)
    valid = top_scores > 0.0  # masked/threshold-failed scores are <= 0

    if rotated:
        if _rotated_backend() == "pallas":
            from det3d_tpu.ops.nms_pallas import rotated_nms_keep
            keep = rotated_nms_keep(boxes_for_nms[top_idx], valid,
                                    iou_threshold)
        else:
            corners = box_to_corners(boxes_for_nms[top_idx])
            iou = _pairwise_rotated_iou_from_corners(corners)
            keep = _greedy_suppress(iou, valid, iou_threshold)
    else:
        iou = _pairwise_standup_iou(boxes_for_nms[top_idx])
        keep = _greedy_suppress(iou, valid, iou_threshold)

    # compact kept entries (already score-ordered) to post_max_size slots
    rank_key = jnp.where(keep, jnp.arange(k), k + 1)
    order = jnp.argsort(rank_key)[:post_max_size]
    out_valid = keep[order]
    out_idx = jnp.where(out_valid, top_idx[order], 0)
    return out_idx.astype(jnp.int32), out_valid


def rotate_nms(boxes_bev, scores, pre_max_size, post_max_size, iou_threshold):
    """Rotated NMS. Parity: box_torch_ops.rotate_nms (:528)."""
    return nms(boxes_bev, scores, pre_max_size=pre_max_size,
               post_max_size=post_max_size, iou_threshold=iou_threshold,
               rotated=True)


def standup_nms(boxes_standup, scores, pre_max_size, post_max_size,
                iou_threshold):
    """Axis-aligned NMS on standup boxes. Parity: box_torch_ops.nms (:506)."""
    return nms(boxes_standup, scores, pre_max_size=pre_max_size,
               post_max_size=post_max_size, iou_threshold=iou_threshold,
               rotated=False)
