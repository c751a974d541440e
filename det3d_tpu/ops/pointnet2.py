"""PointNet++ primitive ops, TPU-native.

Parity: det3d/ops/pointnet2/pointnet2_utils.py — furthest_point_sample
(:53), gather_operation (:83), three_nn (:120), three_interpolate (:152),
grouping_operation (:209), ball_query (:260). The reference dispatches each
to a CUDA kernel (pointnet2/_ext, src/*.cu); here every op is one
fixed-shape XLA program so the whole PointNet++ stack fuses into the
surrounding jit.

Layout is channels-LAST — points/features are (B, N, C) — the TPU-native
layout used framework-wide (the reference is channels-first (B, C, N)
because cuDNN wants it; the MXU does not care and the rest of this
framework is NHWC).

Design notes (why these shapes, not a port of the kernels):
* ``furthest_point_sample`` is the textbook O(npoint·N) iterative max-min;
  the CUDA kernel parallelizes the argmax tree per block, here the whole
  (B, N) distance update is one vectorized VPU step inside a
  ``lax.fori_loop`` (static trip count = npoint, jit-friendly).
* ``ball_query`` materializes a (chunk, N) squared-distance tile and picks
  the first ``nsample`` in-radius indices per center with ``top_k`` over
  index-keyed masks — identical semantics to the CUDA scan (first-found
  index fills when a ball has < nsample hits; index 0 when it is empty).
  Centers are processed in chunks via ``lax.map`` to bound the distance
  matrix at chunk·N instead of M·N.
* every op takes an optional ``valid`` mask so padded fixed-shape clouds
  (the framework's contract) behave like the reference's exact-size ones.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax


def square_distance(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise squared L2: a (..., M, D), b (..., N, D) -> (..., M, N).

    Expanded form (|a|^2 - 2ab + |b|^2) keeps the contraction on the MXU
    instead of materializing (M, N, D) differences.
    """
    a2 = jnp.sum(a * a, axis=-1)[..., :, None]
    b2 = jnp.sum(b * b, axis=-1)[..., None, :]
    ab = jnp.einsum("...md,...nd->...mn", a, b)
    return jnp.maximum(a2 - 2.0 * ab + b2, 0.0)


def furthest_point_sample(xyz: jnp.ndarray, npoint: int,
                          valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Iterative farthest-point sampling. xyz (B, N, 3) -> (B, npoint) int32.

    Starts from the first valid point (the CUDA kernel starts from index 0).
    Invalid points are never selected while any valid candidate remains with
    positive distance; selections degrade gracefully (repeat the argmax of a
    -inf field = index of the first max) if npoint exceeds the valid count.
    """
    b, n = xyz.shape[:2]
    if valid is None:
        valid = jnp.ones((b, n), bool)
    first = jnp.argmax(valid, axis=1).astype(jnp.int32)          # (B,)
    sel0 = jnp.zeros((b, npoint), jnp.int32)
    sel0 = sel0.at[:, 0].set(first)
    dist0 = jnp.where(valid, jnp.inf, -jnp.inf)                  # (B, N)

    def body(m, carry):
        dist, sel = carry
        last = lax.dynamic_index_in_dim(sel, m - 1, axis=1)      # (B, 1)
        cur = jnp.take_along_axis(xyz, last[:, :, None], axis=1)  # (B, 1, 3)
        d = jnp.sum((xyz - cur) ** 2, axis=-1)                   # (B, N)
        dist = jnp.minimum(dist, jnp.where(valid, d, -jnp.inf))
        nxt = jnp.argmax(dist, axis=1).astype(jnp.int32)
        sel = lax.dynamic_update_index_in_dim(sel, nxt[:, None], m, axis=1)
        return dist, sel

    _, sel = lax.fori_loop(1, npoint, body, (dist0, sel0))
    return sel


def gather_points(features: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """features (B, N, C), idx (B, M) -> (B, M, C).

    Parity: gather_operation (pointnet2_utils.py:83), channels-last.
    """
    return jnp.take_along_axis(features, idx[:, :, None], axis=1)


def group_points(features: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """features (B, N, C), idx (B, M, S) -> (B, M, S, C).

    Parity: grouping_operation (pointnet2_utils.py:209), channels-last.
    """
    b, m, s = idx.shape
    flat = jnp.take_along_axis(features, idx.reshape(b, m * s)[:, :, None],
                               axis=1)
    return flat.reshape(b, m, s, features.shape[-1])


def _ball_query_tile(d2, valid, radius, nsample):
    """d2 (M', N) distances, valid (N,) -> first-nsample in-ball indices."""
    n = d2.shape[-1]
    inball = (d2 < radius * radius) & valid[None, :]
    key = jnp.where(inball, jnp.arange(n, dtype=jnp.int32), n)
    # top_k of -key = the nsample SMALLEST keys, i.e. the first hits in
    # point order — exactly the CUDA kernel's sequential-scan semantics.
    negk, _ = lax.top_k(-key, nsample)
    idx = -negk                                                   # ascending
    found = idx < n
    first = idx[..., :1]
    idx = jnp.where(found, idx, first)           # pad with the first hit
    idx = jnp.where(idx == n, 0, idx)            # empty ball -> index 0
    return idx.astype(jnp.int32), found


def ball_query(xyz: jnp.ndarray, new_xyz: jnp.ndarray, radius: float,
               nsample: int, valid: Optional[jnp.ndarray] = None,
               chunk: int = 1024) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """xyz (B, N, 3), new_xyz (B, M, 3) -> (idx (B, M, nsample) int32,
    found (B, M, nsample) bool).

    Parity: ball_query (pointnet2_utils.py:260). ``found`` is extra (the
    reference pads silently; consumers here can mask).  Centers are
    processed ``chunk`` at a time so peak memory is chunk·N, not M·N.
    """
    b, n = xyz.shape[:2]
    m = new_xyz.shape[1]
    if valid is None:
        valid = jnp.ones((b, n), bool)

    def one_sample(args):
        pts, centers, vld = args
        if m <= chunk:
            d2 = square_distance(centers, pts)
            return _ball_query_tile(d2, vld, radius, nsample)
        pad = (-m) % chunk
        cpad = jnp.pad(centers, ((0, pad), (0, 0)))
        cch = cpad.reshape(-1, chunk, 3)

        def one_chunk(c):
            return _ball_query_tile(square_distance(c, pts), vld,
                                    radius, nsample)

        idx, found = lax.map(one_chunk, cch)
        return (idx.reshape(-1, nsample)[:m], found.reshape(-1, nsample)[:m])

    return jax.vmap(lambda p, c, v: one_sample((p, c, v)))(xyz, new_xyz,
                                                           valid)


def three_nn(unknown: jnp.ndarray, known: jnp.ndarray,
             valid: Optional[jnp.ndarray] = None
             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """unknown (B, M, 3), known (B, N, 3) -> (dist (B, M, 3), idx (B, M, 3)).

    Parity: three_nn (pointnet2_utils.py:120) — the 3 nearest known points
    per unknown point, distances in ascending order (Euclidean, not
    squared, matching the CUDA kernel's sqrt output).
    """
    d2 = square_distance(unknown, known)                          # (B, M, N)
    if valid is not None:
        d2 = jnp.where(valid[:, None, :], d2, jnp.inf)
    neg, idx = lax.top_k(-d2, 3)
    return jnp.sqrt(jnp.maximum(-neg, 0.0)), idx.astype(jnp.int32)


def three_interpolate(features: jnp.ndarray, idx: jnp.ndarray,
                      weight: jnp.ndarray) -> jnp.ndarray:
    """features (B, N, C), idx (B, M, 3), weight (B, M, 3) -> (B, M, C).

    Parity: three_interpolate (pointnet2_utils.py:152), channels-last.
    """
    gathered = group_points(features, idx)                        # (B,M,3,C)
    return jnp.sum(gathered * weight[..., None], axis=2)


def interpolation_weights(dist: jnp.ndarray, eps: float = 1e-8
                          ) -> jnp.ndarray:
    """Inverse-distance weights over the 3 NN (PointnetFPModule's recipe,
    pointnet2_modules.py:425-428): w_i = (1/d_i) / sum_j (1/d_j)."""
    recip = 1.0 / (dist + eps)
    return recip / jnp.sum(recip, axis=-1, keepdims=True)
