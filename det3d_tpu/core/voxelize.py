"""Fixed-shape on-device voxelization.

The reference voxelizes on CPU inside DataLoader workers with a sequential
numba kernel (reference: det3d/ops/point_cloud/point_cloud_ops.py:7-203
``_points_to_voxel_reverse_kernel`` / ``points_to_voxel``; wrapped by
det3d/core/input/voxel_generator.py:5-43). The TPU design inverts this: a
sort-based, atomic-free scatter runs on device with static shapes, so
voxelization fuses into the jitted train/eval step.

Algorithm (per cloud):
  1. quantize points to integer voxel coords; out-of-range / padding -> sentinel
  2. stable-sort point indices by linear voxel id -> contiguous segments
  3. segment heads found by neighbor comparison; per-segment first-appearance
     order reproduces the reference's first-come voxel ordering
  4. scatter points into (max_voxels, max_points, C) with per-voxel slot =
     position within segment, dropping overflow (cap semantics)

Semantics parity: identical voxel set / contents / ordering as the numba
kernel whenever max_voxels is not exceeded. When it is, the reference stops
consuming points entirely (`break` at point_cloud_ops.py:47); we instead keep
the first max_voxels voxels by appearance and drop later voxels only — a
strictly-more-useful superset that matters only in overflow.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

_SENTINEL = np.iinfo(np.int32).max


@partial(jax.jit, static_argnames=("voxel_size", "pc_range", "grid_size",
                                   "max_voxels", "max_points", "order"))
def voxelize(points, num_points, *, voxel_size: Tuple[float, ...],
             pc_range: Tuple[float, ...], grid_size: Tuple[int, int, int],
             max_voxels: int, max_points: int, order: str = "appearance",
             lin=None, perm=None):
    """Voxelize one padded point cloud.

    points: (P, C) float32, first 3 channels are xyz; rows >= num_points are
      padding and ignored.
    num_points: scalar int32 count of valid rows.
    grid_size: (gx, gy, gz) ints.
    order: voxel row ordering. "appearance" reproduces the reference numba
      kernel's first-come ordering exactly (costs an extra sort + three
      P-row scatter/gathers); under overflow with shuffled points it keeps
      voxels point-density-WEIGHTED — object clusters preferentially
      survive. "hashed" emits voxels in bijective-hash key order — every
      consumer in the framework (canvas scatter, rulebooks, masked BN) is
      voxel-order invariant, and this path issues ~half the
      descriptor-bound P-row ops (measured ~2x faster at KITTI scale) —
      but its overflow drop is uniform over voxels (density-blind): use it
      when max_voxels cannot overflow (the voxel SET is then identical).
      Point order WITHIN a voxel is original-appearance in both modes.

    Returns dict:
      voxels:  (max_voxels, max_points, C) float32
      coords:  (max_voxels, 3) int32 zyx (reverse index, like the reference)
      num_points_per_voxel: (max_voxels,) int32
      num_voxels: () int32
    """
    P, C = points.shape
    gx, gy, gz = grid_size

    if lin is None:
        lin = _quantize(points, num_points, voxel_size, pc_range, grid_size)
    # ``lin`` override: host-precomputed ids (ops/sparse_host.py::point_lin)
    # — the single source of truth when a host rulebook plan rides along, so
    # host and device can never disagree on a float rounding at a voxel
    # boundary. The host quantizes only valid in-range points (sentinel
    # elsewhere), exactly like _quantize.

    if order in ("hashed", "yxz"):
        return _voxelize_hashed(points, lin, (gx, gy, gz), max_voxels,
                                max_points, key_mode=order, perm=perm)

    order = jnp.argsort(lin, stable=True)                    # (P,) point perm
    slin = lin[order]
    svalid = slin != _SENTINEL
    head = svalid & jnp.concatenate(
        [jnp.ones((1,), bool), slin[1:] != slin[:-1]])
    seg_id = jnp.cumsum(head.astype(jnp.int32)) - 1          # (P,), -1 preheads
    seg_id = jnp.maximum(seg_id, 0)

    # first original-point index per segment -> appearance ordering
    first_pt = jax.ops.segment_min(
        jnp.where(svalid, order, _SENTINEL), seg_id, num_segments=P)
    appear_order = jnp.argsort(first_pt)                     # seg ids by appearance
    seg_rank = jnp.zeros((P,), jnp.int32).at[appear_order].set(
        jnp.arange(P, dtype=jnp.int32))                      # seg_id -> voxel slot

    seg_start = jax.ops.segment_min(
        jnp.where(svalid, jnp.arange(P, dtype=jnp.int32), _SENTINEL),
        seg_id, num_segments=P)

    slot_v = seg_rank[seg_id]                                # (P,) voxel slot
    slot_p = jnp.arange(P, dtype=jnp.int32) - seg_start[seg_id]
    write = svalid & (slot_v < max_voxels) & (slot_p < max_points)

    slot_v_w = jnp.where(write, slot_v, max_voxels)          # OOB -> dropped
    slot_p_w = jnp.where(write, slot_p, max_points)

    voxels = jnp.zeros((max_voxels, max_points, C), points.dtype)
    voxels = voxels.at[slot_v_w, slot_p_w].set(points[order], mode="drop")

    num_per_voxel = jnp.zeros((max_voxels,), jnp.int32).at[slot_v_w].add(
        write.astype(jnp.int32), mode="drop")

    head_write = head & (slot_v < max_voxels)
    safe_lin = jnp.where(slin != _SENTINEL, slin, 0)
    coords_zyx = jnp.stack([safe_lin // (gx * gy),
                            (safe_lin // gx) % gy,
                            safe_lin % gx], axis=-1)         # (P, 3) zyx sorted
    out_coords = jnp.full((max_voxels, 3), -1, jnp.int32).at[
        jnp.where(head_write, slot_v, max_voxels)].set(coords_zyx, mode="drop")

    num_voxels = jnp.minimum(jnp.sum(head.astype(jnp.int32)), max_voxels)
    return {
        "voxels": voxels,
        "coords": out_coords,
        "num_points_per_voxel": num_per_voxel,
        "num_voxels": num_voxels,
    }


def _quantize(points, num_points, voxel_size, pc_range, grid_size):
    """Points -> xyz-major linear voxel ids (sentinel: padding/out of range).
    Host twin: ops/sparse_host.py::point_lin."""
    P = points.shape[0]
    gx, gy, gz = grid_size
    vsize = jnp.asarray(voxel_size, points.dtype)
    vmin = jnp.asarray(pc_range[:3], points.dtype)
    valid = jnp.arange(P, dtype=jnp.int32) < num_points
    coords = jnp.floor((points[:, :3] - vmin) / vsize).astype(jnp.int32)
    in_range = (
        valid
        & (coords[:, 0] >= 0) & (coords[:, 0] < gx)
        & (coords[:, 1] >= 0) & (coords[:, 1] < gy)
        & (coords[:, 2] >= 0) & (coords[:, 2] < gz)
    )
    lin = coords[:, 0] + coords[:, 1] * gx + coords[:, 2] * (gx * gy)
    return jnp.where(in_range, lin, _SENTINEL)


def _mix32(x):
    """Murmur3 finalizer: a bijective mix on uint32."""
    x = x.astype(jnp.uint32)
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    return x


def _sort_key(lin, grid_size, key_mode):
    """Sort key selecting the voxel row ordering of the fast path.

    "hashed": bijective hash — overflow drop is a uniform pseudo-random
    voxel subset. "yxz": (y*gx + x)*gz + z rank key — rows come out in
    the sparse middles' bitmap rank order (they can then skip their res0
    argsort + row reorder entirely, middles' ``pre_ranked``); overflow
    drop is a (y, x) scan-line prefix — spatially biased like the
    reference numba kernel's consume-until-cap truncation
    (point_cloud_ops.py:47), so reserve "yxz" for configs whose cap does
    not saturate (e.g. KITTI SECOND: ~16k actives vs 20000 slots)."""
    gx, gy, gz = grid_size
    if key_mode == "yxz":
        xx = lin % gx
        yy = (lin // gx) % gy
        zz = lin // (gx * gy)
        key = (yy * gx + xx) * gz + zz
        return jnp.where(lin == _SENTINEL, _SENTINEL, key)
    return jnp.where(lin == _SENTINEL, jnp.uint32(0xFFFFFFFF),
                     _mix32(lin))


def _voxelize_hashed(points, lin, grid_size, max_voxels, max_points,
                     key_mode="hashed", perm=None):
    """Hashed- or yxz-key voxel ordering: the descriptor-minimal path.

    P-row (descriptor-bound) ops: one key+payload sort, one point gather,
    one voxel scatter, one head-payload scatter — vs the appearance path's
    two sorts + five scatter/gathers. Voxel coords come from delinearizing
    the carried linear ids (pure arithmetic, no gather); per-voxel counts
    from consecutive segment start positions (no scatter-add).

    The sort key is a bijective hash of the linear id (linear id itself as
    the tiebreak key, so equal-id points stay contiguous and segments are
    exact). On overflow the kept voxels are therefore a UNIFORM pseudo-random
    subset of the occupied voxels — spatially fair, unlike a plain
    sorted-linear-id prefix which would keep one corner of the scene. (The
    appearance path keeps first-come, which is fair only under the train
    pipeline's point shuffle; the reference numba kernel stops consuming
    entirely at the cap.)
    """
    P, C = points.shape
    gx, gy, _ = grid_size
    pos = jnp.arange(P, dtype=jnp.int32)

    if perm is None:
        key = _sort_key(lin, grid_size, key_mode)
        _, sorted_lin, perm = jax.lax.sort((key, lin, pos), num_keys=2)
    else:
        # host-precomputed sort order (ops/sparse_host.py::point_order,
        # rides with a rulebook plan): the P-row sort — the dominant
        # build_example cost on big sweeps — becomes one gather
        sorted_lin = lin[perm]
    svalid = sorted_lin != _SENTINEL
    head = svalid & jnp.concatenate(
        [jnp.ones((1,), bool), sorted_lin[1:] != sorted_lin[:-1]])
    seg_id = jnp.maximum(jnp.cumsum(head.astype(jnp.int32)) - 1, 0)
    start = jax.lax.cummax(jnp.where(head, pos, 0))          # segment start
    slot_p = pos - start

    write = svalid & (seg_id < max_voxels) & (slot_p < max_points)
    slot_v_w = jnp.where(write, seg_id, max_voxels)
    slot_p_w = jnp.where(write, slot_p, max_points)
    voxels = jnp.zeros((max_voxels, max_points, C), points.dtype)
    voxels = voxels.at[slot_v_w, slot_p_w].set(points[perm], mode="drop")

    # head rows carry (z, y, x, start_pos); coords by delinearizing the key
    safe = jnp.where(svalid, sorted_lin, 0)
    xx = safe % gx
    yy = (safe // gx) % gy
    zz = safe // (gx * gy)
    payload = jnp.stack([zz, yy, xx, pos], axis=-1)          # (P, 4) int32
    tgt = jnp.where(head & (seg_id < max_voxels), seg_id, max_voxels)
    table = jnp.zeros((max_voxels, 4), jnp.int32).at[tgt].set(
        payload, mode="drop")

    num_voxels = jnp.minimum(jnp.sum(head.astype(jnp.int32)), max_voxels)
    vvalid = jnp.arange(max_voxels, dtype=jnp.int32) < num_voxels
    out_coords = jnp.where(vvalid[:, None], table[:, :3], -1)

    # rows of kept segments form a sorted prefix of length n_kept; counts
    # are differences of consecutive starts (last kept segment ends there)
    n_kept = jnp.sum((svalid & (seg_id < max_voxels)).astype(jnp.int32))
    starts = jnp.where(vvalid, table[:, 3], n_kept)
    ends = jnp.concatenate([starts[1:], n_kept[None]])
    counts = jnp.clip(ends - starts, 0, max_points)
    counts = jnp.where(vvalid, counts, 0).astype(jnp.int32)

    return {
        "voxels": voxels,
        "coords": out_coords,
        "num_points_per_voxel": counts,
        "num_voxels": num_voxels,
    }


@partial(jax.jit, static_argnames=("voxel_size", "pc_range", "grid_size",
                                   "max_voxels", "max_points", "order"))
def voxelize_mean(points, num_points, *, voxel_size, pc_range,
                  grid_size, max_voxels: int, max_points: int,
                  order: str = "hashed", lin=None, perm=None):
    """Fused voxelize + mean-VFE: per-voxel feature means with NO padded
    (V, T, C) buffer.

    For mean readers (VoxelFeatureExtractorV3, voxel_encoder.py:198-211)
    the buffer is pure overhead: this path sorts points by hashed voxel key
    (same segments/overflow semantics as order="hashed") and scatter-adds
    each point's features straight into a (max_voxels, C) accumulator —
    only the first ``max_points`` points of a voxel contribute, exactly
    matching the buffer+mask mean. (A cumsum-difference segment sum was
    considered and rejected: fp32 prefix sums over a 300k-point cloud reach
    ~1e7, so the subtraction loses ~1 absolute — unacceptable for
    coordinate features.)

    Returns dict: voxels (max_voxels, C) feature MEANS, coords,
    num_points_per_voxel, num_voxels.
    """
    P, C = points.shape
    gx, gy, gz = grid_size

    if lin is None:
        lin = _quantize(points, num_points, voxel_size, pc_range, grid_size)

    pos = jnp.arange(P, dtype=jnp.int32)
    if perm is None:
        key = _sort_key(lin, grid_size, order)
        _, sorted_lin, perm = jax.lax.sort((key, lin, pos), num_keys=2)
    else:
        sorted_lin = lin[perm]            # see _voxelize_hashed's perm note
    svalid = sorted_lin != _SENTINEL
    head = svalid & jnp.concatenate(
        [jnp.ones((1,), bool), sorted_lin[1:] != sorted_lin[:-1]])
    seg_id = jnp.maximum(jnp.cumsum(head.astype(jnp.int32)) - 1, 0)
    start = jax.lax.cummax(jnp.where(head, pos, 0))
    slot_p = pos - start
    write = svalid & (seg_id < max_voxels) & (slot_p < max_points)

    contrib = points[perm] * write[:, None].astype(points.dtype)
    sums = jnp.zeros((max_voxels, C), points.dtype).at[
        jnp.where(write, seg_id, max_voxels)].add(contrib, mode="drop")

    safe = jnp.where(svalid, sorted_lin, 0)
    xx = safe % gx
    yy = (safe // gx) % gy
    zz = safe // (gx * gy)
    payload = jnp.stack([zz, yy, xx, pos], axis=-1)
    tgt = jnp.where(head & (seg_id < max_voxels), seg_id, max_voxels)
    table = jnp.zeros((max_voxels, 4), jnp.int32).at[tgt].set(
        payload, mode="drop")

    num_voxels = jnp.minimum(jnp.sum(head.astype(jnp.int32)), max_voxels)
    vvalid = jnp.arange(max_voxels, dtype=jnp.int32) < num_voxels
    out_coords = jnp.where(vvalid[:, None], table[:, :3], -1)

    n_kept = jnp.sum((svalid & (seg_id < max_voxels)).astype(jnp.int32))
    starts = jnp.where(vvalid, table[:, 3], n_kept)
    ends = jnp.concatenate([starts[1:], n_kept[None]])
    counts = jnp.clip(ends - starts, 0, max_points)
    counts = jnp.where(vvalid, counts, 0).astype(jnp.int32)

    means = sums / jnp.maximum(counts, 1)[:, None].astype(points.dtype)
    return {
        "voxels": means,
        "coords": out_coords,
        "num_points_per_voxel": counts,
        "num_voxels": num_voxels,
    }


@dataclass(frozen=True)
class VoxelGenerator:
    """Config-level wrapper mirroring det3d/core/input/voxel_generator.py:5-43.

    grid_size = round((range_max - range_min) / voxel_size), like the
    reference (note: round, not floor).
    """
    voxel_size: Sequence[float]
    point_cloud_range: Sequence[float]
    max_num_points: int
    max_voxels: int = 20000
    # "appearance" (default) = reference numba first-come parity; under
    # overflow with the train pipeline's point shuffle it keeps voxels
    # point-density-WEIGHTED (object clusters preferentially survive —
    # measured to matter for detection quality). "hashed" = the fast path
    # (half the descriptor-bound ops); its overflow drop is uniform over
    # voxels regardless of density, so use it when max_voxels cannot
    # overflow (the voxel SET is then identical, only row order differs).
    # "yxz" = fast path with rows in the sparse middles' bitmap rank
    # order (pair with the middles' pre_ranked=True to skip their res0
    # argsort + row reorder); overflow drop is a scan-line prefix — only
    # for configs whose cap does not saturate (see _sort_key).
    order: str = "appearance"
    # fuse_mean: emit per-voxel feature MEANS (max_voxels, C) directly —
    # no (V, T, C) buffer — for mean readers (VoxelFeatureExtractorV3).
    # Hashed segments/overflow semantics. apis.train.build_stack switches
    # this on automatically for VFEV3 configs.
    fuse_mean: bool = False

    @property
    def effective_order(self) -> str:
        """Voxel row order actually produced: the fused-mean path always
        runs a fast keyed sort ("yxz" or "hashed"), whatever ``order``
        says. Host rulebook plans key off this."""
        if self.fuse_mean:
            return "yxz" if self.order == "yxz" else "hashed"
        return self.order

    @property
    def grid_size(self) -> Tuple[int, int, int]:
        vs = np.asarray(self.voxel_size, np.float64)
        rng = np.asarray(self.point_cloud_range, np.float64)
        g = np.round((rng[3:] - rng[:3]) / vs).astype(np.int64)
        return tuple(int(v) for v in g)

    def generate(self, points, num_points, lin=None, perm=None):
        """``lin``/``perm``: optional host-precomputed per-point voxel ids
        and sort order (ops/sparse_host.py) — see voxelize()'s override
        notes. ``perm`` requires ``lin``."""
        if self.fuse_mean:
            return voxelize_mean(
                points, num_points,
                voxel_size=tuple(float(v) for v in self.voxel_size),
                pc_range=tuple(float(v) for v in self.point_cloud_range),
                grid_size=self.grid_size,
                max_voxels=int(self.max_voxels),
                max_points=int(self.max_num_points),
                order=self.effective_order,
                lin=lin, perm=perm,
            )
        return voxelize(
            points, num_points,
            voxel_size=tuple(float(v) for v in self.voxel_size),
            pc_range=tuple(float(v) for v in self.point_cloud_range),
            grid_size=self.grid_size,
            max_voxels=int(self.max_voxels),
            max_points=int(self.max_num_points),
            order=self.order,
            lin=lin, perm=perm,
        )

    def generate_batch(self, points, num_points, lin=None, perm=None):
        """Batch of (B, P, C) padded clouds. The fused-mean path maps
        per-sample (its P-row scatter-add degrades ~5x under vmap, like
        every batch scatter here); the buffer path vmaps."""
        if self.fuse_mean:
            if lin is None:
                return jax.lax.map(lambda a: self.generate(*a),
                                   (points, num_points))
            if perm is None:
                return jax.lax.map(lambda a: self.generate(*a),
                                   (points, num_points, lin))
            return jax.lax.map(lambda a: self.generate(*a),
                               (points, num_points, lin, perm))
        if lin is None:
            fn = lambda p, n: self.generate(p, n)
            return jax.vmap(fn)(points, num_points)
        if perm is None:
            return jax.vmap(lambda p, n, l: self.generate(p, n, lin=l))(
                points, num_points, lin)
        return jax.vmap(lambda p, n, l, q: self.generate(p, n, lin=l,
                                                         perm=q))(
            points, num_points, lin, perm)
