"""Host-side (numpy) voxelization twins — the serving-path data plane.

The reference's serving contract runs voxelization on the HOST: its timed
region (tools/dist_test.py:179-217, "Total time per frame") consumes
``voxels`` tensors the DataLoader's CPU workers already built
(det3d/ops/point_cloud/point_cloud_ops.py:7-203). This framework voxelizes
ON-device for training throughput (core/voxelize.py — one compiled step,
dispatch-ahead); for serving, the device-side P-row sort/scatter chain is
pure latency (measured 41 ms/scan of the 49 ms/scan nuScenes-PointPillars
predict at 300k points, probe_serve_attrib r5), so ``host_voxelize``
rebuilds the exact same outputs on the host and the step consumes them
directly (parallel/train.build_example passthrough).

Bit-exactness contract with core/voxelize.py, per path:
  * "hashed"/"yxz" buffer and fused-mean paths: same quantization
    (csrc point_lin), same stable sort (csrc point_order), same segment
    arithmetic; buffer writes hit unique (voxel, slot) cells so order is
    irrelevant; mean sums accumulate in the same sorted-row order the
    device scatter-add applies updates. tests/test_voxelize_host.py
    asserts raw equality of every output against the device.
  * "appearance": same two-sort construction (first-come voxel order).

All functions are per-sample; ``host_voxelize_batch`` stacks.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from det3d_tpu.ops import sparse_host as sph

SENTINEL = np.iinfo(np.int32).max


def _common(points, num_points, vg_kw):
    """Quantize + order points; returns (pts, lin, perm) with perm per the
    effective order ("appearance" uses a plain stable argsort of lin)."""
    pts = np.asarray(points, np.float32)
    lin = sph.point_lin(pts, int(num_points), vg_kw["voxel_size"],
                        vg_kw["pc_range"], vg_kw["grid_size"])
    order = vg_kw["order"]
    if order == "appearance":
        lib = sph._hp()
        if lib is not None:
            perm = np.empty(lin.shape[0], np.int32)
            lib.hp_argsort_lin(np.ascontiguousarray(lin, np.int32),
                               lin.shape[0], perm)
        else:
            perm = np.argsort(lin, kind="stable").astype(np.int32)
    else:
        perm = sph.point_order(lin, vg_kw["grid_size"], order)
    return pts, lin, perm


def host_voxelize(points, num_points, *, voxel_size, pc_range, grid_size,
                  max_voxels, max_points, order, fuse_mean,
                  lin=None, perm=None) -> Dict[str, np.ndarray]:
    """Numpy twin of core/voxelize.py::voxelize / voxelize_mean (one cloud).

    Returns the device voxelizer's outputs: voxels ((V, T, C) buffer, or
    (V, C) means when fuse_mean), coords (V, 3) int32 zyx, -1 padded,
    num_points_per_voxel (V,) int32, num_voxels () int32.

    ``lin``/``perm``: precomputed ids and sort order (must match the
    effective order) — a rulebook-plan builder already owns them; passing
    both skips the quantize+sort (the dominant cost at 300k points).
    """
    kw = dict(voxel_size=voxel_size, pc_range=pc_range, grid_size=grid_size,
              order=("yxz" if fuse_mean and order == "yxz" else
                     "hashed" if fuse_mean else order))
    if lin is not None and perm is not None:
        pts = np.asarray(points, np.float32)
    else:
        pts, lin, perm = _common(points, num_points, kw)
    P, C = pts.shape
    gx, gy, _ = grid_size
    V, T = int(max_voxels), int(max_points)

    lib = sph._hp()
    if lib is not None:
        ptsc = np.ascontiguousarray(pts)
        linc = np.ascontiguousarray(lin, np.int32)
        permc = np.ascontiguousarray(perm, np.int32)
        voxels = np.empty((V, C) if fuse_mean else (V, T, C), np.float32)
        coords = np.empty((V, 3), np.int32)
        counts = np.empty(V, np.int32)
        if kw["order"] == "appearance":
            nv = lib.hp_voxelize_appearance(ptsc, P, C, linc, permc, gx, gy,
                                            V, T, voxels, coords, counts)
        else:
            nv = lib.hp_voxelize_sorted(ptsc, P, C, linc, permc, gx, gy,
                                        V, T, 1 if fuse_mean else 0,
                                        voxels, coords, counts)
        return {"voxels": voxels, "coords": coords,
                "num_points_per_voxel": counts,
                "num_voxels": np.int32(nv)}

    if kw["order"] == "appearance":
        return _appearance(pts, lin, perm, gx, gy, V, T)

    pos = np.arange(P, dtype=np.int64)
    slin = lin[perm].astype(np.int64)
    svalid = slin != SENTINEL
    head = svalid.copy()
    head[1:] &= slin[1:] != slin[:-1]
    seg_id = np.maximum(np.cumsum(head) - 1, 0)
    start = np.maximum.accumulate(np.where(head, pos, 0))
    slot_p = pos - start
    write = svalid & (seg_id < V) & (slot_p < T)

    # head rows carry (z, y, x, start_pos) — twin of the device's payload
    safe = np.where(svalid, slin, 0)
    zz, yy, xx = safe // (gx * gy), (safe // gx) % gy, safe % gx
    n_heads = int(head.sum())
    num_voxels = np.int32(min(n_heads, V))
    vvalid = np.arange(V) < num_voxels
    table = np.zeros((V, 4), np.int32)
    hw = head & (seg_id < V)
    table[seg_id[hw]] = np.stack([zz, yy, xx, pos], 1)[hw]
    coords = np.where(vvalid[:, None], table[:, :3], -1).astype(np.int32)

    n_kept = int((svalid & (seg_id < V)).sum())
    starts = np.where(vvalid, table[:, 3], n_kept)
    ends = np.concatenate([starts[1:], [n_kept]])
    counts = np.clip(ends - starts, 0, T)
    counts = np.where(vvalid, counts, 0).astype(np.int32)

    if fuse_mean:
        contrib = pts[perm] * write[:, None].astype(np.float32)
        sums = np.zeros((V, C), np.float32)
        # same accumulation order as the device scatter-add: sorted rows
        np.add.at(sums, seg_id[write], contrib[write])
        means = sums / np.maximum(counts, 1)[:, None].astype(np.float32)
        return {"voxels": means, "coords": coords,
                "num_points_per_voxel": counts, "num_voxels": num_voxels}

    voxels = np.zeros((V, T, C), np.float32)
    voxels[seg_id[write], slot_p[write]] = pts[perm][write]
    return {"voxels": voxels, "coords": coords,
            "num_points_per_voxel": counts, "num_voxels": num_voxels}


def _appearance(pts, lin, order, gx, gy, V, T):
    """Twin of the appearance-ordered path (core/voxelize.py::voxelize):
    voxel rows in first-come order, exactly like the reference numba
    kernel when the cap does not saturate."""
    P, C = pts.shape
    pos = np.arange(P, dtype=np.int64)
    slin = lin[order].astype(np.int64)
    svalid = slin != SENTINEL
    head = svalid.copy()
    head[1:] &= slin[1:] != slin[:-1]
    seg_id = np.maximum(np.cumsum(head) - 1, 0)

    first_pt = np.full(P, SENTINEL, np.int64)
    np.minimum.at(first_pt, seg_id[svalid], order[svalid].astype(np.int64))
    appear_order = np.argsort(first_pt, kind="stable")
    seg_rank = np.zeros(P, np.int64)
    seg_rank[appear_order] = pos
    seg_start = np.full(P, SENTINEL, np.int64)
    np.minimum.at(seg_start, seg_id[svalid], pos[svalid])

    slot_v = seg_rank[seg_id]
    slot_p = pos - seg_start[seg_id]
    write = svalid & (slot_v < V) & (slot_p < T)

    voxels = np.zeros((V, T, C), np.float32)
    voxels[slot_v[write], slot_p[write]] = pts[order][write]
    counts = np.zeros(V, np.int32)
    np.add.at(counts, slot_v[write], 1)

    safe = np.where(svalid, slin, 0)
    coords_zyx = np.stack([safe // (gx * gy), (safe // gx) % gy,
                           safe % gx], 1).astype(np.int32)
    coords = np.full((V, 3), -1, np.int32)
    hw = head & (slot_v < V)
    coords[slot_v[hw]] = coords_zyx[hw]
    num_voxels = np.int32(min(int(head.sum()), V))
    return {"voxels": voxels, "coords": coords,
            "num_points_per_voxel": counts, "num_voxels": num_voxels}


def host_voxelize_batch(points, num_points, voxel_gen) \
        -> Dict[str, np.ndarray]:
    """Batch helper over a VoxelGenerator: returns the batch-stacked
    example keys the jitted steps consume (build_example passthrough)."""
    points = np.asarray(points)
    num_points = np.asarray(num_points)
    per = [host_voxelize(points[i], num_points[i],
                         voxel_size=tuple(voxel_gen.voxel_size),
                         pc_range=tuple(voxel_gen.point_cloud_range),
                         grid_size=tuple(voxel_gen.grid_size),
                         max_voxels=int(voxel_gen.max_voxels),
                         max_points=int(voxel_gen.max_num_points),
                         order=voxel_gen.order,
                         fuse_mean=bool(voxel_gen.fuse_mean))
           for i in range(points.shape[0])]
    return {"voxels": np.stack([d["voxels"] for d in per]),
            "coordinates": np.stack([d["coords"] for d in per]),
            "num_points_per_voxel": np.stack(
                [d["num_points_per_voxel"] for d in per]),
            "num_voxels": np.stack([d["num_voxels"] for d in per])}
