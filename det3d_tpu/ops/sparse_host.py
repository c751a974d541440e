"""Host-side (numpy) twins of the sparse-conv rulebook builders.

Rulebooks are pure functions of integer voxel coordinates. On the device
they cost gather descriptors and grid passes on the training critical path
(measured: 71% of the SECOND forward at B=2, tools/probes/probe_fwd_attrib);
in the input pipeline they cost nothing — CPU workers build them while the
TPU computes the previous step, and they arrive as packed int32 arrays
(ops/sparse.py pack/unpack layout) under the loader's prefetch window.

This mirrors the reference's own split: Det3D voxelizes and builds spconv
indice pairs on the host side of the step too (reference
det3d/ops/point_cloud/point_cloud_ops.py:7-203 runs in DataLoader workers;
spconv builds rulebooks from the resulting indices). The TPU twist is that
EVERYTHING here must be bit-identical to the on-device builders
(ops/sparse.py), because the device voxelizer produces the feature rows the
host-built ranks index into. Identity is guaranteed by construction:

  * the host quantizes points to linear voxel ids once (``point_lin``) and
    the SAME ids are shipped to the device voxelizer (``lin=`` override in
    core/voxelize.py) — so host and device never disagree on a float
    rounding at a voxel boundary;
  * from identical ids, both sides run the same deterministic stable sorts
    and rank arithmetic (tests/test_host_plan.py asserts raw equality of
    every packed plan array against the device builders).

All functions are per-sample (the loader collates across the batch).
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import numpy as np

SENTINEL = np.iinfo(np.int32).max

_PACK_SHIFT = 24
_PACK_MASK = (1 << _PACK_SHIFT) - 1


def _hp():
    """Native (C++) twins of these builders — csrc/hostplan.cc, ~40 numpy
    full-array passes per stage collapsed into single cache-friendly loops
    (round-5 VERDICT item: the 433-639 ms/sample numpy build).
    Bit-exactness holds transitively: tests/test_host_plan.py runs with the
    native path on and still asserts raw equality against the device
    builders; tests/test_host_plan_native.py additionally diffs native vs
    numpy directly. ``DET3D_NATIVE=0`` disables (numpy is the fallback)."""
    from det3d_tpu import csrc
    return csrc.get_hostplan_lib()


def _c3(v):
    return np.ascontiguousarray(_as3(v), np.int64)


def _as3(v) -> Tuple[int, int, int]:
    if isinstance(v, (int, np.integer)):
        return (int(v),) * 3
    t = tuple(int(x) for x in v)
    assert len(t) == 3
    return t


def out_spatial_shape(shape, kernel, stride, padding):
    k, s, p = _as3(kernel), _as3(stride), _as3(padding)
    return tuple((shape[d] + 2 * p[d] - k[d]) // s[d] + 1 for d in range(3))


# ---------------------------------------------------------------------------
# Voxel id / coordinate twins (core/voxelize.py)
# ---------------------------------------------------------------------------


def point_lin(points, num_points, voxel_size, pc_range, grid_size):
    """Quantize a padded cloud to xyz-major linear voxel ids.

    Mirror of the quantization in core/voxelize.py::voxelize (fp32 floor
    divide). The result is shipped to the device voxelizer as its ``lin``
    override, making this array — not a float recomputation — the single
    source of truth for which voxel every point lands in.
    Returns (P,) int32, SENTINEL for padding/out-of-range rows.
    """
    pts = np.asarray(points, np.float32)
    P = pts.shape[0]
    gx, gy, gz = grid_size
    vmin = np.asarray(pc_range[:3], np.float32)
    vs = np.asarray(voxel_size, np.float32)
    lib = _hp()
    if lib is not None:
        out = np.empty(P, np.int32)
        lib.hp_point_lin(np.ascontiguousarray(pts), P, pts.shape[1],
                         int(num_points), np.ascontiguousarray(vmin),
                         np.ascontiguousarray(vs), gx, gy, gz, out)
        return out
    c = np.floor((pts[:, :3] - vmin) / vs).astype(np.int64)
    ok = (np.arange(P) < int(num_points))
    ok &= (c[:, 0] >= 0) & (c[:, 0] < gx)
    ok &= (c[:, 1] >= 0) & (c[:, 1] < gy)
    ok &= (c[:, 2] >= 0) & (c[:, 2] < gz)
    lin = c[:, 0] + c[:, 1] * gx + c[:, 2] * (gx * gy)
    return np.where(ok, lin, SENTINEL).astype(np.int32)


def _mix32(x):
    """Murmur3 finalizer, uint32 — twin of core/voxelize.py::_mix32."""
    x = x.astype(np.uint32)
    x = x ^ (x >> np.uint32(16))
    x = x * np.uint32(0x85EBCA6B)
    x = x ^ (x >> np.uint32(13))
    x = x * np.uint32(0xC2B2AE35)
    x = x ^ (x >> np.uint32(16))
    return x


def point_order(lin, grid_size, order):
    """The fast voxelizer paths' point sort order — twin of the
    ``jax.lax.sort((key, lin, pos), num_keys=2)`` in
    core/voxelize.py::_voxelize_hashed (stable lexsort by (key, lin)).
    Shipped to the device as its ``perm`` override: the P-row sort — the
    dominant build_example cost on 300k-point sweeps — becomes a gather."""
    gx, gy, gz = grid_size
    if order not in ("yxz", "hashed"):
        raise ValueError(f"host plans need order 'hashed'/'yxz', got {order}")
    lib = _hp()
    if lib is not None:
        lin32 = np.ascontiguousarray(lin, np.int32)
        out = np.empty(lin32.shape[0], np.int32)
        lib.hp_point_order(lin32, lin32.shape[0], gx, gy, gz,
                           1 if order == "yxz" else 0, out)
        return out
    lin = np.asarray(lin, np.int64)
    if order == "yxz":
        xx = lin % gx
        yy = (lin // gx) % gy
        zz = lin // (gx * gy)
        key = np.where(lin == SENTINEL, np.int64(SENTINEL),
                       (yy * gx + xx) * gz + zz)
    elif order == "hashed":
        key = np.where(lin == SENTINEL, np.int64(0xFFFFFFFF),
                       _mix32(lin.astype(np.uint32)).astype(np.int64))
    else:
        raise ValueError(f"host plans need order 'hashed'/'yxz', got {order}")
    return np.lexsort((lin, key)).astype(np.int32)


def voxel_coords(lin, grid_size, max_voxels, order, perm=None):
    """Voxel coordinate rows for the fast voxelizer paths.

    Twin of core/voxelize.py::_voxelize_hashed's ``coords`` output (orders
    "hashed" and "yxz"; the "appearance" path is not supported — host plans
    are only wired for the fast paths). Returns (max_voxels, 3) int32 zyx
    with -1 padding.
    """
    gx, gy, gz = grid_size
    if perm is None:
        perm = point_order(lin, grid_size, order)
    lib = _hp()
    if lib is not None:
        lin32 = np.ascontiguousarray(lin, np.int32)
        perm32 = np.ascontiguousarray(perm, np.int32)
        out = np.empty((max_voxels, 3), np.int32)
        lib.hp_voxel_coords(lin32, perm32, lin32.shape[0], gx, gy,
                            max_voxels, out)
        return out
    lin = np.asarray(lin, np.int64)
    slin = lin[perm]
    svalid = slin != SENTINEL
    head = svalid.copy()
    head[1:] &= slin[1:] != slin[:-1]
    seg_id = np.cumsum(head) - 1
    keep = head & (seg_id < max_voxels)
    kept = slin[keep]
    out = np.full((max_voxels, 3), -1, np.int32)
    n = kept.shape[0]
    out[:n, 0] = kept // (gx * gy)
    out[:n, 1] = (kept // gx) % gy
    out[:n, 2] = kept % gx
    return out


# ---------------------------------------------------------------------------
# Rank-key helpers (twin of the bitmap rank contract, ops/sparse.py:451)
# ---------------------------------------------------------------------------


def yxz_keys(coords, shape):
    """(V, 3) zyx -> yxz-major rank keys; invalid rows -> SENTINEL.

    When rows are in rank order the array is ascending with sentinels
    last, so ``np.searchsorted(keys, q)`` IS the bitmap's
    base + popcount-below rank arithmetic."""
    d, h, w = shape
    co = np.asarray(coords, np.int64)
    z, y, x = co[:, 0], co[:, 1], co[:, 2]
    ok = (z >= 0) & (z < d) & (y >= 0) & (y < h) & (x >= 0) & (x < w)
    return np.where(ok, (y * w + x) * d + z, np.int64(SENTINEL))


def rank_order(coords, shape):
    """Twin of ops/sparse.py::yxz_order (stable argsort of the rank key)."""
    return np.argsort(yxz_keys(coords, shape), kind="stable").astype(np.int32)


def _pack_windows(r0, pres):
    # canonical form: r0 zeroed where no tap is present (see
    # ops/sparse.py::pack_windows)
    r0 = np.where(pres.any(-1), r0, 0)
    packed = (np.asarray(r0, np.int64) & _PACK_MASK).astype(np.int32)
    for j in range(pres.shape[-1]):
        packed = packed | (pres[..., j].astype(np.int32)
                           << (_PACK_SHIFT + j))
    return packed


def host_bitmap(keys, shape):
    """Dense per-column (base, bits) lookup from SORTED yxz rank keys —
    the numpy twin of ops/sparse.py::build_bitmap, direct-addressed.

    Replaces searchsorted in every host rulebook query: a query becomes
    two gathers + np.bitwise_count (measured 760 -> ~210 ms/sample for
    the full KITTI SECOND plan). Returns (base (h*w,) int32 exclusive
    rank base per column, bits (h*w,) uint64 z-occupancy words)."""
    d, h, w = shape
    k = keys[keys != SENTINEL]
    col = (k // d).astype(np.int64)
    z = (k % d).astype(np.uint64)
    bits = np.zeros(h * w, np.uint64)
    counts = np.zeros(h * w, np.int64)
    if k.size:
        head = np.ones(k.shape[0], bool)
        head[1:] = col[1:] != col[:-1]
        starts = np.flatnonzero(head)
        occ = col[starts]
        bits[occ] = np.bitwise_or.reduceat(np.uint64(1) << z, starts)
        counts[occ] = np.diff(np.append(starts, k.shape[0]))
    base = (np.cumsum(counts) - counts).astype(np.int32)
    return base, bits


def _column_windows(lookup, qy, qx, z0, kz, shape):
    """Per-column window base rank + tap presence over a host bitmap.

    Twin of ops/sparse.py::_windows_from_words: r0 = base + popcount of
    active bits below clip(z0, 0, d-1); presence = bounds & bit set.
    Returns (r0 (..., K), pres (..., K, kz))."""
    d, h, w = shape
    base_t, bits_t = lookup
    okc = (qy >= 0) & (qy < h) & (qx >= 0) & (qx < w)
    flat = np.where(okc, qy * w + qx, 0)
    word = bits_t[flat]
    z0b = np.broadcast_to(z0, okc.shape)
    zc = np.clip(z0b, 0, d - 1).astype(np.uint64)
    below = np.bitwise_count(word & ((np.uint64(1) << zc) - np.uint64(1)))
    r0 = np.where(okc, base_t[flat].astype(np.int64) + below.astype(np.int64),
                  0)
    pres = []
    for j in range(kz):
        zj = z0b + j
        okz = okc & (zj >= 0) & (zj < d)
        zjc = np.where(okz, zj, 0).astype(np.uint64)
        pres.append(okz & (((word >> zjc) & np.uint64(1)) != 0))
    return r0.astype(np.int32), np.stack(pres, axis=-1)


def subm_windows(coords, shape, kernel=3, keys=None, lookup=None):
    """Packed submanifold window rulebook. Twin of
    ops/sparse.py::subm_window_rulebook_batch (one sample). coords must be
    in yxz rank order. Returns (V, ky*kx) int32 packed."""
    k = _as3(kernel)
    pad = tuple(kk // 2 for kk in k)
    lib = _hp()
    if lib is not None:
        co32 = np.ascontiguousarray(coords, np.int32)
        out = np.empty((co32.shape[0], k[1] * k[2]), np.int32)
        lib.hp_subm_windows(co32, co32.shape[0], shape[0], shape[1],
                            shape[2], k[0], k[1], k[2], out)
        return out
    if lookup is None:
        lookup = host_bitmap(yxz_keys(coords, shape) if keys is None
                             else keys, shape)
    dy = np.repeat(np.arange(k[1]) - pad[1], k[2])
    dx = np.tile(np.arange(k[2]) - pad[2], k[1])
    co = np.asarray(coords, np.int64)
    qy = co[:, 1, None] + dy[None]
    qx = co[:, 2, None] + dx[None]
    z0 = co[:, 0, None] - pad[0]
    r0, pres = _column_windows(lookup, qy, qx, z0, k[0], shape)
    pres &= (co[:, 0] >= 0)[:, None, None]
    return _pack_windows(r0, pres)


def down_windows(out_coords, in_lookup, in_shape, kernel, stride, padding,
                 in_coords=None):
    """Packed strided-conv window rulebook in INPUT rank space. Twin of
    ops/sparse.py::conv_window_rulebook_batch (one sample). ``in_lookup``
    is the input resolution's host_bitmap (or its sorted yxz keys);
    ``in_coords`` (rank-ordered input rows) enables the native path, which
    builds its own bitmap."""
    k, s, p = _as3(kernel), _as3(stride), _as3(padding)
    lib = _hp()
    if lib is not None and in_coords is not None:
        oc32 = np.ascontiguousarray(out_coords, np.int32)
        ic32 = np.ascontiguousarray(in_coords, np.int32)
        out = np.empty((oc32.shape[0], k[1] * k[2]), np.int32)
        lib.hp_down_windows(oc32, oc32.shape[0], ic32, ic32.shape[0],
                            in_shape[0], in_shape[1], in_shape[2],
                            _c3(k), _c3(s), _c3(p), out)
        return out
    if not isinstance(in_lookup, tuple):
        in_lookup = host_bitmap(in_lookup, in_shape)
    oc = np.asarray(out_coords, np.int64)
    scaled = oc * np.asarray(s, np.int64)[None]
    dy = np.repeat(np.arange(k[1]), k[2])
    dx = np.tile(np.arange(k[2]), k[1])
    qy = scaled[:, 1, None] + dy[None] - p[1]
    qx = scaled[:, 2, None] + dx[None] - p[2]
    z0 = scaled[:, 0, None] - p[0]
    r0, pres = _column_windows(in_lookup, qy, qx, z0, k[0], in_shape)
    pres &= (oc[:, 0] >= 0)[:, None, None]
    return _pack_windows(r0, pres)


def _down_candidates(coords, shape, k, s, p, oshape):
    """Twin of ops/sparse.py::_down_candidates (one sample)."""
    co = np.asarray(coords, np.int64)
    cand, bounds, valid = [], [], []
    ncand = tuple(-(-k[d] // s[d]) for d in range(3))
    for d in range(3):
        pd = co[:, d]
        base = np.floor_divide(pd + p[d], s[d])
        i = np.arange(ncand[d], dtype=np.int64)
        o = base[:, None] - i[None]
        j = pd[:, None] + p[d] - o * s[d]
        okb = (o >= 0) & (o < oshape[d]) & (pd >= 0)[:, None]
        cand.append(o)
        bounds.append(okb)
        valid.append(okb & (j >= 0) & (j < k[d]))
    oz = cand[0][:, :, None, None]
    oy = cand[1][:, None, :, None]
    ox = cand[2][:, None, None, :]
    ok = (valid[0][:, :, None, None] & valid[1][:, None, :, None]
          & valid[2][:, None, None, :])
    okb = (bounds[0][:, :, None, None], bounds[1][:, None, :, None],
           bounds[2][:, None, None, :])
    return oz, oy, ox, ok, okb, ncand


def transition(coords, shape, kernel, stride, padding, max_out,
               build_inverse=False):
    """Downsample transition: output coords (yxz rank order, -1 pad) and,
    optionally, the strided conv's packed inverse rulebook.

    Twin of ops/sparse.py::stage_transition_batch (one sample): dedup by
    occupancy, low-z-prefix drop under the cap in zyx cell order, rows
    emitted in yxz rank order. Returns (out_coords (max_out, 3) int32,
    oshape[, inv_packed (V, ncy*ncx) int32])."""
    k, s, p = _as3(kernel), _as3(stride), _as3(padding)
    oshape = out_spatial_shape(shape, k, s, p)
    do, ho, wo = oshape
    lib = _hp()
    if lib is not None:
        import ctypes
        co32 = np.ascontiguousarray(coords, np.int32)
        v = co32.shape[0]
        ncand = tuple(-(-k[d] // s[d]) for d in range(3))
        want_inv = build_inverse and max(ncand) <= 2
        out = np.empty((max_out, 3), np.int32)
        inv = (np.empty((v, ncand[1] * ncand[2]), np.int32) if want_inv
               else np.empty((1, 1), np.int32))
        built = ctypes.c_int32(0)
        lib.hp_transition(co32, v, shape[0], shape[1], shape[2],
                          _c3(k), _c3(s), _c3(p), max_out,
                          1 if want_inv else 0, out, inv,
                          ctypes.byref(built))
        if built.value:
            return out, oshape, inv
        return out, oshape
    oz, oy, ox, ok, okb, ncand = _down_candidates(coords, shape, k, s, p,
                                                  oshape)
    full = ok.shape
    lin = np.broadcast_to((oz * ho + oy) * wo + ox, full)
    # occupied cells, zyx-major ascending == the device's cumsum rank order
    occ = np.unique(lin[ok])
    kept_zyx = occ[:max_out]
    # rows in yxz rank order
    kz_, ky_, kx_ = (kept_zyx // (ho * wo), (kept_zyx // wo) % ho,
                     kept_zyx % wo)
    yxz = (ky_ * wo + kx_) * do + kz_
    order = np.argsort(yxz, kind="stable")
    out = np.full((max_out, 3), -1, np.int32)
    n = kept_zyx.shape[0]
    out[:n, 0] = kz_[order]
    out[:n, 1] = ky_[order]
    out[:n, 2] = kx_[order]
    if not build_inverse or max(ncand) > 2:
        return out, oshape
    # inverse rulebook from the same candidate enumeration (twin of the
    # fused build in stage_transition_batch): rank/presence against the
    # KEPT output set, via its host bitmap (no searchsorted)
    base_t, bits_t = host_bitmap(np.sort(yxz), oshape)
    okb_yx = np.broadcast_to(okb[1] & okb[2], full)
    okbf = okb_yx & np.broadcast_to(okb[0], full)
    col = np.where(okb_yx, np.broadcast_to(oy * wo + ox, full), 0)
    word = bits_t[col]
    zc = np.clip(np.broadcast_to(oz, full), 0, 31).astype(np.uint64)
    rank = (base_t[col].astype(np.int64) + np.bitwise_count(
        word & ((np.uint64(1) << zc) - np.uint64(1)))).astype(np.int32)
    ozb = np.broadcast_to(oz, full)
    inz = (ozb >= 0) & (ozb < do)
    zq = np.where(inz, ozb, 0).astype(np.uint64)
    present = inz & (((word >> zq) & np.uint64(1)) != 0)
    kept_c = okbf & present
    v = coords.shape[0]
    ncz, ncy, ncx = ncand
    r0i = rank.reshape(v, ncz, ncy * ncx)[:, ncz - 1]
    presi = kept_c.reshape(v, ncz, ncy * ncx).transpose(0, 2, 1)[:, :, ::-1]
    co = np.asarray(coords, np.int64)
    presi = presi & (co[:, 0] >= 0)[:, None, None]
    par = ((co + np.asarray(p, np.int64)[None])
           % np.asarray(s, np.int64)[None]).astype(np.int32)
    packed = _pack_windows(r0i, presi)
    for d in range(3):
        packed = packed | ((par[:, d] & 1) << (28 + d))[:, None]
    return out, oshape, packed


def linearize(coords, shape):
    """Twin of ops/sparse.py::linearize (zyx-major, SENTINEL padding)."""
    d, h, w = shape
    co = np.asarray(coords, np.int64)
    z, y, x = co[:, 0], co[:, 1], co[:, 2]
    ok = (z >= 0) & (z < d) & (y >= 0) & (y < h) & (x >= 0) & (x < w)
    return np.where(ok, (z * h + y) * w + x, SENTINEL).astype(np.int32)


# ---------------------------------------------------------------------------
# Whole-middle plans
# ---------------------------------------------------------------------------


def build_plan(points, num_points, *, voxel_size, pc_range, grid_size,
               max_voxels, order, spec, train) -> Dict[str, np.ndarray]:
    """Full host plan for one sample: point voxel ids + every rulebook the
    sparse middle needs, packed for transport.

    ``spec`` comes from models/backbones.py::middle_plan_spec. Returns flat
    keys (the loader collate stacks them across the batch):
      point_lin        (P,)  int32 — feed to the device voxelizer
      plan_order0      (V,)  int32 — only when the middle is not pre_ranked
      plan_s0          (V, 9) packed subm windows at res0
      plan_co{i}       (cap_i,) int32 zyx-linear stage coords
      plan_down{i}     (cap_i, Kbev) packed down-conv windows
      plan_subm{i}     (cap_i, 9) packed subm windows (stages that keep one)
      plan_inv{i}      (V_{i-1}, Kc) packed inverse rulebooks (train only)
    """
    lin = point_lin(points, num_points, voxel_size, pc_range, grid_size)
    perm = point_order(lin, grid_size, order)
    coords = voxel_coords(lin, grid_size, max_voxels, order, perm=perm)
    out: Dict[str, np.ndarray] = {"point_lin": lin, "point_perm": perm}

    shape0 = tuple(spec["shape0"])
    if spec["pre_ranked"]:
        co = coords
    else:
        order0 = rank_order(coords, shape0)
        co = coords[order0]
        out["plan_order0"] = order0
    nat = _hp() is not None     # native path builds its own bitmaps
    lk = None if nat else host_bitmap(yxz_keys(co, shape0), shape0)
    out["plan_s0"] = subm_windows(co, shape0, 3, lookup=lk)

    shape = shape0
    for i, st in enumerate(spec["stages"], start=1):
        k, s, p, cap = st["kernel"], st["stride"], st["padding"], st["cap"]
        res = transition(co, shape, k, s, p, cap, build_inverse=train)
        out_co, oshape = res[0], res[1]
        if train and len(res) > 2:
            out[f"plan_inv{i}"] = res[2]
        out[f"plan_down{i}"] = down_windows(out_co, lk, shape, k, s, p,
                                            in_coords=co)
        out[f"plan_co{i}"] = linearize(out_co, oshape)
        lk = None if nat else host_bitmap(yxz_keys(out_co, oshape), oshape)
        if st["subm"]:
            out[f"plan_subm{i}"] = subm_windows(out_co, oshape, 3, lookup=lk)
        co, shape = out_co, oshape
    return out
