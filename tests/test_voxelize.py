"""On-device voxelizer vs a sequential numpy oracle re-implementing the
reference first-come semantics (point_cloud_ops.py:7-110)."""

import numpy as np

from det3d_tpu.core.voxelize import VoxelGenerator


def _oracle_points_to_voxel(points, voxel_size, pc_range, max_points,
                            max_voxels):
    """Sequential first-come voxelization oracle (reverse zyx coords)."""
    voxel_size = np.asarray(voxel_size)
    pc_range = np.asarray(pc_range)
    grid = np.round((pc_range[3:] - pc_range[:3]) / voxel_size).astype(np.int32)
    coor_to_idx = {}
    voxels = np.zeros((max_voxels, max_points, points.shape[1]), points.dtype)
    coords = np.full((max_voxels, 3), -1, np.int32)
    counts = np.zeros((max_voxels,), np.int32)
    nvox = 0
    for p in points:
        c = np.floor((p[:3] - pc_range[:3]) / voxel_size).astype(np.int32)
        if np.any(c < 0) or np.any(c >= grid):
            continue
        key = (int(c[2]), int(c[1]), int(c[0]))          # zyx
        if key not in coor_to_idx:
            if nvox >= max_voxels:
                continue                                  # (we keep scanning)
            coor_to_idx[key] = nvox
            coords[nvox] = key
            nvox += 1
        vi = coor_to_idx[key]
        if vi >= max_voxels:
            continue
        if counts[vi] < max_points:
            voxels[vi, counts[vi]] = p
            counts[vi] += 1
    return voxels, coords, counts, nvox


def test_voxelize_matches_oracle(rng):
    pc_range = [0, -10, -3, 20, 10, 1]
    voxel_size = [0.5, 0.5, 1.0]
    n = 500
    pts = np.zeros((n, 4), np.float32)
    pts[:, 0] = rng.uniform(-2, 22, n)       # some out of range
    pts[:, 1] = rng.uniform(-12, 12, n)
    pts[:, 2] = rng.uniform(-4, 2, n)
    pts[:, 3] = rng.uniform(0, 1, n)

    gen = VoxelGenerator(voxel_size=voxel_size, point_cloud_range=pc_range,
                         max_num_points=8, max_voxels=2000,
                         order="appearance")
    out = gen.generate(pts, np.int32(n))
    o_vox, o_coords, o_counts, o_n = _oracle_points_to_voxel(
        pts, voxel_size, pc_range, 8, 2000)

    assert int(out["num_voxels"]) == o_n
    nv = o_n
    np.testing.assert_array_equal(np.asarray(out["coords"])[:nv], o_coords[:nv])
    np.testing.assert_array_equal(
        np.asarray(out["num_points_per_voxel"])[:nv], o_counts[:nv])
    np.testing.assert_allclose(np.asarray(out["voxels"])[:nv], o_vox[:nv],
                               atol=1e-6)


def test_voxelize_hashed_mode_same_voxel_set(rng):
    """The fast hashed-order path produces the same voxel SET, contents and
    counts as the appearance path (just in hash-key row order), with
    identical within-voxel point order."""
    pc_range = [0, -10, -3, 20, 10, 1]
    voxel_size = [0.5, 0.5, 1.0]
    n = 500
    pts = np.zeros((n, 4), np.float32)
    pts[:, 0] = rng.uniform(-2, 22, n)
    pts[:, 1] = rng.uniform(-12, 12, n)
    pts[:, 2] = rng.uniform(-4, 2, n)
    pts[:, 3] = rng.uniform(0, 1, n)

    kw = dict(voxel_size=voxel_size, point_cloud_range=pc_range,
              max_num_points=8, max_voxels=2000)
    ref = VoxelGenerator(order="appearance", **kw).generate(pts, np.int32(n))
    fast = VoxelGenerator(order="hashed", **kw).generate(pts, np.int32(n))

    nv = int(ref["num_voxels"])
    assert int(fast["num_voxels"]) == nv

    grid = VoxelGenerator(**kw).grid_size
    f_coords = np.asarray(fast["coords"])[:nv]
    r_coords = np.asarray(ref["coords"])[:nv]
    f_lin = (f_coords[:, 0] * grid[1] + f_coords[:, 1]) * grid[0] + f_coords[:, 2]
    r_lin = (r_coords[:, 0] * grid[1] + r_coords[:, 1]) * grid[0] + r_coords[:, 2]
    assert len(set(f_lin.tolist())) == nv          # rows are distinct voxels
    # align fast rows to ref rows by linear id: everything must match
    perm = np.argsort(r_lin)[np.searchsorted(r_lin[np.argsort(r_lin)], f_lin)]
    np.testing.assert_array_equal(f_coords, r_coords[perm])
    np.testing.assert_array_equal(
        np.asarray(fast["num_points_per_voxel"])[:nv],
        np.asarray(ref["num_points_per_voxel"])[:nv][perm])
    np.testing.assert_allclose(np.asarray(fast["voxels"])[:nv],
                               np.asarray(ref["voxels"])[:nv][perm], atol=0)


def test_voxelize_hashed_mode_overflow_counts(rng):
    """Overflow: counts/coords stay consistent when segments are dropped."""
    pc_range = [0, -10, -3, 20, 10, 1]
    gen = VoxelGenerator(voxel_size=[0.5, 0.5, 1.0],
                         point_cloud_range=pc_range, max_num_points=2,
                         max_voxels=16, order="hashed")
    pts = np.zeros((400, 4), np.float32)
    pts[:, 0] = rng.uniform(0, 20, 400)
    pts[:, 1] = rng.uniform(-10, 10, 400)
    pts[:, 2] = rng.uniform(-3, 1, 400)
    out = gen.generate(pts, np.int32(400))
    nv = int(out["num_voxels"])
    assert nv == 16
    counts = np.asarray(out["num_points_per_voxel"])
    assert np.all(counts[:nv] >= 1) and np.all(counts[:nv] <= 2)
    vox = np.asarray(out["voxels"])
    for v in range(nv):
        assert np.all(vox[v, counts[v]:] == 0)
        assert np.all(np.abs(vox[v, :counts[v]]).sum(-1) > 0)


def test_voxelize_respects_padding(rng):
    pc_range = [0, -10, -3, 20, 10, 1]
    gen = VoxelGenerator(voxel_size=[0.5, 0.5, 4.0], point_cloud_range=pc_range,
                         max_num_points=4, max_voxels=100)
    pts = np.zeros((50, 4), np.float32)
    pts[:, 0] = 1.0
    pts[:, 1] = 0.0
    # only first 10 rows valid -> exactly one voxel with 4 points kept
    out = gen.generate(pts, np.int32(10))
    assert int(out["num_voxels"]) == 1
    assert int(out["num_points_per_voxel"][0]) == 4


def test_voxelize_max_points_cap(rng):
    pc_range = [0, -10, -3, 20, 10, 1]
    gen = VoxelGenerator(voxel_size=[1.0, 1.0, 4.0], point_cloud_range=pc_range,
                         max_num_points=3, max_voxels=10)
    pts = np.tile(np.asarray([[0.5, 0.5, 0.0, 1.0]], np.float32), (7, 1))
    pts[:, 3] = np.arange(7)
    out = gen.generate(pts, np.int32(7))
    # first 3 points by original order are kept
    np.testing.assert_allclose(np.asarray(out["voxels"])[0, :, 3], [0, 1, 2])


def test_voxelize_batch(rng):
    pc_range = [0, -10, -3, 20, 10, 1]
    gen = VoxelGenerator(voxel_size=[0.5, 0.5, 1.0], point_cloud_range=pc_range,
                         max_num_points=8, max_voxels=200)
    pts = rng.uniform(-1, 15, (2, 300, 4)).astype(np.float32)
    n = np.asarray([300, 120], np.int32)
    out = gen.generate_batch(pts, n)
    assert out["voxels"].shape == (2, 200, 8, 4)
    assert out["coords"].shape == (2, 200, 3)
    # second sample saw fewer points -> fewer voxels
    assert int(out["num_voxels"][1]) <= int(out["num_voxels"][0])


def test_grid_size():
    gen = VoxelGenerator(voxel_size=[0.16, 0.16, 4.0],
                         point_cloud_range=[0, -39.68, -3, 69.12, 39.68, 1],
                         max_num_points=100, max_voxels=12000)
    assert gen.grid_size == (432, 496, 1)


def test_voxelize_hashed_overflow_is_spatially_fair(rng):
    """Under overflow the hashed path keeps a spatially UNIFORM voxel
    subset (a plain sorted-id prefix would keep one corner of the scene
    and silently drop everything else)."""
    pc_range = [0, -10, -3, 20, 10, 1]
    gen = VoxelGenerator(voxel_size=[0.5, 0.5, 4.0],
                         point_cloud_range=pc_range, max_num_points=1,
                         max_voxels=100, order="hashed")
    # one point per pillar on a regular grid: 40x40 = 1600 voxels, keep 100
    xs, ys = np.meshgrid(np.arange(40) * 0.5 + 0.25,
                         np.arange(40) * 0.5 - 10 + 0.25)
    pts = np.zeros((1600, 4), np.float32)
    pts[:, 0] = xs.ravel()
    pts[:, 1] = ys.ravel()
    pts[:, 2] = -1.0
    out = gen.generate(pts, np.int32(1600))
    assert int(out["num_voxels"]) == 100
    kept = np.asarray(out["coords"])[:100]
    # kept x positions span the full range, in all four quadrants
    assert kept[:, 2].min() < 10 and kept[:, 2].max() >= 30
    assert kept[:, 1].min() < 10 and kept[:, 1].max() >= 30
    quad = (kept[:, 2] >= 20).astype(int) * 2 + (kept[:, 1] >= 20).astype(int)
    assert len(set(quad.tolist())) == 4


def test_voxelize_mean_matches_buffer_mean(rng):
    """Fused voxelize_mean == voxelize(order=hashed) + masked buffer mean,
    voxel-for-voxel (same hashed ordering), incl. max_points cap and
    overflow."""
    import jax.numpy as jnp

    pts = rng.uniform(-2, 10, (600, 5)).astype(np.float32)
    n = np.int32(550)                                   # trailing padding
    common = dict(voxel_size=(0.5, 0.5, 0.5),
                  point_cloud_range=(0, 0, 0, 8, 8, 4),
                  max_num_points=3, max_voxels=128)

    vg_buf = VoxelGenerator(order="hashed", **common)
    vg_fused = VoxelGenerator(fuse_mean=True, **common)
    a = vg_buf.generate(jnp.asarray(pts), n)
    b = vg_fused.generate(jnp.asarray(pts), n)

    np.testing.assert_array_equal(np.asarray(a["coords"]),
                                  np.asarray(b["coords"]))
    np.testing.assert_array_equal(np.asarray(a["num_points_per_voxel"]),
                                  np.asarray(b["num_points_per_voxel"]))
    assert int(a["num_voxels"]) == int(b["num_voxels"])

    buf = np.asarray(a["voxels"])                        # (V, T, C)
    cnt = np.asarray(a["num_points_per_voxel"])
    tmask = np.arange(buf.shape[1])[None, :] < cnt[:, None]
    ref_mean = (buf * tmask[..., None]).sum(1) / np.maximum(cnt, 1)[:, None]
    np.testing.assert_allclose(np.asarray(b["voxels"]), ref_mean,
                               rtol=1e-5, atol=1e-5)
    assert b["voxels"].ndim == 2

    # batched map path
    bb = vg_fused.generate_batch(jnp.asarray(pts[None]),
                                 jnp.asarray([n]))
    np.testing.assert_allclose(np.asarray(bb["voxels"][0]),
                               np.asarray(b["voxels"]), rtol=1e-6)


def test_voxelize_mean_overflow(rng):
    """Voxel overflow: fused path keeps the same uniform hashed subset."""
    import jax.numpy as jnp

    pts = rng.uniform(0, 8, (2000, 4)).astype(np.float32)
    common = dict(voxel_size=(0.25, 0.25, 0.25),
                  point_cloud_range=(0, 0, 0, 8, 8, 4),
                  max_num_points=2, max_voxels=64)
    a = VoxelGenerator(order="hashed", **common).generate(
        jnp.asarray(pts), np.int32(2000))
    b = VoxelGenerator(fuse_mean=True, **common).generate(
        jnp.asarray(pts), np.int32(2000))
    np.testing.assert_array_equal(np.asarray(a["coords"]),
                                  np.asarray(b["coords"]))
    np.testing.assert_array_equal(np.asarray(a["num_points_per_voxel"]),
                                  np.asarray(b["num_points_per_voxel"]))


def test_voxelize_yxz_order(rng):
    """order="yxz" emits the same voxel set/contents as hashed, with rows
    in (y, x, z) rank order — the sparse middles' bitmap row contract —
    in both the buffer and fused-mean paths."""
    pc_range = [0, -10, -3, 20, 10, 1]
    voxel_size = [0.5, 0.5, 1.0]
    n = 500
    pts = np.zeros((n, 4), np.float32)
    pts[:, 0] = rng.uniform(-2, 22, n)
    pts[:, 1] = rng.uniform(-12, 12, n)
    pts[:, 2] = rng.uniform(-4, 2, n)
    pts[:, 3] = rng.uniform(0, 1, n)

    kw = dict(voxel_size=voxel_size, point_cloud_range=pc_range,
              max_num_points=8, max_voxels=2000)
    ref = VoxelGenerator(order="hashed", **kw).generate(pts, np.int32(n))
    gen = VoxelGenerator(order="yxz", **kw)
    out = gen.generate(pts, np.int32(n))
    nv = int(ref["num_voxels"])
    assert int(out["num_voxels"]) == nv

    co = np.asarray(out["coords"])[:nv]              # zyx rows
    grid = gen.grid_size                             # (gx, gy, gz)
    rank_key = (co[:, 1] * grid[0] + co[:, 2]) * grid[2] + co[:, 0]
    assert (np.diff(rank_key) > 0).all()             # strict yxz order

    rc = np.asarray(ref["coords"])[:nv]
    r_key = (rc[:, 1] * grid[0] + rc[:, 2]) * grid[2] + rc[:, 0]
    perm = np.argsort(r_key)
    np.testing.assert_array_equal(co, rc[perm])
    np.testing.assert_allclose(np.asarray(out["voxels"])[:nv],
                               np.asarray(ref["voxels"])[:nv][perm], atol=0)

    # fused-mean path: same rank order, same per-voxel means
    mref = VoxelGenerator(order="hashed", fuse_mean=True,
                          **kw).generate(pts, np.int32(n))
    mout = VoxelGenerator(order="yxz", fuse_mean=True,
                          **kw).generate(pts, np.int32(n))
    assert int(mout["num_voxels"]) == nv
    mco = np.asarray(mout["coords"])[:nv]
    mkey = (mco[:, 1] * grid[0] + mco[:, 2]) * grid[2] + mco[:, 0]
    assert (np.diff(mkey) > 0).all()
    mrc = np.asarray(mref["coords"])[:nv]
    mperm = np.argsort((mrc[:, 1] * grid[0] + mrc[:, 2]) * grid[2]
                       + mrc[:, 0])
    np.testing.assert_array_equal(mco, mrc[mperm])
    np.testing.assert_allclose(np.asarray(mout["voxels"])[:nv],
                               np.asarray(mref["voxels"])[:nv][mperm],
                               rtol=1e-6, atol=1e-6)
