"""Sparse conv ops vs dense lax.conv oracle, and sparse middle smoke tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from det3d_tpu.ops import sparse as sp

SHAPE = (5, 9, 11)  # (D, H, W) zyx


def _rand_sparse(rng, n_active, v_pad, c):
    """Random unique active voxels padded to v_pad slots."""
    d, h, w = SHAPE
    lin = rng.choice(d * h * w, size=n_active, replace=False)
    z, y, x = lin // (h * w), (lin // w) % h, lin % w
    coords = np.full((v_pad, 3), -1, np.int32)
    coords[:n_active] = np.stack([z, y, x], -1)
    feats = np.zeros((v_pad, c), np.float32)
    feats[:n_active] = rng.randn(n_active, c).astype(np.float32)
    return jnp.asarray(feats), jnp.asarray(coords)


def _densify(feats, coords, shape):
    return np.asarray(sp.to_dense(feats[None], coords[None], shape))[0]


def _dense_conv(x, w, stride, padding):
    """x: (D,H,W,C); w: (K,Cin,Cout) row-major (kz,ky,kx) taps."""
    kz = ky = kx = round(w.shape[0] ** (1 / 3))
    if kz ** 3 != w.shape[0]:  # non-cubic kernels passed as explicit tuple
        raise ValueError
    wk = w.reshape(kz, ky, kx, w.shape[1], w.shape[2])
    s = (stride,) * 3 if isinstance(stride, int) else stride
    p = (padding,) * 3 if isinstance(padding, int) else padding
    return jax.lax.conv_general_dilated(
        x[None], wk, window_strides=s,
        padding=[(pp, pp) for pp in p],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))[0]


def test_subm_matches_dense_at_active_sites(rng):
    feats, coords = _rand_sparse(rng, 40, 64, 6)
    w = jnp.asarray(rng.randn(27, 6, 8).astype(np.float32))
    idx, mask = sp.subm_rulebook(coords, SHAPE, 3)
    out = sp.apply_conv(feats[None], idx[None], mask[None], w)[0]

    dense_in = _densify(feats, coords, SHAPE)
    dense_out = np.asarray(_dense_conv(jnp.asarray(dense_in), w, 1, 1))
    co = np.asarray(coords)
    for i in range(40):
        z, y, x = co[i]
        np.testing.assert_allclose(np.asarray(out[i]), dense_out[z, y, x],
                                   rtol=2e-4, atol=2e-4)
    # padded rows produce zeros
    np.testing.assert_allclose(np.asarray(out[40:]), 0.0)


def test_strided_conv_matches_dense_everywhere(rng):
    """Scattering the sparse output reproduces the dense conv exactly:
    dense output is zero wherever the kernel footprint has no active input,
    and the sparse output set covers every position with coverage."""
    feats, coords = _rand_sparse(rng, 35, 64, 4)
    w = jnp.asarray(rng.randn(27, 4, 5).astype(np.float32))

    out_co, oshape = sp.conv_out_coords(coords, SHAPE, 3, 2, 1, 128)
    idx, mask = sp.conv_rulebook(coords, SHAPE, out_co, 3, 2, 1)
    out = sp.apply_conv(feats[None], idx[None], mask[None], w)[0]

    sparse_as_dense = _densify(out, out_co, oshape)
    dense_in = _densify(feats, coords, SHAPE)
    dense_out = np.asarray(_dense_conv(jnp.asarray(dense_in), w, 2, 1))
    assert dense_out.shape == sparse_as_dense.shape
    np.testing.assert_allclose(sparse_as_dense, dense_out,
                               rtol=2e-4, atol=2e-4)


def test_asym_padding_strided_conv(rng):
    feats, coords = _rand_sparse(rng, 30, 48, 4)
    w = jnp.asarray(rng.randn(27, 4, 4).astype(np.float32))
    pad = (0, 1, 1)
    out_co, oshape = sp.conv_out_coords(coords, SHAPE, 3, 2, pad, 128)
    idx, mask = sp.conv_rulebook(coords, SHAPE, out_co, 3, 2, pad)
    out = sp.apply_conv(feats[None], idx[None], mask[None], w)[0]
    sparse_as_dense = _densify(out, out_co, oshape)
    dense_in = _densify(feats, coords, SHAPE)
    dense_out = np.asarray(_dense_conv(jnp.asarray(dense_in), w, 2, pad))
    np.testing.assert_allclose(sparse_as_dense, dense_out, rtol=2e-4,
                               atol=2e-4)


def test_non_cubic_kernel(rng):
    """(3,1,1) stride (2,1,1) z-collapse conv (final SECOND stage)."""
    feats, coords = _rand_sparse(rng, 30, 48, 4)
    w = jnp.asarray(rng.randn(3, 4, 4).astype(np.float32))
    out_co, oshape = sp.conv_out_coords(coords, SHAPE, (3, 1, 1), (2, 1, 1),
                                        0, 128)
    idx, mask = sp.conv_rulebook(coords, SHAPE, out_co, (3, 1, 1), (2, 1, 1),
                                 0)
    out = sp.apply_conv(feats[None], idx[None], mask[None], w)[0]
    sparse_as_dense = _densify(out, out_co, oshape)
    dense_in = _densify(feats, coords, SHAPE)
    wk = w.reshape(3, 1, 1, 4, 4)
    dense_out = np.asarray(jax.lax.conv_general_dilated(
        jnp.asarray(dense_in)[None], wk, window_strides=(2, 1, 1),
        padding=[(0, 0)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))[0])
    np.testing.assert_allclose(sparse_as_dense, dense_out, rtol=2e-4,
                               atol=2e-4)


def _expected_out_set(coords, oshape):
    expect = set()
    for c in np.asarray(coords).tolist():
        if c[0] < 0:
            continue
        for tz in range(3):
            for ty in range(3):
                for tx in range(3):
                    oz, rz = divmod(c[0] + 1 - tz, 2)
                    oy, ry = divmod(c[1] + 1 - ty, 2)
                    ox, rx = divmod(c[2] + 1 - tx, 2)
                    if rz or ry or rx:
                        continue
                    if (0 <= oz < oshape[0] and 0 <= oy < oshape[1]
                            and 0 <= ox < oshape[2]):
                        expect.add((oz, oy, ox))
    return expect


def test_out_coords_exact_set(rng):
    """conv_out_coords = exactly the strided positions with footprint
    coverage (spconv semantics). Note a sparse stride-2 conv can EXPAND the
    active set (up to 8x for isolated voxels), so give it plenty of slots."""
    _, coords = _rand_sparse(rng, 25, 40, 1)
    out_co, oshape = sp.conv_out_coords(coords, SHAPE, 3, 2, 1, 256)
    got = {tuple(c) for c in np.asarray(out_co).tolist() if c[0] >= 0}
    expect = _expected_out_set(coords, oshape)
    assert got == expect


def test_out_coords_overflow_truncates(rng):
    """With too few slots the result is a subset (lowest linear ids kept)."""
    _, coords = _rand_sparse(rng, 25, 40, 1)
    out_full, oshape = sp.conv_out_coords(coords, SHAPE, 3, 2, 1, 256)
    out_small, _ = sp.conv_out_coords(coords, SHAPE, 3, 2, 1, 16)
    full = {tuple(c) for c in np.asarray(out_full).tolist() if c[0] >= 0}
    small = [tuple(c) for c in np.asarray(out_small).tolist() if c[0] >= 0]
    assert len(small) == 16 and len(set(small)) == 16
    assert set(small) <= full


@pytest.mark.parametrize("cls_name", ["SpMiddleFHD", "SpMiddleResNetFHD"])
def test_middle_backbone_forward_and_grad(rng, cls_name):
    from det3d_tpu.models import backbones as bb
    cls = getattr(bb, cls_name)
    grid = (16, 16, 40)                      # (nx, ny, nz); z like KITTI
    b, v, c = 2, 64, 4
    model = cls(num_input_features=c)
    feats = jnp.asarray(rng.randn(b, v, c).astype(np.float32))
    coords = np.full((b, v, 3), -1, np.int32)
    for i in range(b):
        lin = rng.choice(40 * 16 * 16, size=40, replace=False)
        coords[i, :40] = np.stack(
            [lin // 256, (lin // 16) % 16, lin % 16], -1)
    coords = jnp.asarray(coords)
    variables = model.init(jax.random.PRNGKey(0), feats, coords, grid,
                           train=False)
    out = model.apply(variables, feats, coords, grid, train=False)
    # z: 41 -> 21 -> 11 -> 5 -> 2; BEV H/8, W/8 = 2, 2
    assert out.shape[0] == b and out.shape[1] == 2 and out.shape[2] == 2
    assert np.isfinite(np.asarray(out)).all()

    def loss_fn(params):
        y, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            feats, coords, grid, train=True, mutable=["batch_stats"])
        return jnp.sum(y ** 2)

    grads = jax.grad(loss_fn)(variables["params"])
    gnorm = float(jax.tree_util.tree_reduce(
        lambda a, x: a + jnp.sum(x ** 2), grads, 0.0) ** 0.5)
    assert np.isfinite(gnorm) and gnorm > 0


def test_native_kernels_match_numpy(rng):
    """csrc pointops (when buildable) agree with the numpy reference."""
    import os
    from det3d_tpu import csrc
    from det3d_tpu.core import augment
    if csrc.get_lib() is None:
        pytest.skip("native toolchain unavailable")

    pts = rng.uniform(-10, 10, (500, 4)).astype(np.float32)
    boxes = np.c_[rng.uniform(-8, 8, (9, 2)), rng.uniform(-1, 0, (9, 1)),
                  rng.uniform(1, 4, (9, 3)), rng.uniform(-np.pi, np.pi, 9)]
    native = csrc.points_in_rbbox(pts, boxes.astype(np.float32))
    os.environ["DET3D_NATIVE"] = "0"
    try:
        # force the numpy branch by calling the underlying formula
        centers, dims, angles = boxes[:, :3], boxes[:, 3:6], boxes[:, -1]
        rel = pts[:, None, :3] - centers[None]
        c, s = np.cos(angles), np.sin(angles)
        x = rel[..., 0] * c[None] - rel[..., 1] * s[None]
        y = rel[..., 0] * s[None] + rel[..., 1] * c[None]
        z = rel[..., 2]
        ref = ((np.abs(x) <= dims[None, :, 0] / 2)
               & (np.abs(y) <= dims[None, :, 1] / 2)
               & (np.abs(z) <= dims[None, :, 2] / 2))
    finally:
        os.environ.pop("DET3D_NATIVE", None)
    assert (native == ref).mean() > 0.999      # boundary ties only

    ca = augment.corners_bev(np.c_[rng.uniform(-5, 5, (20, 2)),
                                   rng.uniform(1, 4, (20, 2)),
                                   rng.uniform(-np.pi, np.pi, 20)])
    cb = augment.corners_bev(np.c_[rng.uniform(-5, 5, (15, 2)),
                                   rng.uniform(1, 4, (15, 2)),
                                   rng.uniform(-np.pi, np.pi, 15)])
    n, k = 20, 15
    pa = np.broadcast_to(ca[:, None], (n, k, 4, 2)).reshape(-1, 4, 2)
    pb = np.broadcast_to(cb[None, :], (n, k, 4, 2)).reshape(-1, 4, 2)
    nat = csrc.intersection_area(pa, pb)
    ref = augment.intersection_area_corners(pa, pb)
    np.testing.assert_allclose(nat, ref, rtol=1e-9, atol=1e-9)



# ---------------------------------------------------------------------------
# Window rulebooks (per-BEV-column contiguous-rank fetches)
# ---------------------------------------------------------------------------


def _ranked(rng, b, n_active, v_pad, c, shape):
    """Batched random sparse tensors in yxz rank order + bitmap lookup."""
    d, h, w = shape
    feats, coords = [], []
    for i in range(b):
        lin = rng.choice(d * h * w, size=n_active, replace=False)
        z, y, x = lin // (h * w), (lin // w) % h, lin % w
        co = np.full((v_pad, 3), -1, np.int32)
        co[:n_active] = np.stack([z, y, x], -1)
        f = np.zeros((v_pad, c), np.float32)
        f[:n_active] = rng.randn(n_active, c).astype(np.float32)
        feats.append(f)
        coords.append(co)
    feats = jnp.asarray(np.stack(feats))
    coords = jnp.asarray(np.stack(coords))
    order, coords, lookup = sp.stage_lookup_batch(coords, shape)
    feats = jnp.take_along_axis(feats, order[..., None], axis=1)
    return feats, coords, lookup


def test_window_subm_matches_flat(rng):
    feats, coords, lookup = _ranked(rng, 2, 40, 64, 6, SHAPE)
    w = jnp.asarray(rng.randn(27, 6, 8).astype(np.float32))
    assert lookup[0] == "bitmap"

    fidx, fmask = sp.subm_rulebook_batch(coords, SHAPE, 3, lookup)
    ref = sp.apply_conv(feats, fidx, fmask, w)

    r0, pres = sp.subm_window_rulebook_batch(coords, SHAPE, 3, lookup)
    assert pres.ndim == 4
    out = sp.apply_conv(feats, r0, pres, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)

    # the center-shift fast path (dispatched via z_shift_taps)
    out_s = sp.apply_conv(feats, r0, pres, w,
                          z_shift_taps=sp.center_column_taps(3))
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_window_strided_matches_flat(rng):
    feats, coords, lookup = _ranked(rng, 2, 35, 64, 4, SHAPE)
    w = jnp.asarray(rng.randn(27, 4, 5).astype(np.float32))
    pad = (0, 1, 1)
    out_co, _ = jax.vmap(
        lambda co: sp.conv_out_coords(co, SHAPE, 3, 2, pad, 128))(coords)

    fidx, fmask = sp.conv_rulebook_batch(SHAPE, out_co, 3, 2, pad, lookup)
    ref = sp.apply_conv(feats, fidx, fmask, w)

    r0, pres = sp.conv_window_rulebook_batch(SHAPE, out_co, 3, 2, pad,
                                             lookup)
    out = sp.apply_conv(feats, r0, pres, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_window_non_cubic_z_collapse(rng):
    """(3,1,1)/(2,1,1) final-stage conv: Kbev=1, kz=3 windows."""
    feats, coords, lookup = _ranked(rng, 1, 30, 48, 4, SHAPE)
    w = jnp.asarray(rng.randn(3, 4, 4).astype(np.float32))
    out_co, _ = jax.vmap(lambda co: sp.conv_out_coords(
        co, SHAPE, (3, 1, 1), (2, 1, 1), 0, 128))(coords)
    fidx, fmask = sp.conv_rulebook_batch(SHAPE, out_co, (3, 1, 1),
                                         (2, 1, 1), 0, lookup)
    ref = sp.apply_conv(feats, fidx, fmask, w)
    r0, pres = sp.conv_window_rulebook_batch(SHAPE, out_co, (3, 1, 1),
                                             (2, 1, 1), 0, lookup)
    out = sp.apply_conv(feats, r0, pres, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_window_conv_grad_flows(rng):
    feats, coords, lookup = _ranked(rng, 1, 30, 48, 4, SHAPE)
    w = jnp.asarray(rng.randn(27, 4, 4).astype(np.float32))
    r0, pres = sp.subm_window_rulebook_batch(coords, SHAPE, 3, lookup)
    fidx, fmask = sp.subm_rulebook_batch(coords, SHAPE, 3, lookup)

    def loss_win(f, ww):
        return sp.apply_conv(f, r0, pres, ww,
                             z_shift_taps=sp.center_column_taps(3)).sum()

    def loss_flat(f, ww):
        return sp.apply_conv(f, fidx, fmask, ww).sum()

    gf_w, gw_w = jax.grad(loss_win, argnums=(0, 1))(feats, w)
    gf_f, gw_f = jax.grad(loss_flat, argnums=(0, 1))(feats, w)
    assert np.isfinite(np.asarray(gf_w)).all()
    np.testing.assert_allclose(np.asarray(gf_w), np.asarray(gf_f),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gw_w), np.asarray(gw_f),
                               rtol=2e-4, atol=2e-4)


def test_window_strided_grad_matches_flat(rng):
    """Strided window convs use the flat fallback backward — check it."""
    feats, coords, lookup = _ranked(rng, 1, 30, 48, 4, SHAPE)
    w = jnp.asarray(rng.randn(27, 4, 4).astype(np.float32))
    out_co, _ = jax.vmap(
        lambda co: sp.conv_out_coords(co, SHAPE, 3, 2, 1, 128))(coords)
    r0, pres = sp.conv_window_rulebook_batch(SHAPE, out_co, 3, 2, 1, lookup)
    fidx, fmask = sp.conv_rulebook_batch(SHAPE, out_co, 3, 2, 1, lookup)

    def loss_win(f, ww):
        return (sp.apply_conv(f, r0, pres, ww) ** 2).sum()

    def loss_flat(f, ww):
        return (sp.apply_conv(f, fidx, fmask, ww) ** 2).sum()

    gf_w, gw_w = jax.grad(loss_win, argnums=(0, 1))(feats, w)
    gf_f, gw_f = jax.grad(loss_flat, argnums=(0, 1))(feats, w)
    np.testing.assert_allclose(np.asarray(gf_w), np.asarray(gf_f),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gw_w), np.asarray(gw_f),
                               rtol=2e-4, atol=2e-4)


def test_inverse_rulebook_strided_grad_matches_flat(rng):
    """The gather-based (inverse-rulebook) strided backward must produce
    the same gradients as the flat scatter-based one, for both the
    k3/s2 asymmetric-pad downsample and the (3,1,1)/(2,1,1) z-collapse."""
    for kernel, stride, pad in ((3, 2, (0, 1, 1)),
                                ((3, 1, 1), (2, 1, 1), 0)):
        feats, coords, lookup = _ranked(rng, 2, 35, 64, 4, SHAPE)
        w_np = rng.randn(int(np.prod(np.broadcast_to(
            np.asarray(kernel), (3,)))), 4, 5).astype(np.float32)
        w = jnp.asarray(w_np)
        out_co, oshape = jax.vmap(lambda co: sp.conv_out_coords(
            co, SHAPE, kernel, stride, pad, 128))(coords)[0], \
            sp.out_spatial_shape(SHAPE, kernel, stride, pad)
        # rank-order the outputs and build their bitmap (as the backbones do)
        _, out_co, out_lookup = sp.stage_lookup_batch(out_co, oshape)

        r0, pres = sp.conv_window_rulebook_batch(SHAPE, out_co, kernel,
                                                 stride, pad, lookup)
        fidx, fmask = sp.conv_rulebook_batch(SHAPE, out_co, kernel, stride,
                                             pad, lookup)
        inv = sp.strided_inverse_rulebook_batch(coords, kernel, stride,
                                                pad, out_lookup, oshape)
        assert inv is not None

        def loss_inv(f, ww):
            return (sp.apply_conv(f, r0, pres, ww, inverse=inv) ** 2).sum()

        def loss_flat(f, ww):
            return (sp.apply_conv(f, fidx, fmask, ww) ** 2).sum()

        out_i = sp.apply_conv(feats, r0, pres, w, inverse=inv)
        out_f = sp.apply_conv(feats, fidx, fmask, w)
        np.testing.assert_allclose(np.asarray(out_i), np.asarray(out_f),
                                   rtol=2e-4, atol=2e-4)

        gf_i, gw_i = jax.grad(loss_inv, argnums=(0, 1))(feats, w)
        gf_f, gw_f = jax.grad(loss_flat, argnums=(0, 1))(feats, w)
        np.testing.assert_allclose(np.asarray(gf_i), np.asarray(gf_f),
                                   rtol=2e-4, atol=2e-4), kernel
        np.testing.assert_allclose(np.asarray(gw_i), np.asarray(gw_f),
                                   rtol=2e-4, atol=2e-4)


def test_window_rulebooks_at_grid_boundaries():
    """Deterministic edge coverage for the row-span fetch: every boundary
    column (x=0, x=w-1, y=0, y=h-1, all four corners) active, so kernel
    rows span the table guards and wrap into neighboring rows — the
    wrapped words must all be masked, matching the non-bitmap oracle."""
    d, h, w = SHAPE
    cells = set()
    for y in range(h):
        cells.add((0, y, 0))
        cells.add((d - 1, y, w - 1))
    for x in range(w):
        cells.add((1, 0, x))
        cells.add((2, h - 1, x))
    co = np.full((len(cells) + 7, 3), -1, np.int32)
    co[:len(cells)] = sorted(cells)
    coords = jnp.asarray(co)[None]

    order, coords, lookup = sp.stage_lookup_batch(coords, SHAPE)
    assert lookup[0] == "bitmap"
    r0, pres = sp.subm_window_rulebook_batch(coords, SHAPE, 3, lookup)
    widx, wmask = sp.window_to_flat(r0, pres)
    fidx, fmask = sp.subm_rulebook_batch(coords, SHAPE, 3, None)
    np.testing.assert_array_equal(np.asarray(wmask), np.asarray(fmask))
    np.testing.assert_array_equal(np.asarray(widx * wmask),
                                  np.asarray(fidx * fmask))

    # strided rulebook with padding 1: output x=0 queries x in {-1, 0, 1}
    oc, _ = jax.vmap(lambda c: sp.conv_out_coords(
        c, SHAPE, 3, 2, 1, 64))(coords)
    oshape = sp.out_spatial_shape(SHAPE, 3, 2, 1)
    _, oc, out_lookup = sp.stage_lookup_batch(oc, oshape)
    r0d, presd = sp.conv_window_rulebook_batch(SHAPE, oc, 3, 2, 1, lookup)
    didx, dmask = sp.window_to_flat(r0d, presd)
    fidx2, fmask2 = sp.conv_rulebook_batch(SHAPE, oc, 3, 2, 1,
                                           sp.build_lookup_batch(coords,
                                                                 SHAPE))
    np.testing.assert_array_equal(np.asarray(dmask), np.asarray(fmask2))
    np.testing.assert_array_equal(np.asarray(didx * dmask),
                                  np.asarray(fidx2 * fmask2))


@pytest.mark.parametrize("max_out", [64, 9])
def test_stage_transition_matches_sort_path(rng, max_out):
    """The fused sort-free transition must equal conv_out_coords ->
    stage_lookup_batch exactly: same rows (yxz rank order), same
    interleaved bitmap words — including under cap overflow, where both
    keep the identical low-z prefix."""
    b = 2
    coords = []
    for i in range(b):
        d, h, w = SHAPE
        lin = rng.choice(d * h * w, size=37, replace=False)
        z, y, x = lin // (h * w), (lin // w) % h, lin % w
        co = np.full((48, 3), -1, np.int32)
        co[:37] = np.stack([z, y, x], -1)
        coords.append(co)
    coords = jnp.asarray(np.stack(coords))

    for kernel, stride, pad in [(3, 2, 1), (3, 2, (0, 1, 1)),
                                ((3, 1, 1), (2, 1, 1), 0)]:
        oshape = sp.out_spatial_shape(SHAPE, kernel, stride, pad)
        oc_ref, _ = jax.vmap(lambda c: sp.conv_out_coords(
            c, SHAPE, kernel, stride, pad, max_out))(coords)
        _, oc_ref, lk_ref = sp.stage_lookup_batch(oc_ref, oshape)
        oc_new, oshape2, lk_new, inv_new = sp.stage_transition_batch(
            coords, SHAPE, kernel, stride, pad, max_out,
            build_inverse=True)
        assert oshape2 == oshape
        assert lk_ref[0] == "bitmap" and lk_new[0] == "bitmap"
        np.testing.assert_array_equal(np.asarray(oc_new),
                                      np.asarray(oc_ref)), (kernel, max_out)
        np.testing.assert_array_equal(np.asarray(lk_new[1]),
                                      np.asarray(lk_ref[1]))

        inv_ref = sp.strided_inverse_rulebook_batch(
            coords, kernel, stride, pad, lk_ref, oshape)
        assert inv_ref is not None and inv_new is not None
        np.testing.assert_array_equal(np.asarray(inv_new[1]),
                                      np.asarray(inv_ref[1]))   # presi
        np.testing.assert_array_equal(
            np.asarray(inv_new[0]) * np.asarray(inv_new[1]).any(-1),
            np.asarray(inv_ref[0]) * np.asarray(inv_ref[1]).any(-1))
        np.testing.assert_array_equal(np.asarray(inv_new[2]),
                                      np.asarray(inv_ref[2]))   # par
        assert inv_new[3] == inv_ref[3]


def test_empty_cloud_through_middle():
    """Zero active voxels (all padding rows) must flow through the
    transition, rulebooks, and a full middle forward without NaN/Inf —
    the degenerate first batch a dataloader can emit."""
    coords = jnp.full((2, 32, 3), -1, jnp.int32)
    feats = jnp.zeros((2, 32, 4), jnp.float32)

    oc, oshape, lk, inv = sp.stage_transition_batch(
        coords, SHAPE, 3, 2, 1, 32, build_inverse=True)
    assert (np.asarray(oc) == -1).all()
    r0, pres = sp.subm_window_rulebook_batch(
        jnp.take_along_axis(coords, jax.vmap(
            lambda c: sp.yxz_order(c, SHAPE))(coords)[..., None], axis=1),
        SHAPE, 3, ("bitmap", sp.build_bitmap_batch(coords, SHAPE)))
    assert not np.asarray(pres).any()

    from det3d_tpu.models.backbones import SpMiddleFHD
    m = SpMiddleFHD(num_input_features=4)
    grid = (16, 16, 40)                        # (nx, ny, nz), z like KITTI
    vars_ = m.init(jax.random.PRNGKey(0), feats, coords, grid, train=False)
    out = m.apply(vars_, feats, coords, grid, train=False)
    assert np.isfinite(np.asarray(out)).all()
