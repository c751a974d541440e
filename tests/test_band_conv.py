"""Banded one-hot matmul subm conv (ops/band_conv.py): equality with the
slice-gather window conv, and the plan-band certification helpers.

Runs the Pallas kernel in interpreter mode (CPU test mesh); the TPU
whole-program A/B lives in bench.py / tools/probes/probe_bandmm.py.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from det3d_tpu.ops import sparse as sp
from det3d_tpu.ops.band_conv import (band_window_conv, certify_plan_bands,
                                     plan_band)

SHAPE = (5, 24, 24)


def _rulebook(rng, v=96, actives=70, b=2):
    d, h, w = SHAPE
    cols = np.sort(rng.choice(h * w, size=actives, replace=False))
    zs = rng.randint(0, 3, size=actives)
    co = np.stack([zs, cols // w, cols % w], 1).astype(np.int32)
    co = np.concatenate([co, np.full((v - actives, 3), -1, np.int32)])
    key = (co[:, 1].astype(np.int64) * w + co[:, 2]) * d + co[:, 0]
    key[co[:, 0] < 0] = np.iinfo(np.int64).max
    co = co[np.argsort(key, kind="stable")]
    cob = jnp.asarray(np.stack([co] * b))
    lookup = ("bitmap", sp.build_bitmap_batch(cob, SHAPE))
    return sp.subm_window_rulebook_batch(cob, SHAPE, 3, lookup)


@pytest.mark.parametrize("c,cout", [(8, 8), (8, 16)])
def test_band_conv_matches_gather(rng, c, cout):
    r0, pres = _rulebook(rng)
    b, v = r0.shape[:2]
    x = jnp.asarray(rng.randn(b, v, c).astype(np.float32))
    w = jnp.asarray(rng.randn(27, c, cout).astype(np.float32) * 0.1)
    zt = sp.center_column_taps(3)
    y_ref = np.asarray(sp.apply_conv(x, r0, pres, w, z_shift_taps=zt))
    y_band = np.asarray(band_window_conv(x, r0, pres, w, band=128,
                                         block_rows=32, interpret=True))
    np.testing.assert_allclose(y_band, y_ref, rtol=0, atol=1e-5)
    # the public dispatch reaches the same kernel (interpret off-TPU)
    y_disp = np.asarray(sp.apply_conv(x, r0, pres, w, z_shift_taps=zt,
                                      band=128))
    np.testing.assert_allclose(y_disp, y_ref, rtol=0, atol=1e-5)


def test_band_conv_empty_batch(rng):
    """All-padding rulebook rows: zero output, no NaN."""
    b, v, c = 2, 64, 8
    r0 = jnp.zeros((b, v, 9), jnp.int32)
    pres = jnp.zeros((b, v, 9, 3), bool)
    x = jnp.asarray(rng.randn(b, v, c).astype(np.float32))
    w = jnp.asarray(rng.randn(27, c, c).astype(np.float32))
    y = np.asarray(band_window_conv(x, r0, pres, w, band=128,
                                    block_rows=32, interpret=True))
    np.testing.assert_array_equal(y, np.zeros_like(y))


def test_plan_band_and_certify(rng):
    r0, pres = _rulebook(rng)
    pbits = np.zeros(pres.shape[:-1], np.int32)
    for j in range(3):
        pbits |= np.asarray(pres)[..., j].astype(np.int32) << j
    packed = (np.asarray(r0) & 0xFFFFFF) | (pbits << 24)
    band = plan_band(packed, block_rows=32)
    assert 0 < band <= r0.shape[1] + 4
    plan = {"plan_s0": packed}
    assert certify_plan_bands(plan, band, block_rows=32)
    assert not certify_plan_bands(plan, band - 8, block_rows=32) or band <= 8


def test_host_plan_fn_certifies(rng, monkeypatch):
    """host_plan_fn raises when a scan exceeds the middle's serve_band."""
    from det3d_tpu.apis.train import host_plan_fn
    from det3d_tpu.core.voxelize import VoxelGenerator
    from det3d_tpu.models import backbones as bb

    vg = VoxelGenerator(voxel_size=[0.1, 0.1, 0.2],
                        point_cloud_range=[0, -4.0, -1.0, 7.2, 4.0, 1.2],
                        max_num_points=5, max_voxels=600, order="yxz",
                        fuse_mean=True)

    class Model:
        backbone = bb.SpMiddleFHD(num_input_features=4, pre_ranked=True,
                                  serve_band=8)     # absurdly tight

    pts = rng.uniform([0, -4, -1, 0], [7.2, 4, 1.2, 1],
                      size=(1, 900, 4)).astype(np.float32)
    n = np.asarray([900], np.int32)
    fn = host_plan_fn(Model(), vg, train=False)
    with pytest.raises(ValueError, match="serve_band"):
        fn(pts, n)

    Model.backbone = bb.SpMiddleFHD(num_input_features=4, pre_ranked=True,
                                    serve_band=4096)
    fn = host_plan_fn(Model(), vg, train=False)
    plan = fn(pts, n)
    assert "plan_s0" in plan
    # train plans skip certification (band path is serving-only)
    Model.backbone = bb.SpMiddleFHD(num_input_features=4, pre_ranked=True,
                                    serve_band=8)
    fn = host_plan_fn(Model(), vg, train=True)
    assert fn(pts, n)


@pytest.mark.parametrize("c,cout", [(8, 8), (8, 16)])
def test_band_conv_col_band_matches_gather(rng, c, cout):
    """Per-column sub-band mode equals the gather path exactly."""
    r0, pres = _rulebook(rng)
    b, v = r0.shape[:2]
    x = jnp.asarray(rng.randn(b, v, c).astype(np.float32))
    w = jnp.asarray(rng.randn(27, c, cout).astype(np.float32) * 0.1)
    zt = sp.center_column_taps(3)
    y_ref = np.asarray(sp.apply_conv(x, r0, pres, w, z_shift_taps=zt))
    # certify the per-column bucket on this rulebook, then run with it
    pbits = np.zeros(pres.shape[:-1], np.int32)
    for j in range(3):
        pbits |= np.asarray(pres)[..., j].astype(np.int32) << j
    packed = (np.asarray(r0) & 0xFFFFFF) | (pbits << 24)
    cb = plan_band(packed, block_rows=32, per_col=True)
    assert cb <= plan_band(packed, block_rows=32) + 11
    y_band = np.asarray(band_window_conv(x, r0, pres, w, band=128,
                                         block_rows=32, col_band=cb,
                                         interpret=True))
    np.testing.assert_allclose(y_band, y_ref, rtol=0, atol=1e-5)
    y_disp = np.asarray(sp.apply_conv(x, r0, pres, w, z_shift_taps=zt,
                                      band=128, col_band=cb))
    np.testing.assert_allclose(y_disp, y_ref, rtol=0, atol=1e-5)


def test_band_conv_col_band_tight_bucket(rng):
    """col_band smaller than band still exact when certified (Sc < S)."""
    r0, pres = _rulebook(rng, v=256, actives=200)
    b, v, c = r0.shape[0], r0.shape[1], 8
    x = jnp.asarray(rng.randn(b, v, c).astype(np.float32))
    w = jnp.asarray(rng.randn(27, c, c).astype(np.float32) * 0.1)
    zt = sp.center_column_taps(3)
    y_ref = np.asarray(sp.apply_conv(x, r0, pres, w, z_shift_taps=zt))
    pbits = np.zeros(pres.shape[:-1], np.int32)
    for j in range(3):
        pbits |= np.asarray(pres)[..., j].astype(np.int32) << j
    packed = (np.asarray(r0) & 0xFFFFFF) | (pbits << 24)
    cb = plan_band(packed, block_rows=64, per_col=True)
    bd = plan_band(packed, block_rows=64)
    y_band = np.asarray(band_window_conv(x, r0, pres, w, band=bd,
                                         block_rows=64, col_band=cb,
                                         interpret=True))
    np.testing.assert_allclose(y_band, y_ref, rtol=0, atol=1e-5)


def test_band_conv_strided_matches_gather(rng):
    """center_shift=False (strided/down convs): band path equals the
    slice-gather window conv on a downsample rulebook."""
    from det3d_tpu.models.backbones import _stage_rulebooks
    d, h, w = SHAPE
    v = 96
    actives = 70
    cols = np.sort(rng.choice(h * w, size=actives, replace=False))
    zs = rng.randint(0, 3, size=actives)
    co = np.stack([zs, cols // w, cols % w], 1).astype(np.int32)
    co = np.concatenate([co, np.full((v - actives, 3), -1, np.int32)])
    key = (co[:, 1].astype(np.int64) * w + co[:, 2]) * d + co[:, 0]
    key[co[:, 0] < 0] = np.iinfo(np.int64).max
    co = co[np.argsort(key, kind="stable")]
    cob = jnp.asarray(np.stack([co] * 2))
    lookup = ("bitmap", sp.build_bitmap_batch(cob, SHAPE))
    _, r0, pres, _, _, _, _, _ = _stage_rulebooks(
        cob, SHAPE, 3, 2, 1, max_out=None, in_lookup=lookup,
        build_subm=False)

    c, cout = 8, 16
    x = jnp.asarray(rng.randn(2, v, c).astype(np.float32))
    wts = jnp.asarray(rng.randn(27, c, cout).astype(np.float32) * 0.1)
    y_ref = np.asarray(sp.apply_conv(x, r0, pres, wts))
    y_band = np.asarray(band_window_conv(x, r0, pres, wts, band=128,
                                         block_rows=32, center_shift=False,
                                         interpret=True))
    np.testing.assert_allclose(y_band, y_ref, rtol=0, atol=1e-5)
    # per-column mode too
    pbits = np.zeros(pres.shape[:-1], np.int32)
    for j in range(3):
        pbits |= np.asarray(pres)[..., j].astype(np.int32) << j
    packed = (np.asarray(r0) & 0xFFFFFF) | (pbits << 24)
    cb = plan_band(packed, block_rows=32, per_col=True)
    y_cb = np.asarray(band_window_conv(x, r0, pres, wts, band=128,
                                       block_rows=32, col_band=cb,
                                       center_shift=False, interpret=True))
    np.testing.assert_allclose(y_cb, y_ref, rtol=0, atol=1e-5)
