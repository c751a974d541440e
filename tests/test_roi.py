"""RoI op tests: points-in-boxes vs the framework's numpy twin, pooling
semantics, rotated RoI Align vs a direct numpy oracle on axis-aligned and
rotated boxes."""

import jax.numpy as jnp
import numpy as np

from det3d_tpu.core.augment import points_in_rbbox
from det3d_tpu.ops import roi


def test_points_in_boxes3d_matches_numpy_twin(rng):
    pts = rng.uniform(-10, 10, (256, 3)).astype(np.float32)
    boxes = np.array([
        [0.0, 0.0, 0.0, 2.0, 5.0, 2.0, 0.7],
        [4.0, -3.0, 0.5, 1.5, 3.0, 1.5, -1.2],
        [-5.0, 5.0, -0.5, 3.0, 3.0, 1.0, 0.0],
    ], np.float32)
    got = np.asarray(roi.points_in_boxes3d(jnp.asarray(pts),
                                           jnp.asarray(boxes)))
    want = points_in_rbbox(pts, boxes, origin=(0.5, 0.5, 0.5)).T  # (M, N)
    np.testing.assert_array_equal(got, want)


def test_points_in_boxes3d_extra_width(rng):
    pts = np.array([[1.2, 0.0, 0.0]], np.float32)     # just outside w=2 box
    box = np.array([[0, 0, 0, 2.0, 2.0, 2.0, 0.0]], np.float32)
    tight = np.asarray(roi.points_in_boxes3d(jnp.asarray(pts),
                                             jnp.asarray(box)))
    wide = np.asarray(roi.points_in_boxes3d(jnp.asarray(pts),
                                            jnp.asarray(box),
                                            extra_width=1.0))
    assert not tight[0, 0] and wide[0, 0]


def test_roipool3d_budget_and_canonical(rng):
    # 40 points inside box 0, none inside box 1
    n = 64
    pts = np.full((1, n, 3), 50.0, np.float32)
    inside = rng.uniform(-0.4, 0.4, (40, 3)).astype(np.float32)
    th = 0.6
    # forward rotation_2d convention: world = center + local @ [[c,-s],[s,c]]
    c, s = np.cos(th), np.sin(th)
    world = np.stack([2.0 + inside[:, 0] * c + inside[:, 1] * s,
                      3.0 - inside[:, 0] * s + inside[:, 1] * c,
                      -1.0 + inside[:, 2]], -1)
    pts[0, :40] = world
    feats = rng.randn(1, n, 4).astype(np.float32)
    boxes = np.array([[[2.0, 3.0, -1.0, 1.0, 1.0, 1.0, th],
                       [-20.0, -20.0, 0.0, 1.0, 1.0, 1.0, 0.0]]], np.float32)

    px, pf, empty = roi.roipool3d(jnp.asarray(pts), jnp.asarray(feats),
                                  jnp.asarray(boxes), extra_width=0.0,
                                  sampled_pt_num=16, canonical=True)
    px, pf, empty = np.asarray(px), np.asarray(pf), np.asarray(empty)
    assert not empty[0, 0] and empty[0, 1]
    # canonical points of box 0 are back in the local frame
    assert np.all(np.abs(px[0, 0]) <= 0.5 + 1e-5)
    # padded slots zeroed, first 16 of the 40 in-box points kept in order
    assert np.all(px[0, 1] == 0.0) and np.all(pf[0, 1] == 0.0)
    np.testing.assert_allclose(pf[0, 0], feats[0, :16], rtol=1e-6)


def test_rotated_roi_align_axis_aligned_oracle():
    # feature map = x coordinate; averaging over any axis-aligned roi bin
    # must return the bin's center x
    h = w = 16
    feat = np.broadcast_to(np.arange(w, dtype=np.float32)[None, :, None],
                           (h, w, 1)).copy()
    rois = np.array([[0, 8.0, 8.0, 8.0, 4.0, 0.0]], np.float32)
    out = np.asarray(roi.rotated_roi_align(jnp.asarray(feat[None]),
                                           jnp.asarray(rois), (2, 4), 1.0,
                                           sampling_ratio=2))
    assert out.shape == (1, 2, 4, 1)
    # roi spans x in [4, 12]; 4 bins of width 2 centered at 5, 7, 9, 11.
    # feat[i] = i sits at continuous coord i + 0.5, so f(x) = x - 0.5 and
    # each bin average is its center minus the half-pixel offset.
    np.testing.assert_allclose(out[0, 0, :, 0], [4.5, 6.5, 8.5, 10.5],
                               atol=1e-4)
    np.testing.assert_allclose(out[0, 1, :, 0], [4.5, 6.5, 8.5, 10.5],
                               atol=1e-4)


def test_rotated_roi_align_quarter_turn():
    # rotating the roi by 90 deg swaps which image axis the bins walk
    h = w = 16
    feat = np.broadcast_to(np.arange(h, dtype=np.float32)[:, None, None],
                           (h, w, 1)).copy()                    # feat = y
    base = np.array([[0, 8.0, 8.0, 8.0, 2.0, 0.0]], np.float32)
    rot = np.array([[0, 8.0, 8.0, 8.0, 2.0, np.pi / 2]], np.float32)
    out_base = np.asarray(roi.rotated_roi_align(
        jnp.asarray(feat[None]), jnp.asarray(base), (1, 4), 1.0, 2))
    out_rot = np.asarray(roi.rotated_roi_align(
        jnp.asarray(feat[None]), jnp.asarray(rot), (1, 4), 1.0, 2))
    # unrotated: bins walk x, f(y) = y - 0.5 constant at y=8 -> all 7.5
    np.testing.assert_allclose(out_base[0, 0, :, 0], [7.5] * 4, atol=1e-4)
    # rotated 90deg: bins walk +y -> centers at y = 5, 7, 9, 11 (minus the
    # half-pixel offset)
    np.testing.assert_allclose(out_rot[0, 0, :, 0], [4.5, 6.5, 8.5, 10.5],
                               atol=1e-4)


def test_rotated_roi_align_out_of_bounds_zero():
    feat = np.ones((1, 8, 8, 1), np.float32)
    rois = np.array([[0, 100.0, 100.0, 4.0, 4.0, 0.3]], np.float32)
    out = np.asarray(roi.rotated_roi_align(jnp.asarray(feat),
                                           jnp.asarray(rois), (2, 2), 1.0,
                                           2))
    np.testing.assert_allclose(out, 0.0)


def test_rotated_roi_align_differentiable():
    import jax
    feat = jnp.asarray(np.random.RandomState(0).randn(1, 8, 8, 2)
                       .astype(np.float32))
    rois = jnp.asarray(np.array([[0, 4.0, 4.0, 3.0, 2.0, 0.4]], np.float32))

    def loss(f):
        return jnp.sum(roi.rotated_roi_align(f, rois, (2, 2), 1.0, 2) ** 2)

    g = jax.grad(loss)(feat)
    assert np.isfinite(np.asarray(g)).all() and np.abs(np.asarray(g)).sum() > 0
