"""Golden tests for box math against independent numpy oracles."""

import numpy as np
import pytest

from det3d_tpu.core import box_ops


def _random_boxes(rng, n, ndim=7):
    boxes = np.zeros((n, ndim), np.float64)
    boxes[:, 0] = rng.uniform(-50, 50, n)       # x
    boxes[:, 1] = rng.uniform(-50, 50, n)       # y
    boxes[:, 2] = rng.uniform(-3, 1, n)         # z
    boxes[:, 3] = rng.uniform(0.5, 3, n)        # w
    boxes[:, 4] = rng.uniform(0.5, 6, n)        # l
    boxes[:, 5] = rng.uniform(0.5, 3, n)        # h
    if ndim == 9:
        boxes[:, 6] = rng.uniform(-3, 3, n)
        boxes[:, 7] = rng.uniform(-3, 3, n)
    boxes[:, -1] = rng.uniform(-np.pi, np.pi, n)
    return boxes


@pytest.mark.parametrize("ndim", [7, 9])
@pytest.mark.parametrize("vec", [False, True])
@pytest.mark.parametrize("smooth", [False, True])
def test_encode_decode_roundtrip(rng, ndim, vec, smooth):
    boxes = _random_boxes(rng, 64, ndim)
    anchors = _random_boxes(rng, 64, ndim)
    enc = box_ops.second_box_encode(boxes, anchors,
                                    encode_angle_to_vector=vec,
                                    smooth_dim=smooth)
    assert enc.shape == (64, ndim + 1 if vec else ndim)
    dec = box_ops.second_box_decode(enc, anchors,
                                    encode_angle_to_vector=vec,
                                    smooth_dim=smooth)
    if vec:
        # angle recovered modulo atan2 branch
        da = np.arctan2(np.sin(dec[:, -1] - boxes[:, -1]),
                        np.cos(dec[:, -1] - boxes[:, -1]))
        np.testing.assert_allclose(da, 0, atol=1e-6)
        np.testing.assert_allclose(dec[:, :-1], boxes[:, :-1], atol=1e-6)
    else:
        np.testing.assert_allclose(dec, boxes, atol=1e-6)


def test_encode_golden_values():
    """Hand-computed golden case for the SECOND encoding."""
    anchor = np.array([[0.0, 0.0, -1.0, 1.6, 3.9, 1.56, 0.0]])
    box = np.array([[1.0, 2.0, -0.5, 1.8, 4.2, 1.7, 0.3]])
    diag = np.sqrt(1.6 ** 2 + 3.9 ** 2)
    enc = box_ops.second_box_encode(box, anchor)
    np.testing.assert_allclose(enc[0, 0], 1.0 / diag, rtol=1e-6)
    np.testing.assert_allclose(enc[0, 1], 2.0 / diag, rtol=1e-6)
    np.testing.assert_allclose(enc[0, 2], 0.5 / 1.56, rtol=1e-6)
    np.testing.assert_allclose(enc[0, 3], np.log(1.8 / 1.6), rtol=1e-6)
    np.testing.assert_allclose(enc[0, 4], np.log(4.2 / 3.9), rtol=1e-6)
    np.testing.assert_allclose(enc[0, 5], np.log(1.7 / 1.56), rtol=1e-6)
    np.testing.assert_allclose(enc[0, 6], 0.3, rtol=1e-6)


def test_corners_2d_unrotated():
    dims = np.array([[2.0, 4.0]])
    centers = np.array([[10.0, 20.0]])
    corners = box_ops.center_to_corner_box2d(centers, dims,
                                             angles=np.array([0.0]))
    expect = np.array([[[9, 18], [9, 22], [11, 22], [11, 18]]], np.float64)
    np.testing.assert_allclose(corners, expect, atol=1e-6)


def test_rotation_2d_convention():
    """positive angle rotates clockwise (reference docstring, rotation_2d)."""
    pts = np.array([[[1.0, 0.0]]])
    out = box_ops.rotation_2d(pts, np.array([np.pi / 2]))
    np.testing.assert_allclose(out[0, 0], [0.0, -1.0], atol=1e-6)


def test_corner_standup_and_iou():
    b1 = np.array([[0.0, 0.0, 2.0, 2.0]])
    b2 = np.array([[1.0, 1.0, 3.0, 3.0], [5.0, 5.0, 6.0, 6.0]])
    iou = box_ops.iou_matrix(b1, b2)
    np.testing.assert_allclose(iou[0, 0], 1.0 / 7.0, rtol=1e-6)
    np.testing.assert_allclose(iou[0, 1], 0.0, atol=1e-9)


def test_limit_period():
    np.testing.assert_allclose(box_ops.limit_period(np.array([np.pi + 0.1])),
                               [0.1 - 0.0], atol=1e-6)
    np.testing.assert_allclose(
        box_ops.limit_period(np.array([3.5 * np.pi]), 0.5, 2 * np.pi),
        [-0.5 * np.pi], atol=1e-6)


def test_rbbox_to_near_bbox():
    rb = np.array([[0.0, 0.0, 2.0, 4.0, 0.0],
                   [0.0, 0.0, 2.0, 4.0, np.pi / 2]])
    near = box_ops.rbbox2d_to_near_bbox(rb)
    np.testing.assert_allclose(near[0], [-1, -2, 1, 2], atol=1e-6)
    # rotated 90deg: extents swap
    np.testing.assert_allclose(near[1], [-2, -1, 2, 1], atol=1e-6)


def test_jax_numpy_agree(rng):
    import jax.numpy as jnp
    boxes = _random_boxes(rng, 16).astype(np.float32)
    anchors = _random_boxes(rng, 16).astype(np.float32)
    enc_np = box_ops.second_box_encode(boxes, anchors)
    enc_jx = box_ops.second_box_encode(jnp.asarray(boxes), jnp.asarray(anchors))
    np.testing.assert_allclose(enc_np, np.asarray(enc_jx), rtol=1e-3, atol=1e-4)
