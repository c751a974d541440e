"""Rotated IoU kernel vs a rasterization (Monte-Carlo grid) oracle."""

import numpy as np
import pytest

from det3d_tpu.core import box_ops, geometry


def _raster_iou(b1, b2, res=400):
    """Dense-grid intersection oracle for two rotated BEV boxes [x,y,w,l,r]."""
    all_c = np.concatenate([
        np.asarray(geometry.box_to_corners(np.asarray([b1], np.float64)))[0],
        np.asarray(geometry.box_to_corners(np.asarray([b2], np.float64)))[0],
    ])
    lo, hi = all_c.min(0) - 0.1, all_c.max(0) + 0.1
    xs = np.linspace(lo[0], hi[0], res)
    ys = np.linspace(lo[1], hi[1], res)
    gx, gy = np.meshgrid(xs, ys)
    pts = np.stack([gx.ravel(), gy.ravel()], axis=1)
    cell = (xs[1] - xs[0]) * (ys[1] - ys[0])

    def inside(box):
        c, s = np.cos(box[4]), np.sin(box[4])
        rel = pts - box[:2]
        # into box frame. Corners are local @ [[c,-s],[s,c]] + center
        # (reference box_np_ops.rotation_2d convention), so the inverse map
        # is local = R(theta) @ rel = (c*dx - s*dy, s*dx + c*dy).
        x = rel[:, 0] * c - rel[:, 1] * s
        y = rel[:, 0] * s + rel[:, 1] * c
        return (np.abs(x) <= box[2] / 2) & (np.abs(y) <= box[3] / 2)

    m1, m2 = inside(np.asarray(b1)), inside(np.asarray(b2))
    inter = (m1 & m2).sum() * cell
    a1 = b1[2] * b1[3]
    a2 = b2[2] * b2[3]
    return inter / (a1 + a2 - inter)


CASES = [
    # identical boxes
    ([0, 0, 2, 4, 0.3], [0, 0, 2, 4, 0.3], 1.0),
    # disjoint
    ([0, 0, 2, 4, 0.0], [10, 10, 2, 4, 1.0], 0.0),
    # axis-aligned half overlap
    ([0, 0, 2, 2, 0.0], [1, 0, 2, 2, 0.0], 1.0 / 3.0),
]


@pytest.mark.parametrize("b1,b2,expected", CASES)
def test_rotated_iou_known(b1, b2, expected):
    iou = geometry.rotated_iou_matrix(
        np.asarray([b1], np.float32), np.asarray([b2], np.float32))
    np.testing.assert_allclose(np.asarray(iou)[0, 0], expected, atol=1e-4)


def test_rotated_iou_vs_raster(rng):
    boxes = np.zeros((12, 5), np.float64)
    boxes[:, 0:2] = rng.uniform(-3, 3, (12, 2))
    boxes[:, 2:4] = rng.uniform(1, 5, (12, 2))
    boxes[:, 4] = rng.uniform(-np.pi, np.pi, 12)
    iou = np.asarray(geometry.rotated_iou_matrix(
        boxes.astype(np.float32), boxes.astype(np.float32)))
    for i in range(12):
        for j in range(i + 1, 12):
            oracle = _raster_iou(boxes[i], boxes[j])
            assert abs(iou[i, j] - oracle) < 0.02, (i, j, iou[i, j], oracle)
    # symmetric, diagonal = 1
    np.testing.assert_allclose(np.diag(iou), 1.0, atol=1e-4)
    np.testing.assert_allclose(iou, iou.T, atol=1e-4)


def test_criterion_modes():
    # small box fully inside a big one
    big = np.asarray([[0, 0, 4, 4, 0.0]], np.float32)
    small = np.asarray([[0, 0, 2, 2, 0.0]], np.float32)
    inter_over_a = np.asarray(
        geometry.rotated_iou_matrix(big, small, criterion=0))[0, 0]
    inter_over_b = np.asarray(
        geometry.rotated_iou_matrix(big, small, criterion=1))[0, 0]
    np.testing.assert_allclose(inter_over_a, 4.0 / 16.0, atol=1e-4)
    np.testing.assert_allclose(inter_over_b, 1.0, atol=1e-4)


def test_points_in_rbbox():
    boxes = np.asarray([[0, 0, 0, 2, 4, 2, 0.0]], np.float32)
    pts = np.asarray([
        [0, 0, 0.4],     # inside (z within [âˆ'0.?]) -- origin z=0.5 default
        [0.9, 1.9, 0],   # inside near corner
        [1.5, 0, 0],     # outside x
        [0, 0, 1.5],     # outside z
    ], np.float32)
    mask = np.asarray(geometry.points_in_rbbox(pts, boxes))
    assert mask[:, 0].tolist() == [True, True, False, False]


def test_box_collision():
    boxes = np.asarray([[0, 0, 2, 2, 0.0]], np.float32)
    others = np.asarray([[0.5, 0.5, 2, 2, 0.3], [9, 9, 1, 1, 0.0]], np.float32)
    hit = geometry.box_collision_test(boxes, others)
    assert hit[0, 0] and not hit[0, 1]
