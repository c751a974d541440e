"""Fixed-shape NMS vs a sequential greedy oracle."""

import numpy as np

from det3d_tpu.core import geometry
from det3d_tpu.ops import nms as nms_ops


def _oracle_nms(boxes, scores, iou_threshold, rotated=True):
    order = np.argsort(-scores, kind="stable")
    if rotated:
        iou = np.asarray(geometry.rotated_iou_matrix(
            boxes.astype(np.float32), boxes.astype(np.float32)))
    else:
        from det3d_tpu.core import box_ops
        iou = np.asarray(box_ops.iou_matrix(boxes, boxes))
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if scores[i] <= 0 or suppressed[i]:
            continue
        keep.append(i)
        suppressed |= iou[i] > iou_threshold
        suppressed[i] = True
    return keep


def test_rotated_nms_matches_oracle(rng):
    n = 64
    boxes = np.zeros((n, 5), np.float32)
    boxes[:, 0:2] = rng.uniform(-10, 10, (n, 2))
    boxes[:, 2:4] = rng.uniform(1, 4, (n, 2))
    boxes[:, 4] = rng.uniform(-np.pi, np.pi, n)
    scores = rng.uniform(0.01, 1.0, n).astype(np.float32)

    idx, valid = nms_ops.rotate_nms(boxes, scores, pre_max_size=64,
                                    post_max_size=32, iou_threshold=0.3)
    got = np.asarray(idx)[np.asarray(valid)]
    expect = _oracle_nms(boxes, scores, 0.3, rotated=True)[:32]
    np.testing.assert_array_equal(got, expect)


def test_standup_nms_matches_oracle(rng):
    n = 48
    ctr = rng.uniform(-10, 10, (n, 2))
    dim = rng.uniform(1, 4, (n, 2))
    boxes = np.concatenate([ctr - dim / 2, ctr + dim / 2], 1).astype(np.float32)
    scores = rng.uniform(0.01, 1.0, n).astype(np.float32)
    idx, valid = nms_ops.standup_nms(boxes, scores, pre_max_size=48,
                                     post_max_size=20, iou_threshold=0.5)
    got = np.asarray(idx)[np.asarray(valid)]
    expect = _oracle_nms(boxes, scores, 0.5, rotated=False)[:20]
    np.testing.assert_array_equal(got, expect)


def test_nms_masked_scores_excluded(rng):
    boxes = np.asarray([[0, 0, 2, 2, 0.0], [10, 10, 2, 2, 0.0]], np.float32)
    scores = np.asarray([0.9, -1.0], np.float32)   # second below threshold
    idx, valid = nms_ops.rotate_nms(boxes, scores, pre_max_size=2,
                                    post_max_size=2, iou_threshold=0.5)
    v = np.asarray(valid)
    assert v.tolist() == [True, False]
    assert int(np.asarray(idx)[0]) == 0


def test_nms_pre_max_truncates(rng):
    # 10 identical overlapping boxes: only the best survives
    boxes = np.tile(np.asarray([[0, 0, 2, 2, 0.0]], np.float32), (10, 1))
    scores = np.linspace(0.1, 1.0, 10).astype(np.float32)
    idx, valid = nms_ops.rotate_nms(boxes, scores, pre_max_size=8,
                                    post_max_size=4, iou_threshold=0.5)
    v = np.asarray(valid)
    assert v.sum() == 1
    assert int(np.asarray(idx)[0]) == 9


def test_pallas_nms_kernel_matches_xla(rng):
    """The fused Pallas rotated-NMS kernel (interpret mode on CPU) produces
    the exact keep set of the XLA reference path, including padding (K not
    a multiple of the tile) and all-invalid inputs."""
    import jax.numpy as jnp

    from det3d_tpu.core.geometry import box_to_corners
    from det3d_tpu.ops.nms import (_greedy_suppress,
                                   _pairwise_rotated_iou_from_corners)
    from det3d_tpu.ops.nms_pallas import rotated_nms_keep

    for k, seed in ((200, 0), (333, 1)):
        r = np.random.RandomState(seed)
        centers = r.uniform(0, 40, (k, 2)).astype(np.float32)
        h = k - k // 2
        centers[k // 2:] = centers[:h] + \
            r.normal(0, 1.0, (h, 2)).astype(np.float32)
        boxes = np.concatenate(
            [centers, r.uniform(1.5, 4.5, (k, 2)).astype(np.float32),
             r.uniform(-np.pi, np.pi, (k, 1)).astype(np.float32)], 1)
        valid = np.ones((k,), bool)
        valid[-k // 10:] = False
        bj, vj = jnp.asarray(boxes), jnp.asarray(valid)
        iou = _pairwise_rotated_iou_from_corners(box_to_corners(bj))
        keep_xla = np.asarray(_greedy_suppress(iou, vj, 0.5))
        keep_pal = np.asarray(rotated_nms_keep(bj, vj, 0.5, interpret=True))
        np.testing.assert_array_equal(keep_xla, keep_pal)

    # all invalid -> empty keep
    empty = np.asarray(rotated_nms_keep(
        jnp.asarray(boxes), jnp.zeros((k,), bool), 0.5, interpret=True))
    assert not empty.any()
