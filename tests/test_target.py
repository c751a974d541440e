"""Target assignment vs a sequential numpy oracle implementing the
create_target_np rules (target_ops.py:28-222, positive_fraction=None)."""

import numpy as np
import jax.numpy as jnp

from det3d_tpu.core import box_ops
from det3d_tpu.core.anchors import AnchorGeneratorRange, GroundBox3dCoder
from det3d_tpu.core.target import (TargetAssigner, create_target,
                                   nearest_iou_similarity)


def _oracle_assign(anchors, gt, gt_cls, mt, ut):
    """Sequential oracle of the detectron-style labeling rules."""
    A, G = anchors.shape[0], gt.shape[0]
    labels = np.full((A,), -1, np.int32)
    if G == 0:
        return np.zeros((A,), np.int32)
    a_rbv = np.asarray(box_ops.rbbox2d_to_near_bbox(anchors[:, [0, 1, 3, 4, 6]]))
    g_rbv = np.asarray(box_ops.rbbox2d_to_near_bbox(gt[:, [0, 1, 3, 4, 6]]))
    sim = np.asarray(box_ops.iou_matrix(a_rbv, g_rbv))
    a2g = sim.argmax(1)
    a2g_max = sim[np.arange(A), a2g]
    g2a_max = sim.max(0)
    g2a_max[g2a_max == 0] = -1
    force = np.where(sim == g2a_max[None, :])[0]
    pos = a2g_max >= mt
    bg = a2g_max < ut
    labels[pos] = gt_cls[a2g[pos]]
    labels[bg] = 0
    labels[force] = gt_cls[a2g[force]]
    return labels


def _make_anchors():
    gen = AnchorGeneratorRange(
        anchor_ranges=[0, -10, -1.0, 20, 10, -1.0],
        sizes=[1.6, 3.9, 1.56], rotations=[0, np.pi / 2],
        match_threshold=0.6, unmatch_threshold=0.45, class_name="Car")
    anchors = gen.generate([1, 10, 20])
    return gen, anchors.reshape(-1, 7)


def test_create_target_matches_oracle(rng):
    _, anchors = _make_anchors()
    G = 8
    gt = np.zeros((G, 7), np.float32)
    gt[:, 0] = rng.uniform(2, 18, G)
    gt[:, 1] = rng.uniform(-8, 8, G)
    gt[:, 2] = -1.0
    gt[:, 3:6] = [1.6, 3.9, 1.56]
    gt[:, 6] = rng.choice([0.0, np.pi / 2], G)
    gt_valid = np.ones((G,), bool)
    gt_valid[5:] = False          # padded rows
    gt_cls = np.ones((G,), np.int32)

    coder = GroundBox3dCoder()
    labels, targets, weights = create_target(
        jnp.asarray(anchors), jnp.asarray(gt), jnp.asarray(gt_valid),
        jnp.asarray(gt_cls), nearest_iou_similarity, coder.encode,
        0.6, 0.45, 7)
    oracle = _oracle_assign(anchors, gt[:5], gt_cls[:5], 0.6, 0.45)
    np.testing.assert_array_equal(np.asarray(labels), oracle)

    # encoded targets only where fg; check one fg anchor decodes to its gt
    fg = np.where(np.asarray(labels) > 0)[0]
    assert len(fg) > 0
    np.testing.assert_allclose(np.asarray(weights)[fg], 1.0)
    a_rbv = np.asarray(box_ops.rbbox2d_to_near_bbox(anchors[:, [0, 1, 3, 4, 6]]))
    g_rbv = np.asarray(box_ops.rbbox2d_to_near_bbox(gt[:5][:, [0, 1, 3, 4, 6]]))
    sim = np.asarray(box_ops.iou_matrix(a_rbv, g_rbv))
    for i in fg[:3]:
        j = sim[i].argmax()
        dec = np.asarray(coder.decode(np.asarray(targets)[i:i + 1],
                                      anchors[i:i + 1]))
        np.testing.assert_allclose(dec[0], gt[j], atol=1e-4)


def test_no_gt_all_background():
    _, anchors = _make_anchors()
    gt = np.zeros((4, 7), np.float32)
    gt[:, 3:6] = 1.0
    coder = GroundBox3dCoder()
    labels, _, weights = create_target(
        jnp.asarray(anchors), jnp.asarray(gt),
        jnp.zeros((4,), bool), jnp.ones((4,), np.int32),
        nearest_iou_similarity, coder.encode, 0.6, 0.45, 7)
    assert (np.asarray(labels) == 0).all()
    assert (np.asarray(weights) == 0).all()


def test_task_assigner_layout():
    """Two classes concat per-location like assign_v2 (target_assigner.py:113)."""
    genA = AnchorGeneratorRange(
        anchor_ranges=[0, -10, -1.0, 20, 10, -1.0], sizes=[1.6, 3.9, 1.56],
        rotations=[0, np.pi / 2], match_threshold=0.6, unmatch_threshold=0.45,
        class_name="Car")
    genB = AnchorGeneratorRange(
        anchor_ranges=[0, -10, -0.6, 20, 10, -0.6], sizes=[0.6, 0.8, 1.73],
        rotations=[0, np.pi / 2], match_threshold=0.35, unmatch_threshold=0.2,
        class_name="Pedestrian")
    assigner = TargetAssigner(box_coder=GroundBox3dCoder(),
                              anchor_generators=[genA, genB])
    anchors = assigner.generate_anchors([1, 10, 20])
    assert anchors.shape == (10 * 20 * 4, 7)
    # location-interleaved: first 2 anchors at loc0 are Car (big), next 2 Ped
    np.testing.assert_allclose(anchors[0, 3:6], [1.6, 3.9, 1.56])
    np.testing.assert_allclose(anchors[2, 3:6], [0.6, 0.8, 1.73])

    gt = np.zeros((4, 7), np.float32)
    gt[0] = [5, 0, -1, 1.6, 3.9, 1.56, 0]       # a car
    gt[1] = [15, 5, -0.6, 0.6, 0.8, 1.73, 0]    # a pedestrian
    gt[:, 3:6] = np.maximum(gt[:, 3:6], 0.01)
    gt_classes = np.asarray([1, 2, 0, 0], np.int32)
    gt_valid = np.asarray([True, True, False, False])

    labels, targets, weights = assigner.assign(
        jnp.asarray(gt), jnp.asarray(gt_classes), jnp.asarray(gt_valid),
        class_ids=[1, 2])
    labels = np.asarray(labels)
    assert labels.shape == (800,)
    assert (labels == 1).sum() > 0           # car positives
    assert (labels == 2).sum() > 0           # pedestrian positives
    # car labels only on car anchor slots (loc 0,1 of each group of 4)
    slot = np.arange(800) % 4
    assert set(slot[labels == 1]) <= {0, 1}
    assert set(slot[labels == 2]) <= {2, 3}


def test_positive_fraction_subsampling(rng):
    """RPN minibatch subsampling (target_ops.py:144-168): at most
    positive_fraction*sample_size positives survive (excess -> ignore),
    sample_size - n_fg negatives are enabled, the rest stay ignore."""
    import jax

    _, anchors = _make_anchors()
    G = 6
    gt = np.zeros((G, 7), np.float32)
    gt[:, 0] = np.linspace(3, 17, G)
    gt[:, 1] = np.linspace(-7, 7, G)
    gt[:, 2] = -1.0
    gt[:, 3:6] = [1.6, 3.9, 1.56]
    gt_valid = np.ones((G,), bool)
    gt_cls = np.ones((G,), np.int32)

    coder = GroundBox3dCoder()
    args = (jnp.asarray(anchors), jnp.asarray(gt), jnp.asarray(gt_valid),
            jnp.asarray(gt_cls), nearest_iou_similarity, coder.encode,
            0.3, 0.2, 7)

    base_labels, _, _ = create_target(*args)
    n_fg_all = int((np.asarray(base_labels) > 0).sum())
    assert n_fg_all > 4, n_fg_all          # scenario has excess positives

    sample_size, frac = 32, 0.125          # num_fg cap = 4
    key = jax.random.PRNGKey(7)
    labels, targets, weights = create_target(
        *args, positive_fraction=frac, sample_size=sample_size, rng=key)
    labels = np.asarray(labels)
    n_fg = int((labels > 0).sum())
    n_bg = int((labels == 0).sum())
    assert n_fg == 4                        # capped (had excess)
    # bg sampled WITH replacement (like the reference), so duplicates can
    # make the distinct count fall slightly short of the quota
    assert n_bg <= sample_size - n_fg
    assert n_bg >= int(0.8 * (sample_size - n_fg))
    # surviving positives are a subset of the unsubsampled positives
    assert set(np.where(labels > 0)[0]) <= set(
        np.where(np.asarray(base_labels) > 0)[0])
    # reg weights follow the post-subsample fg set
    np.testing.assert_array_equal(
        np.asarray(weights) > 0, labels > 0)
    # targets zeroed outside surviving fg
    assert np.all(np.asarray(targets)[labels <= 0] == 0)

    # deterministic under the same key; different under another key
    labels2, _, _ = create_target(
        *args, positive_fraction=frac, sample_size=sample_size, rng=key)
    np.testing.assert_array_equal(labels, np.asarray(labels2))
    labels3, _, _ = create_target(
        *args, positive_fraction=frac, sample_size=sample_size,
        rng=jax.random.PRNGKey(8))
    assert not np.array_equal(labels, np.asarray(labels3))


def test_anchors_mask_matches_numba_oracle(rng):
    """anchors_mask must replicate sparse_sum_for_anchors_mask +
    fused_get_anchors_area (box_np_ops.py:1280-1310) bit-for-bit, including
    the inclusive-integral window convention."""
    import jax
    import jax.numpy as jnp

    gen, anchors = _make_anchors()
    assigner = TargetAssigner(box_coder=GroundBox3dCoder(),
                              anchor_generators=[gen],
                              anchor_area_threshold=1.0)
    assigner.generate_anchors([1, 10, 20])
    voxel_size = (1.0, 1.0, 2.0)
    pc_range = (0.0, -10.0, -3.0, 20.0, 10.0, 1.0)
    grid = (20, 20, 2)
    assigner.prepare_anchors_mask(voxel_size, pc_range, grid)

    # random sparse occupancy, zyx coords with padding rows
    V = 64
    n = 40
    co = np.stack([rng.randint(0, 2, n), rng.randint(0, 20, n),
                   rng.randint(0, 20, n)], -1).astype(np.int32)
    co = np.concatenate([co, np.full((V - n, 3), -1, np.int32)])

    mask = np.asarray(assigner.anchors_mask(jnp.asarray(co), grid))

    # ---- numpy oracle: the numba kernels, verbatim semantics ----
    dense = np.zeros((20, 20), np.float32)
    for i in range(n):
        dense[co[i, 1], co[i, 2]] += 1
    dense = dense.cumsum(0).cumsum(1)

    from det3d_tpu.core import box_ops
    bv = np.asarray(box_ops.rbbox2d_to_near_bbox(
        anchors[:, [0, 1, 3, 4, -1]]))
    area = np.zeros(len(bv))
    for i in range(len(bv)):
        x0 = max(int(np.floor((bv[i, 0] - pc_range[0]) / voxel_size[0])), 0)
        y0 = max(int(np.floor((bv[i, 1] - pc_range[1]) / voxel_size[1])), 0)
        x1 = min(int(np.floor((bv[i, 2] - pc_range[0]) / voxel_size[0])),
                 grid[0] - 1)
        y1 = min(int(np.floor((bv[i, 3] - pc_range[1]) / voxel_size[1])),
                 grid[1] - 1)
        area[i] = dense[y1, x1] - dense[y1, x0] - dense[y0, x1] + dense[y0, x0]
    oracle = area > 1.0

    np.testing.assert_array_equal(mask, oracle)
    assert mask.any() and not mask.all()   # non-trivial scenario

    # pruned anchors must come out with label -1 even where gt matches
    G = 4
    gt = np.zeros((G, 7), np.float32)
    gt[:, 0] = [3, 8, 12, 17]
    gt[:, 1] = [-5, 0, 5, -2]
    gt[:, 2] = -1.0
    gt[:, 3:6] = [1.6, 3.9, 1.56]
    coder = GroundBox3dCoder()
    labels_m, _, w_m = create_target(
        jnp.asarray(anchors), jnp.asarray(gt), jnp.ones((G,), bool),
        jnp.ones((G,), np.int32), nearest_iou_similarity, coder.encode,
        0.3, 0.2, 7, anchors_mask=jnp.asarray(mask))
    labels_m = np.asarray(labels_m)
    assert np.all(labels_m[~mask] == -1)
    assert np.all(np.asarray(w_m)[~mask] == 0)


def test_bev_anchor_generator_range():
    """BEV anchors: layout/centers vs a direct construction, and the
    BevBoxCoder round-trips against them (anchor_generator.py:120-174)."""
    import jax.numpy as jnp

    from det3d_tpu.core.anchors import (BevAnchorGeneratorRange, BevBoxCoder,
                                        create_anchors_bev_range)

    gen = BevAnchorGeneratorRange(
        anchor_ranges=[0.0, -4.0, 8.0, 4.0], sizes=[1.6, 3.9],
        rotations=[0.0, np.pi / 2], class_name="Car",
        match_threshold=0.6, unmatch_threshold=0.45)
    assert gen.ndim == 5
    assert gen.num_anchors_per_localization == 2

    H, W = 4, 8
    anchors = gen.generate([1, H, W])
    assert anchors.shape == (H, W, 1, 2, 5)
    stride = 8.0 / W
    # centers at stride/2 offsets, x fastest in the W axis
    np.testing.assert_allclose(anchors[0, 0, 0, 0],
                               [stride / 2, -4.0 + stride / 2, 1.6, 3.9, 0.0],
                               atol=1e-6)
    np.testing.assert_allclose(anchors[0, 1, 0, 0, 0], 3 * stride / 2,
                               atol=1e-6)
    # y spacing is (ymax - ymin) / H; only the half-offset uses the x stride
    # (reference box_np_ops.py:827-848 idiosyncrasy)
    np.testing.assert_allclose(anchors[1, 0, 0, 0, 1],
                               -4.0 + 8.0 / H + stride / 2, atol=1e-6)
    assert abs(anchors[0, 0, 0, 1, -1] - np.pi / 2) < 1e-6

    # velocity variant appends (vx, vy) before rotation
    gen_v = BevAnchorGeneratorRange(
        anchor_ranges=[0.0, -4.0, 8.0, 4.0], sizes=[1.6, 3.9],
        velocities=[0.1, -0.2], rotations=[0.0])
    av = gen_v.generate([1, H, W])
    assert av.shape == (H, W, 1, 1, 7)
    np.testing.assert_allclose(av[0, 0, 0, 0, 4:6], [0.1, -0.2], atol=1e-6)

    # 2D function matches the class path
    direct = create_anchors_bev_range([H, W], [0.0, -4.0, 8.0, 4.0],
                                      [1.6, 3.9], [0.0, np.pi / 2])
    np.testing.assert_allclose(anchors, direct)

    # coder round-trip on 5-dim BEV anchors
    coder = BevBoxCoder(z_fixed=-1.0, h_fixed=1.7)
    flat = jnp.asarray(anchors.reshape(-1, 5))
    boxes = flat.at[:, :2].add(0.5).at[:, 2:4].mul(1.2).at[:, 4].add(0.3)
    enc = coder.encode(boxes, flat)
    dec = np.asarray(coder.decode(enc, flat))
    np.testing.assert_allclose(dec[:, [0, 1, 3, 4, 6]], np.asarray(boxes),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(dec[:, 2], -1.0)
    np.testing.assert_allclose(dec[:, 5], 1.7)
