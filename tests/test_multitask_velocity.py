"""CBGS-style multi-task head with 9-dim (velocity) boxes: train + predict."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from det3d_tpu.core.anchors import AnchorGeneratorRange, GroundBox3dCoder
from det3d_tpu.core.target import TargetAssigner
from det3d_tpu.core.voxelize import VoxelGenerator
from det3d_tpu.models.builder import build_detector
from det3d_tpu.parallel.train import (TrainState, build_example,
                                      make_predict_step, make_train_step)
from det3d_tpu.solver import build_optimizer, one_cycle

PC_RANGE = (-16.0, -16.0, -3.0, 16.0, 16.0, 1.0)
VOXEL_SIZE = (0.4, 0.4, 4.0)


@pytest.fixture(scope="module")
def stack():
    voxel_gen = VoxelGenerator(voxel_size=VOXEL_SIZE,
                               point_cloud_range=PC_RANGE,
                               max_num_points=16, max_voxels=2048)
    grid = voxel_gen.grid_size                       # (80, 80, 1)
    tasks = [dict(num_class=1, class_names=["car"]),
             dict(num_class=2, class_names=["pedestrian", "bicycle"])]
    coder_cfg = dict(type="ground_box3d_coder", n_dim=9, linear_dim=False,
                     encode_angle_vector=True)

    model_cfg = dict(
        type="PointPillars",
        reader=dict(type="PillarFeatureNet", num_filters=[32],
                    voxel_size=list(VOXEL_SIZE), pc_range=list(PC_RANGE),
                    with_distance=False, num_input_features=5),
        backbone=dict(type="PointPillarsScatter", num_input_features=32),
        neck=dict(type="RPN", layer_nums=[1, 1], ds_layer_strides=[1, 2],
                  ds_num_filters=[32, 64], us_layer_strides=[1, 2],
                  us_num_filters=[32, 32], num_input_features=32),
        bbox_head=dict(
            type="MultiGroupHead", mode="3d", in_channels=64,
            tasks=tasks, weights=[1, 1],
            box_coder=coder_cfg,
            encode_background_as_zeros=True,
            loss_norm=dict(type="NormByNumPositives", pos_cls_weight=1.0,
                           neg_cls_weight=1.0),
            loss_cls=dict(type="SigmoidFocalLoss", alpha=0.25, gamma=2.0,
                          loss_weight=1.0),
            loss_bbox=dict(type="WeightedSmoothL1Loss", sigma=3.0,
                           codewise=True, loss_weight=1.0,
                           code_weights=[1.0] * 10),
            encode_rad_error_by_sin=False,   # vector angle encoding instead
            loss_aux=dict(type="WeightedSoftmaxClassificationLoss",
                          name="direction_classifier", loss_weight=0.2),
            direction_offset=0.0,
        ),
    )
    test_cfg = dict(
        nms=dict(use_rotate_nms=True, use_multi_class_nms=False,
                 nms_pre_max_size=256, nms_post_max_size=24,
                 nms_iou_threshold=0.5),
        score_threshold=0.25,
        post_center_limit_range=[-20, -20, -5, 20, 20, 5],
        max_per_img=48,
    )
    model = build_detector(model_cfg, test_cfg=test_cfg, grid_size=grid)

    coder = GroundBox3dCoder(vec_encode=True, n_dim=9)
    gens = [
        AnchorGeneratorRange(
            anchor_ranges=[-16, -16, -1.0, 16, 16, -1.0],
            sizes=[1.95, 4.6, 1.72], velocities=[0, 0],
            rotations=[0, np.pi / 2], match_threshold=0.5,
            unmatch_threshold=0.35, class_name="car"),
        AnchorGeneratorRange(
            anchor_ranges=[-16, -16, -1.2, 16, 16, -1.2],
            sizes=[0.66, 0.72, 1.75], velocities=[0, 0],
            rotations=[0, np.pi / 2], match_threshold=0.4,
            unmatch_threshold=0.25, class_name="pedestrian"),
        AnchorGeneratorRange(
            anchor_ranges=[-16, -16, -1.1, 16, 16, -1.1],
            sizes=[0.6, 1.7, 1.28], velocities=[0, 0],
            rotations=[0, np.pi / 2], match_threshold=0.4,
            unmatch_threshold=0.25, class_name="bicycle"),
    ]
    assigners = [
        TargetAssigner(box_coder=coder, anchor_generators=gens[:1]),
        TargetAssigner(box_coder=coder, anchor_generators=gens[1:]),
    ]
    fm = [1, grid[1], grid[0]]
    for a in assigners:
        a.generate_anchors(fm)
    class_ids = [[1], [2, 3]]
    return model, voxel_gen, assigners, class_ids, test_cfg


def _scene(rng, batch=2):
    """9-dim gt boxes [x y z w l h vx vy r] for 3 classes + point clusters.
    5-channel points (xyzi + time-lag) like 10-sweep nuScenes."""
    objs = [
        ("car", 1, (5.0, -4.0, 0.6), (1.95, 4.6, 1.72), (2.0, -1.0), 150),
        ("ped", 2, (-6.0, 5.0, -0.4), (0.66, 0.72, 1.75), (0.5, 0.5), 60),
        ("bic", 3, (8.0, 8.0, 1.2), (0.6, 1.7, 1.28), (1.0, 0.0), 60),
    ]
    pts = np.zeros((batch, 1024, 5), np.float32)
    gt = np.zeros((batch, 8, 9), np.float32)
    gt_cls = np.zeros((batch, 8), np.int32)
    gt_valid = np.zeros((batch, 8), bool)
    for b in range(batch):
        cursor = 0
        for g, (_, cls, (cx, cy, th), dims, vel, k) in enumerate(objs):
            z = -1.0
            gt[b, g] = [cx, cy, z, *dims, *vel, th]
            gt_cls[b, g] = cls
            gt_valid[b, g] = True
            local = rng.uniform(-0.5, 0.5, (k, 3)) * np.asarray(dims)
            c, s = np.cos(th), np.sin(th)
            pts[b, cursor:cursor + k, 0] = (local[:, 0] * c
                                            + local[:, 1] * s + cx)
            pts[b, cursor:cursor + k, 1] = (-local[:, 0] * s
                                            + local[:, 1] * c + cy)
            pts[b, cursor:cursor + k, 2] = z + local[:, 2]
            pts[b, cursor:cursor + k, 3] = rng.uniform(0, 1, k)
            cursor += k
        rest = 1024 - cursor
        pts[b, cursor:, 0] = rng.uniform(-16, 16, rest)
        pts[b, cursor:, 1] = rng.uniform(-16, 16, rest)
        pts[b, cursor:, 2] = rng.uniform(-2.5, 0.5, rest)
    return {
        "points": pts,
        "num_points": np.full((batch,), 1024, np.int32),
        "gt_boxes": gt, "gt_classes": gt_cls, "gt_valid": gt_valid,
    }


def test_multitask_velocity_train_predict(stack, rng):
    model, voxel_gen, assigners, class_ids, test_cfg = stack
    batch = _scene(rng)
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}

    example = build_example(jbatch, voxel_gen, assigners, class_ids,
                            with_targets=True)
    # two tasks, code size 10 (9 dims + vector angle extra)
    assert len(example["anchors"]) == 2
    assert example["anchors"][0].shape[-1] == 9
    assert example["reg_targets"][0].shape[-1] == 10
    # car task has positives, ped/bic task has positives
    assert int((np.asarray(example["labels"][0]) > 0).sum()) > 0
    assert int((np.asarray(example["labels"][1]) > 0).sum()) > 0

    variables = model.init(
        jax.random.PRNGKey(0), example["voxels"],
        example["num_points_per_voxel"], example["coordinates"], train=False)
    lr_fn, mom_fn = one_cycle(3e-3, 60)
    tx = build_optimizer(dict(TYPE="adam", VALUE=dict(wd=0.01),
                              FIXED_WD=True), lr_fn, mom_fn)
    state = TrainState.create(variables["params"], variables["batch_stats"],
                              tx)
    train_step = make_train_step(model, voxel_gen, assigners, class_ids)
    losses = []
    for _ in range(60):
        state, metrics = train_step(state, jbatch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.7

    predict_step = make_predict_step(model, voxel_gen, assigners, class_ids,
                                     test_cfg)
    out = predict_step(state, jbatch)
    # 9-dim output boxes, labels spanning both tasks' global offsets
    assert out["box3d_lidar"].shape[-1] == 9
    assert out["box3d_lidar"].shape[1] == 48    # 2 tasks x post_max 24
    labels = np.asarray(out["label_preds"])[np.asarray(out["valid"])]
    assert labels.min() >= 0 and labels.max() <= 2


def test_velocity_coder_roundtrip(rng):
    coder = GroundBox3dCoder(vec_encode=True, n_dim=9)
    anchors = np.concatenate([
        rng.uniform(-10, 10, (20, 3)), rng.uniform(1, 4, (20, 3)),
        np.zeros((20, 2)), rng.uniform(-np.pi, np.pi, (20, 1))], 1)
    boxes = anchors + rng.uniform(-0.5, 0.5, (20, 9))
    enc = coder.encode(jnp.asarray(boxes, jnp.float32),
                       jnp.asarray(anchors, jnp.float32))
    dec = coder.decode(enc, jnp.asarray(anchors, jnp.float32))
    np.testing.assert_allclose(np.asarray(dec), boxes, rtol=1e-4, atol=1e-4)


def test_multiclass_nms_no_cross_suppression(stack, rng):
    """use_multi_class_nms=True: overlapping boxes of DIFFERENT classes in
    the same task both survive, and per-class duplicates are suppressed."""
    import jax.numpy as jnp
    from det3d_tpu.models.heads import MultiGroupHead
    model, voxel_gen, assigners, class_ids, test_cfg = stack
    head = model.bbox_head
    a = assigners[1].anchors_flat                        # ped+bicycle task
    n = a.shape[0]

    # synthetic task preds: encode two coincident gt boxes (one per class)
    # at the anchor nearest (0, 0)
    dists = np.linalg.norm(a[:, :2], axis=1)
    i0 = int(np.argmin(dists + (np.arange(n) % 2)))      # rotation-0 anchor
    box_preds = np.zeros((1, n, 10), np.float32)         # zero offsets
    cls_preds = np.full((1, n, 2), -10.0, np.float32)
    cls_preds[0, i0, 0] = 6.0                            # pedestrian
    cls_preds[0, i0, 1] = 5.0                            # bicycle same spot
    cls_preds[0, i0 + 1, 0] = 4.0                        # overlapping ped
    dir_preds = np.zeros((1, n, 2), np.float32)

    fm = (1, 80, 80)
    num_a = 4  # 2 sizes? no: 2 gens x 2 rot = 4 per loc
    preds = [
        {"box_preds": jnp.zeros((1, 80, 80, 2 * 10), jnp.float32),
         "cls_preds": jnp.full((1, 80, 80, 2), -10.0, jnp.float32),
         "dir_cls_preds": jnp.zeros((1, 80, 80, 4), jnp.float32)},
        {"box_preds": jnp.asarray(box_preds.reshape(1, 80, 80, -1)),
         "cls_preds": jnp.asarray(cls_preds.reshape(1, 80, 80, -1)),
         "dir_cls_preds": jnp.asarray(dir_preds.reshape(1, 80, 80, -1))},
    ]
    example = {"anchors": [
        jnp.asarray(assigners[0].anchors_flat)[None],
        jnp.asarray(assigners[1].anchors_flat)[None]]}
    cfg = dict(test_cfg)
    cfg["nms"] = dict(test_cfg["nms"], use_multi_class_nms=True)
    out = head.predict(example, preds, cfg)
    valid = np.asarray(out["valid"][0])
    labels = np.asarray(out["label_preds"][0])[valid]
    scores = np.asarray(out["scores"][0])[valid]
    # both classes kept (no cross-class suppression); global label ids:
    # car=0 (task 0), pedestrian=1, bicycle=2 (task 1 offsets)
    assert set(labels.tolist()) == {1, 2}, labels
    # ...and the weaker same-class duplicate was suppressed
    assert (labels == 1).sum() == 1, (labels, scores)
    assert (labels == 2).sum() == 1


def test_double_flip_tta_symmetry(stack, rng):
    """predict with double_flip TTA: mirroring the input scene must mirror
    the detections exactly (the 4-variant ensemble is closed under flips),
    including velocity and yaw de-flipping on 9-dim boxes."""
    model, voxel_gen, assigners, class_ids, test_cfg = stack
    batch = _scene(rng, batch=1)
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}

    example = build_example(jbatch, voxel_gen, assigners, class_ids,
                            with_targets=True)
    variables = model.init(
        jax.random.PRNGKey(0), example["voxels"],
        example["num_points_per_voxel"], example["coordinates"], train=False)
    lr_fn, mom_fn = one_cycle(3e-3, 50)
    tx = build_optimizer(dict(TYPE="adam", VALUE=dict(wd=0.01),
                              FIXED_WD=True), lr_fn, mom_fn)
    state = TrainState.create(variables["params"], variables["batch_stats"],
                              tx)
    train_step = make_train_step(model, voxel_gen, assigners, class_ids)
    for _ in range(50):
        state, _ = train_step(state, jbatch)

    tta_cfg = dict(test_cfg, double_flip=True, score_threshold=0.1)
    tta_step = make_predict_step(model, voxel_gen, assigners, class_ids,
                                 tta_cfg)

    out = jax.tree_util.tree_map(np.asarray, tta_step(state, jbatch))
    assert int(out["valid"].sum()) > 0, "TTA produced no detections"

    def angdiff(a, b):
        return np.abs(np.angle(np.exp(1j * (a - b))))

    def check_mirror(mirrored_batch, sgn_x, sgn_y):
        out_m = jax.tree_util.tree_map(
            np.asarray, tta_step(state, mirrored_batch))
        v, vm = out["valid"][0], out_m["valid"][0]
        assert int(v.sum()) == int(vm.sum())
        # sort both sides by score (detections are in per-task score order
        # already, but make the pairing explicit)
        a = np.argsort(-out["scores"][0][v])
        b = np.argsort(-out_m["scores"][0][vm])
        np.testing.assert_allclose(out["scores"][0][v][a],
                                   out_m["scores"][0][vm][b], atol=1e-5)
        np.testing.assert_array_equal(out["label_preds"][0][v][a],
                                      out_m["label_preds"][0][vm][b])
        bx = out["box3d_lidar"][0][v][a]
        bm = out_m["box3d_lidar"][0][vm][b]
        np.testing.assert_allclose(bx[:, 0] * sgn_x, bm[:, 0], atol=1e-4)
        np.testing.assert_allclose(bx[:, 1] * sgn_y, bm[:, 1], atol=1e-4)
        np.testing.assert_allclose(bx[:, 2:6], bm[:, 2:6], atol=1e-4)
        np.testing.assert_allclose(bx[:, 6] * sgn_x, bm[:, 6], atol=1e-4)
        np.testing.assert_allclose(bx[:, 7] * sgn_y, bm[:, 7], atol=1e-4)
        yaw_expect = bx[:, 8].copy()
        if sgn_y < 0:
            yaw_expect = -yaw_expect
        if sgn_x < 0:
            yaw_expect = np.pi - yaw_expect
        assert angdiff(yaw_expect, bm[:, 8]).max() < 1e-3

    pts = batch["points"].copy()
    pts_y = pts.copy(); pts_y[..., 1] *= -1
    pts_xy = pts.copy(); pts_xy[..., 0] *= -1; pts_xy[..., 1] *= -1
    base = {k: jnp.asarray(v) for k, v in batch.items() if k != "points"}
    check_mirror(dict(base, points=jnp.asarray(pts_y)), 1, -1)
    check_mirror(dict(base, points=jnp.asarray(pts_xy)), -1, -1)
