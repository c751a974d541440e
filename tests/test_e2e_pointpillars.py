"""End-to-end PointPillars: build from config, train steps, predict, mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from det3d_tpu.core.anchors import AnchorGeneratorRange, GroundBox3dCoder
from det3d_tpu.core.target import TargetAssigner
from det3d_tpu.core.voxelize import VoxelGenerator
from det3d_tpu.models.builder import build_detector
from det3d_tpu.parallel.mesh import make_mesh
from det3d_tpu.parallel.train import (TrainState, build_example,
                                      make_predict_step,
                                      make_train_step)
from det3d_tpu.solver import build_optimizer, one_cycle

PC_RANGE = (0.0, -8.0, -3.0, 16.0, 8.0, 1.0)
VOXEL_SIZE = (0.2, 0.2, 4.0)


def _build_stack():
    voxel_gen = VoxelGenerator(voxel_size=VOXEL_SIZE,
                               point_cloud_range=PC_RANGE,
                               max_num_points=16, max_voxels=1024)
    grid = voxel_gen.grid_size                       # (80, 80, 1)

    model_cfg = dict(
        type="PointPillars",
        reader=dict(type="PillarFeatureNet", num_filters=[32],
                    voxel_size=list(VOXEL_SIZE), pc_range=list(PC_RANGE),
                    with_distance=False, num_input_features=4),
        backbone=dict(type="PointPillarsScatter", num_input_features=32),
        neck=dict(type="RPN", layer_nums=[1, 1], ds_layer_strides=[1, 2],
                  ds_num_filters=[32, 64], us_layer_strides=[1, 2],
                  us_num_filters=[32, 32], num_input_features=32),
        bbox_head=dict(
            type="MultiGroupHead", mode="3d", in_channels=64,
            tasks=[dict(num_class=1, class_names=["Car"])], weights=[1],
            box_coder=dict(type="ground_box3d_coder", n_dim=7,
                           linear_dim=False, encode_angle_vector=False),
            encode_background_as_zeros=True,
            loss_norm=dict(type="NormByNumPositives", pos_cls_weight=1.0,
                           neg_cls_weight=1.0),
            loss_cls=dict(type="SigmoidFocalLoss", alpha=0.25, gamma=2.0,
                          loss_weight=1.0),
            loss_bbox=dict(type="WeightedSmoothL1Loss", sigma=3.0,
                           codewise=True, loss_weight=2.0),
            encode_rad_error_by_sin=True,
            loss_aux=dict(type="WeightedSoftmaxClassificationLoss",
                          name="direction_classifier", loss_weight=0.2),
            direction_offset=0.0,
        ),
    )
    test_cfg = dict(
        nms=dict(use_rotate_nms=True, use_multi_class_nms=False,
                 nms_pre_max_size=256, nms_post_max_size=32,
                 nms_iou_threshold=0.5),
        score_threshold=0.3,
        post_center_limit_range=[0, -10, -5, 20, 10, 5],
        max_per_img=32,
    )
    model = build_detector(model_cfg, test_cfg=test_cfg, grid_size=grid)

    gen = AnchorGeneratorRange(
        anchor_ranges=[0, -8, -1.0, 16, 8, -1.0], sizes=[1.6, 3.9, 1.56],
        rotations=[0, np.pi / 2], match_threshold=0.5, unmatch_threshold=0.35,
        class_name="Car")
    assigner = TargetAssigner(box_coder=GroundBox3dCoder(),
                              anchor_generators=[gen])
    # out_size_factor = prod(ds)/us[-1] = 2/2 = 1
    assigner.generate_anchors([1, grid[1], grid[0]])
    return model, voxel_gen, [assigner], [[1]], test_cfg


def _synth_scene(rng, batch=2, n_points=512, n_gt=3):
    """Boxes with dense point clusters inside them."""
    pts = np.zeros((batch, n_points, 4), np.float32)
    gt = np.zeros((batch, 8, 7), np.float32)
    gt_cls = np.zeros((batch, 8), np.int32)
    gt_valid = np.zeros((batch, 8), bool)
    for b in range(batch):
        cursor = 0
        for g in range(n_gt):
            cx = rng.uniform(3, 13)
            cy = rng.uniform(-5, 5)
            theta = rng.choice([0.0, np.pi / 2])
            gt[b, g] = [cx, cy, -1.0, 1.6, 3.9, 1.56, theta]
            gt_cls[b, g] = 1
            gt_valid[b, g] = True
            k = 80
            local = rng.uniform(-0.5, 0.5, (k, 3)) * [1.5, 3.5, 1.4]
            c, s = np.cos(theta), np.sin(theta)
            x = local[:, 0] * c + local[:, 1] * s + cx
            y = -local[:, 0] * s + local[:, 1] * c + cy
            pts[b, cursor:cursor + k, 0] = x
            pts[b, cursor:cursor + k, 1] = y
            pts[b, cursor:cursor + k, 2] = -1.0 + local[:, 2]
            pts[b, cursor:cursor + k, 3] = rng.uniform(0, 1, k)
            cursor += k
        # background clutter
        rest = n_points - cursor
        pts[b, cursor:, 0] = rng.uniform(0, 16, rest)
        pts[b, cursor:, 1] = rng.uniform(-8, 8, rest)
        pts[b, cursor:, 2] = rng.uniform(-2.5, 0.5, rest)
    return {
        "points": pts,
        "num_points": np.full((batch,), n_points, np.int32),
        "gt_boxes": gt,
        "gt_classes": gt_cls,
        "gt_valid": gt_valid,
    }


@pytest.fixture(scope="module")
def stack():
    return _build_stack()


def _init_state(model, voxel_gen, batch, lr_max=1e-3, total_steps=100):
    from det3d_tpu.parallel.train import build_example
    example = build_example(
        {k: jnp.asarray(v) for k, v in batch.items()}, voxel_gen, [], [],
        with_targets=False)
    variables = model.init(
        jax.random.PRNGKey(0), example["voxels"],
        example["num_points_per_voxel"], example["coordinates"], train=False)
    lr_fn, mom_fn = one_cycle(lr_max, total_steps)
    tx = build_optimizer(dict(TYPE="adam", VALUE=dict(wd=0.01), FIXED_WD=True),
                         lr_fn, mom_fn)
    return TrainState.create(variables["params"], variables["batch_stats"], tx)


def test_train_step_runs_and_learns(stack, rng):
    model, voxel_gen, assigners, class_ids, test_cfg = stack
    batch = _synth_scene(rng)
    state = _init_state(model, voxel_gen, batch)
    train_step = make_train_step(model, voxel_gen, assigners, class_ids)

    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
    losses = []
    for _ in range(12):
        state, metrics = train_step(state, jbatch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.8, losses
    assert int(state.step) == 12


def test_predict_step_shapes(stack, rng):
    model, voxel_gen, assigners, class_ids, test_cfg = stack
    batch = _synth_scene(rng)
    state = _init_state(model, voxel_gen, batch)
    predict_step = make_predict_step(model, voxel_gen, assigners, class_ids,
                                     test_cfg)
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
    out = predict_step(state, jbatch)
    assert out["box3d_lidar"].shape == (2, 32, 7)
    assert out["scores"].shape == (2, 32)
    assert out["label_preds"].shape == (2, 32)
    assert out["valid"].shape == (2, 32)


def test_overfit_detects_object(stack, rng):
    """Overfit a single scene; the predicted boxes must localize the GT."""
    model, voxel_gen, assigners, class_ids, test_cfg = stack
    batch = _synth_scene(rng, batch=1, n_gt=2)
    state = _init_state(model, voxel_gen, batch, lr_max=3e-3, total_steps=150)
    train_step = make_train_step(model, voxel_gen, assigners, class_ids)
    predict_step = make_predict_step(model, voxel_gen, assigners, class_ids,
                                     test_cfg)
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
    for _ in range(150):
        state, metrics = train_step(state, jbatch)
    out = predict_step(state, jbatch)
    valid = np.asarray(out["valid"][0])
    boxes = np.asarray(out["box3d_lidar"][0])[valid]
    assert len(boxes) >= 1
    # every GT has a detection within 1m in BEV
    gt = batch["gt_boxes"][0][batch["gt_valid"][0]]
    for g in gt:
        d = np.linalg.norm(boxes[:, :2] - g[:2], axis=1).min()
        assert d < 1.0, (d, g, boxes[:, :2])


def test_train_step_on_mesh(stack, rng):
    """Same step jitted over the 8-device virtual mesh, batch sharded."""
    model, voxel_gen, assigners, class_ids, test_cfg = stack
    assert len(jax.devices()) == 8
    mesh = make_mesh()
    batch = _synth_scene(rng, batch=8)
    state = _init_state(model, voxel_gen, {k: v[:2] for k, v in batch.items()})
    train_step = make_train_step(model, voxel_gen, assigners, class_ids,
                                 mesh=mesh)
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
    state, metrics = train_step(state, jbatch)
    assert np.isfinite(float(metrics["loss"]))


def test_predict_step_on_mesh_matches_unsharded(stack, rng):
    """Sharded predict (data-parallel mesh) must produce identical
    detections to the single-device path. Parity role: the reference's
    dist_test.py:156-228 multi-GPU inference."""
    model, voxel_gen, assigners, class_ids, test_cfg = stack
    assert len(jax.devices()) == 8
    mesh = make_mesh()
    batch = _synth_scene(rng, batch=8)
    state = _init_state(model, voxel_gen, {k: v[:2] for k, v in batch.items()})
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
    plain = make_predict_step(model, voxel_gen, assigners, class_ids,
                              test_cfg)
    sharded = make_predict_step(model, voxel_gen, assigners, class_ids,
                                test_cfg, mesh=mesh)
    out_p = jax.tree_util.tree_map(np.asarray, plain(state, jbatch))
    out_s = jax.tree_util.tree_map(np.asarray, sharded(state, jbatch))
    assert out_p.keys() == out_s.keys()
    np.testing.assert_array_equal(out_p["valid"], out_s["valid"])
    np.testing.assert_array_equal(out_p["label_preds"], out_s["label_preds"])
    v = out_p["valid"]
    np.testing.assert_allclose(out_p["scores"][v], out_s["scores"][v],
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(out_p["box3d_lidar"][v],
                               out_s["box3d_lidar"][v], rtol=0, atol=1e-4)


def test_anchors_mask_end_to_end(stack, rng):
    """pos_area_threshold >= 0 flows through train and predict: empty-area
    anchors are pruned from targets and suppressed in detections."""
    model, voxel_gen, assigners, class_ids, test_cfg = stack
    for a in assigners:
        object.__setattr__(a, "anchor_area_threshold", 0.0)
        a.prepare_anchors_mask(voxel_gen.voxel_size,
                               voxel_gen.point_cloud_range,
                               voxel_gen.grid_size)
    try:
        batch = _synth_scene(rng, batch=2)
        jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
        example = build_example(jbatch, voxel_gen, assigners, class_ids,
                                with_targets=True)
        assert "anchors_mask" in example
        amask = np.asarray(example["anchors_mask"][0])
        assert amask.shape == (2, example["anchors"][0].shape[1])
        assert amask.any() and not amask.all()
        labels = np.asarray(example["labels"][0])
        assert np.all(labels[~amask] == -1)

        state = _init_state(model, voxel_gen, batch)
        train_step = make_train_step(model, voxel_gen, assigners, class_ids)
        state2, metrics = train_step(state, jbatch)
        assert np.isfinite(float(metrics["loss"]))

        predict_step = make_predict_step(model, voxel_gen, assigners,
                                         class_ids, test_cfg)
        out = predict_step(state2, jbatch)
        assert out["valid"].shape[0] == 2   # runs with the mask plumbed in
    finally:
        for a in assigners:
            object.__setattr__(a, "anchor_area_threshold", -1.0)
            a._mask_cells = None
