"""End-to-end CBGS family: VoxelNet + SpMiddleResNetFHD + multi-task
9-dim (velocity) head — the nuScenes NDS flagship composition."""

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

PC_RANGE = (-12.8, -12.8, -3.0, 12.8, 12.8, 1.0)
VOXEL_SIZE = (0.2, 0.2, 0.1)                     # grid (128, 128, 40)


@pytest.mark.slow
def test_cbgs_stack_trains_and_detects(rng):
    # fuse_mean: the fused voxelize+mean-VFE path build_stack enables for
    # every VFEV3 config (core/voxelize.py::voxelize_mean) — exercised
    # end-to-end here
    voxel_gen = VoxelGenerator(voxel_size=VOXEL_SIZE,
                               point_cloud_range=PC_RANGE,
                               max_num_points=5, max_voxels=1024,
                               fuse_mean=True)
    grid = voxel_gen.grid_size
    tasks = [dict(num_class=1, class_names=["car"]),
             dict(num_class=1, class_names=["pedestrian"])]
    coder_cfg = dict(type="ground_box3d_coder", n_dim=9, linear_dim=False,
                     encode_angle_vector=True)
    model = build_detector(dict(
        type="VoxelNet",
        reader=dict(type="VoxelFeatureExtractorV3", num_input_features=5),
        backbone=dict(type="SpMiddleResNetFHD", num_input_features=5),
        neck=dict(type="RPN", layer_nums=[2], ds_layer_strides=[1],
                  ds_num_filters=[64], us_layer_strides=[1],
                  us_num_filters=[64], num_input_features=256),
        bbox_head=dict(
            type="MultiGroupHead", mode="3d", in_channels=64, tasks=tasks,
            weights=[1, 1], box_coder=coder_cfg,
            encode_background_as_zeros=True,
            loss_norm=dict(type="NormByNumPositives", pos_cls_weight=1.0,
                           neg_cls_weight=2.0),
            loss_cls=dict(type="SigmoidFocalLoss", alpha=0.25, gamma=2.0,
                          loss_weight=1.0),
            loss_bbox=dict(type="WeightedSmoothL1Loss", sigma=3.0,
                           codewise=True, loss_weight=0.25,
                           code_weights=[1.0] * 6 + [0.2, 0.2] + [1.0, 1.0]),
            encode_rad_error_by_sin=False,
            loss_aux=None,                       # CBGS: no dir classifier
        )), grid_size=grid)

    coder = GroundBox3dCoder(vec_encode=True, n_dim=9)
    gens = [
        AnchorGeneratorRange(
            anchor_ranges=[-12.8, -12.8, -1.0, 12.8, 12.8, -1.0],
            sizes=[1.95, 4.6, 1.72], velocities=[0, 0],
            rotations=[0, np.pi / 2], match_threshold=0.5,
            unmatch_threshold=0.35, class_name="car"),
        AnchorGeneratorRange(
            anchor_ranges=[-12.8, -12.8, -1.2, 12.8, 12.8, -1.2],
            sizes=[0.66, 0.72, 1.75], velocities=[0, 0],
            rotations=[0, np.pi / 2], match_threshold=0.35,
            unmatch_threshold=0.2, class_name="pedestrian"),
    ]
    assigners = [TargetAssigner(box_coder=coder, anchor_generators=[g])
                 for g in gens]
    for a in assigners:
        a.generate_anchors([1, grid[1] // 8, grid[0] // 8])
    class_ids = [[1], [2]]
    test_cfg = dict(
        nms=dict(use_rotate_nms=True, use_multi_class_nms=False,
                 nms_pre_max_size=128, nms_post_max_size=16,
                 nms_iou_threshold=0.2),
        score_threshold=0.2,
        post_center_limit_range=[-15, -15, -5, 15, 15, 5],
        max_per_img=32)

    # scene: one moving car + one pedestrian
    pts = np.zeros((1, 768, 5), np.float32)
    gt = np.zeros((1, 4, 9), np.float32)
    gt[0, 0] = [4.0, -3.0, -1.0, 1.95, 4.6, 1.72, 3.0, -1.0, 0.6]
    gt[0, 1] = [-5.0, 5.0, -1.2, 0.66, 0.72, 1.75, 0.4, 0.4, 1.2]
    gt_cls = np.zeros((1, 4), np.int32)
    gt_cls[0, :2] = [1, 2]
    gt_valid = np.zeros((1, 4), bool)
    gt_valid[0, :2] = True
    cursor = 0
    for g in range(2):
        k = 200
        dims = gt[0, g, 3:6]
        th = gt[0, g, 8]
        local = rng.uniform(-0.5, 0.5, (k, 3)) * dims
        c, s = np.cos(th), np.sin(th)
        pts[0, cursor:cursor + k, 0] = (local[:, 0] * c + local[:, 1] * s
                                        + gt[0, g, 0])
        pts[0, cursor:cursor + k, 1] = (-local[:, 0] * s + local[:, 1] * c
                                        + gt[0, g, 1])
        pts[0, cursor:cursor + k, 2] = gt[0, g, 2] + local[:, 2]
        cursor += k
    rest = 768 - cursor
    pts[0, cursor:, 0] = rng.uniform(-12, 12, rest)
    pts[0, cursor:, 1] = rng.uniform(-12, 12, rest)
    pts[0, cursor:, 2] = rng.uniform(-2.5, 0.5, rest)
    batch = {"points": jnp.asarray(pts),
             "num_points": jnp.full((1,), 768, jnp.int32),
             "gt_boxes": jnp.asarray(gt), "gt_classes": jnp.asarray(gt_cls),
             "gt_valid": jnp.asarray(gt_valid)}

    ex = build_example(batch, voxel_gen, [], [], with_targets=False)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), ex["voxels"], ex["num_points_per_voxel"],
        ex["coordinates"], train=False)
    lr_fn, mom_fn = one_cycle(3e-3, 200)
    tx = build_optimizer(dict(TYPE="adam", VALUE=dict(wd=0.01),
                              FIXED_WD=True), lr_fn, mom_fn)
    state = TrainState.create(variables["params"],
                              variables["batch_stats"], tx)
    train_step = make_train_step(model, voxel_gen, assigners, class_ids)
    losses = []
    for _ in range(200):
        state, metrics = train_step(state, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.3, (losses[0], losses[-1])

    predict_step = make_predict_step(model, voxel_gen, assigners,
                                     class_ids, test_cfg)
    out = predict_step(state, batch)
    valid = np.asarray(out["valid"][0])
    boxes = np.asarray(out["box3d_lidar"][0])[valid]
    labels = np.asarray(out["label_preds"][0])[valid]
    assert boxes.shape[-1] == 9
    assert len(boxes) >= 1
    # the car is found near its position with roughly its velocity
    car = boxes[labels == 0]
    assert len(car) >= 1
    d = np.linalg.norm(car[:, :2] - gt[0, 0, :2], axis=1)
    best = car[np.argmin(d)]
    assert d.min() < 1.5, (d, gt[0, 0, :2])
    assert abs(best[6] - 3.0) < 1.5 and abs(best[7] + 1.0) < 1.5, best[6:8]
