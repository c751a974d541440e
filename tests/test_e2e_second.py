"""End-to-end SECOND/VoxelNet: sparse middle + RPN + head, train + predict."""

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

PC_RANGE = (0.0, -8.0, -3.0, 16.0, 8.0, 1.0)
VOXEL_SIZE = (0.2, 0.2, 0.1)                 # -> grid (80, 80, 40)


@pytest.fixture(scope="module")
def stack():
    voxel_gen = VoxelGenerator(voxel_size=VOXEL_SIZE,
                               point_cloud_range=PC_RANGE,
                               max_num_points=5, max_voxels=512)
    grid = voxel_gen.grid_size

    model_cfg = dict(
        type="VoxelNet",
        reader=dict(type="VoxelFeatureExtractorV3", num_input_features=4),
        backbone=dict(type="SpMiddleFHD", num_input_features=4),
        neck=dict(type="RPN", layer_nums=[2], ds_layer_strides=[1],
                  ds_num_filters=[64], us_layer_strides=[1],
                  us_num_filters=[64], num_input_features=128),
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
                 nms_pre_max_size=128, nms_post_max_size=16,
                 nms_iou_threshold=0.5),
        score_threshold=0.3,
        post_center_limit_range=[0, -10, -5, 20, 10, 5],
        max_per_img=16,
    )
    model = build_detector(model_cfg, test_cfg=test_cfg, grid_size=grid)

    gen = AnchorGeneratorRange(
        anchor_ranges=[0, -8, -1.0, 16, 8, -1.0], sizes=[1.6, 3.9, 1.56],
        rotations=[0, np.pi / 2], match_threshold=0.45,
        unmatch_threshold=0.3, class_name="Car")
    assigner = TargetAssigner(box_coder=GroundBox3dCoder(),
                              anchor_generators=[gen])
    # out_size_factor = 8 (three stride-2 stages in the middle)
    assigner.generate_anchors([1, grid[1] // 8, grid[0] // 8])
    return model, voxel_gen, [assigner], [[1]], test_cfg


def _scene(rng, batch=1):
    pts = np.zeros((batch, 640, 4), np.float32)
    gt = np.zeros((batch, 8, 7), np.float32)
    gt_cls = np.zeros((batch, 8), np.int32)
    gt_valid = np.zeros((batch, 8), bool)
    for b in range(batch):
        for g, (cx, cy, th) in enumerate([(5.0, -3.0, 0.5), (11.0, 3.0, 1.2)]):
            gt[b, g] = [cx, cy, -1.0, 1.6, 3.9, 1.56, th]
            gt_cls[b, g] = 1
            gt_valid[b, g] = True
            local = rng.uniform(-0.5, 0.5, (160, 3)) * [1.5, 3.5, 1.4]
            c, s = np.cos(th), np.sin(th)
            pts[b, g * 160:(g + 1) * 160, 0] = (local[:, 0] * c
                                                + local[:, 1] * s + cx)
            pts[b, g * 160:(g + 1) * 160, 1] = (-local[:, 0] * s
                                                + local[:, 1] * c + cy)
            pts[b, g * 160:(g + 1) * 160, 2] = -1.0 + local[:, 2]
        rest = 640 - 320
        pts[b, 320:, 0] = rng.uniform(0, 16, rest)
        pts[b, 320:, 1] = rng.uniform(-8, 8, rest)
        pts[b, 320:, 2] = rng.uniform(-2.5, 0.5, rest)
    return {
        "points": pts,
        "num_points": np.full((batch,), 640, np.int32),
        "gt_boxes": gt, "gt_classes": gt_cls, "gt_valid": gt_valid,
    }


def test_second_trains_and_detects(stack, rng):
    model, voxel_gen, assigners, class_ids, test_cfg = stack
    batch = _scene(rng)
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}

    example = build_example(jbatch, voxel_gen, [], [], with_targets=False)
    variables = model.init(
        jax.random.PRNGKey(0), example["voxels"],
        example["num_points_per_voxel"], example["coordinates"], train=False)
    # 500 steps: at 300 the tiny model sits right at the localization gate
    # and ULP-level trajectory perturbations (e.g. voxel-row reordering in
    # the sparse middle) flip it; 500 converges with margin
    lr_fn, mom_fn = one_cycle(3e-3, 500)
    tx = build_optimizer(dict(TYPE="adam", VALUE=dict(wd=0.01),
                              FIXED_WD=True), lr_fn, mom_fn)
    state = TrainState.create(variables["params"], variables["batch_stats"],
                              tx)
    train_step = make_train_step(model, voxel_gen, assigners, class_ids)
    losses = []
    for _ in range(500):
        state, metrics = train_step(state, jbatch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.5, (losses[0], losses[-1])

    predict_step = make_predict_step(model, voxel_gen, assigners, class_ids,
                                     test_cfg)
    out = predict_step(state, jbatch)
    valid = np.asarray(out["valid"][0])
    boxes = np.asarray(out["box3d_lidar"][0])[valid]
    assert len(boxes) >= 1
    gt = batch["gt_boxes"][0][batch["gt_valid"][0]]
    for g in gt:
        d = np.linalg.norm(boxes[:, :2] - g[:2], axis=1).min()
        assert d < 1.5, (d, g[:2], boxes[:, :2])


def test_pre_ranked_yxz_matches_sorted_path(rng):
    """VoxelGenerator(order="yxz") + SpMiddleFHD(pre_ranked=True) must
    produce bit-identical predictions to the hashed voxelizer + in-middle
    argsort: the middle re-sorts to exactly the order the yxz voxelizer
    emits. (Holds when max_voxels does not overflow — under overflow the
    two orders keep different voxel subsets by design, which is why
    "yxz" is reserved for non-saturating configs.)"""
    batch = _scene(rng)
    points = jnp.asarray(batch["points"])
    num_points = jnp.asarray(batch["num_points"])

    outs = []
    for order, pre in [("hashed", False), ("yxz", True)]:
        voxel_gen = VoxelGenerator(voxel_size=VOXEL_SIZE,
                                   point_cloud_range=PC_RANGE,
                                   max_num_points=5, max_voxels=1024,
                                   order=order)
        model_cfg = dict(
            type="VoxelNet",
            reader=dict(type="VoxelFeatureExtractorV3",
                        num_input_features=4),
            backbone=dict(type="SpMiddleFHD", num_input_features=4,
                          pre_ranked=pre),
            neck=dict(type="RPN", layer_nums=[2], ds_layer_strides=[1],
                      ds_num_filters=[64], us_layer_strides=[1],
                      us_num_filters=[64], num_input_features=128),
            bbox_head=dict(
                type="MultiGroupHead", mode="3d", in_channels=64,
                tasks=[dict(num_class=1, class_names=["Car"])],
                weights=[1],
                box_coder=dict(type="ground_box3d_coder", n_dim=7,
                               linear_dim=False,
                               encode_angle_vector=False),
                encode_background_as_zeros=True,
                loss_norm=dict(type="NormByNumPositives",
                               pos_cls_weight=1.0, neg_cls_weight=1.0),
                loss_cls=dict(type="SigmoidFocalLoss", alpha=0.25,
                              gamma=2.0, loss_weight=1.0),
                loss_bbox=dict(type="WeightedSmoothL1Loss", sigma=3.0,
                               codewise=True, loss_weight=2.0),
                encode_rad_error_by_sin=True,
                loss_aux=dict(type="WeightedSoftmaxClassificationLoss",
                              name="direction_classifier",
                              loss_weight=0.2),
                direction_offset=0.0,
            ),
        )
        model = build_detector(model_cfg, grid_size=voxel_gen.grid_size)
        vox = voxel_gen.generate_batch(points, num_points)
        variables = jax.jit(
            model.init, static_argnames=("train",))(
            jax.random.PRNGKey(0), vox["voxels"],
            vox["num_points_per_voxel"], vox["coords"], train=False)
        preds = jax.jit(lambda v, n, c: model.apply(
            variables, v, n, c, train=False))(
            vox["voxels"], vox["num_points_per_voxel"], vox["coords"])
        outs.append(preds)

    a, b = outs
    la, lb = jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for xa, xb in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(xa), np.asarray(xb))
