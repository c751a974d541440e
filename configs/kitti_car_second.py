"""SECOND (VoxelNet + SpMiddleFHD + RPN1) KITTI car.

Parity config: reference examples/second/configs/
kitti_car_vfev3_spmiddlefhd_rpn1_mghead_syncbn.py. Data root comes from
$KITTI_DATA (default /data/kitti). Voxelization and target assignment run
on device; their reference pipeline entries are honored as config carriers.
"""

import itertools
import os

data_root = os.environ.get("KITTI_DATA", "/data/kitti")

tasks = [dict(num_class=1, class_names=["Car"])]
class_names = list(itertools.chain(*[t["class_names"] for t in tasks]))

norm_cfg = dict(type="SyncBN", eps=1e-3, momentum=0.01)

target_assigner = dict(
    type="iou",
    anchor_generators=[
        dict(type="anchor_generator_range",
             sizes=[1.6, 3.9, 1.56],
             anchor_ranges=[0, -40.0, -1.0, 70.4, 40.0, -1.0],
             rotations=[0, 1.57],
             matched_threshold=0.6, unmatched_threshold=0.45,
             class_name="Car"),
    ],
    sample_positive_fraction=-1,
    sample_size=512,
    region_similarity_calculator=dict(type="nearest_iou_similarity"),
    tasks=tasks,
)

box_coder = dict(type="ground_box3d_coder", n_dim=7, linear_dim=False,
                 encode_angle_vector=False)

model = dict(
    type="VoxelNet",
    reader=dict(type="VoxelFeatureExtractorV3", num_input_features=4),
    # serve_band: plan-fed serving runs subm convs on the banded one-hot
    # matmul kernel (ops/band_conv.py); bucket covers the measured
    # per-256-row-block target spread (<= 666 on structured scans;
    # host_plan_fn certifies each batch and raises if exceeded)
    # serve_precision: plan-fed serving runs the middle's gathers/GEMMs
    # (incl. the band kernel's fetch matmuls) on bf16 — the kernel's dot
    # was measured fp32-bound (bf16x3 passes); BN/decode stay fp32.
    backbone=dict(type="SpMiddleFHD", num_input_features=4, ds_factor=8,
                  norm_cfg=norm_cfg, serve_band=768,
                  # per-column sub-bands: measured per-col spread <= 508
                  serve_col_band=640,
                  # strided convs on the band kernel too (r5); measured
                  # down buckets <= 1054/682 over seeds (+margin)
                  serve_down_band=1280, serve_down_col_band=768,
                  serve_precision="bf16"),
    neck=dict(type="RPN", layer_nums=[5], ds_layer_strides=[1],
              ds_num_filters=[128], us_layer_strides=[1],
              us_num_filters=[128], num_input_features=128,
              norm_cfg=norm_cfg),
    bbox_head=dict(
        type="MultiGroupHead", mode="3d", in_channels=128,
        norm_cfg=norm_cfg, tasks=tasks, weights=[1],
        box_coder=box_coder,
        encode_background_as_zeros=True,
        loss_norm=dict(type="NormByNumPositives", pos_cls_weight=1.0,
                       neg_cls_weight=1.0),
        loss_cls=dict(type="SigmoidFocalLoss", alpha=0.25, gamma=2.0,
                      loss_weight=1.0),
        use_sigmoid_score=True,
        loss_bbox=dict(type="WeightedSmoothL1Loss", sigma=3.0,
                       code_weights=[1.0] * 7, codewise=True,
                       loss_weight=2.0),
        encode_rad_error_by_sin=True,
        loss_aux=dict(type="WeightedSoftmaxClassificationLoss",
                      name="direction_classifier", loss_weight=0.2),
        direction_offset=0.0,
    ),
)

assigner = dict(box_coder=box_coder, target_assigner=target_assigner,
                out_size_factor=8)
train_cfg = dict(assigner=assigner)

test_cfg = dict(
    nms=dict(use_rotate_nms=True, use_multi_class_nms=False,
             nms_pre_max_size=1000, nms_post_max_size=100,
             nms_iou_threshold=0.01),
    score_threshold=0.3,
    post_center_limit_range=[0, -40.0, -5.0, 70.4, 40.0, 5.0],
    max_per_img=100,
)

voxel_generator = dict(
    range=[0, -40.0, -3.0, 70.4, 40.0, 1.0],
    voxel_size=[0.05, 0.05, 0.1],
    max_points_in_voxel=5,
    max_voxel_num=20000,
    # rows in bitmap rank order: the sparse middle skips its res0
    # argsort (KITTI scans occupy ~16k voxels, the cap never saturates,
    # so the yxz overflow policy is moot here)
    order="yxz",
)

db_sampler = dict(
    type="GT-AUG", enable=True,
    db_info_path=os.path.join(data_root, "dbinfos_train.pkl"),
    sample_groups=[dict(Car=15)],
    db_prep_steps=[
        dict(filter_by_min_num_points=dict(Car=5)),
        dict(filter_by_difficulty=[-1]),
    ],
    rate=1.0,
)

train_preprocessor = dict(
    mode="train", shuffle_points=True,
    gt_loc_noise=[1.0, 1.0, 0.5],
    gt_rot_noise=[-0.785, 0.785],
    global_rot_noise=[-0.785, 0.785],
    global_scale_noise=[0.95, 1.05],
    global_trans_noise=[0.0, 0.0, 0.0],
    remove_unknown_examples=False,
    db_sampler=db_sampler,
    class_names=class_names,
)
val_preprocessor = dict(mode="val", shuffle_points=False)

train_pipeline = [
    dict(type="LoadPointCloudFromFile", dataset="KittiDataset"),
    dict(type="LoadPointCloudAnnotations", with_bbox=True),
    dict(type="Preprocess", cfg=train_preprocessor),
    dict(type="Voxelization", cfg=voxel_generator),
    dict(type="AssignTarget", cfg=train_cfg["assigner"]),
    dict(type="Reformat", max_points=40000, max_gt=100),
]
test_pipeline = [
    dict(type="LoadPointCloudFromFile", dataset="KittiDataset"),
    dict(type="LoadPointCloudAnnotations", with_bbox=True),
    dict(type="Preprocess", cfg=val_preprocessor),
    dict(type="Voxelization", cfg=voxel_generator),
    dict(type="Reformat", max_points=40000, max_gt=100),
]

data = dict(
    samples_per_gpu=4,
    workers_per_gpu=2,
    train=dict(type="KittiDataset", root_path=data_root,
               info_path=os.path.join(data_root, "kitti_infos_train.pkl"),
               class_names=class_names, pipeline=train_pipeline),
    val=dict(type="KittiDataset", root_path=data_root,
             info_path=os.path.join(data_root, "kitti_infos_val.pkl"),
             class_names=class_names, pipeline=test_pipeline,
             test_mode=True),
)

optimizer = dict(TYPE="adam", VALUE=dict(amsgrad=0.0, wd=0.01),
                 FIXED_WD=True, MOVING_AVERAGE=False)
optimizer_config = dict(grad_clip=dict(max_norm=35, norm_type=2))
lr_config = dict(type="one_cycle", lr_max=0.003, moms=[0.95, 0.85],
                 div_factor=10.0, pct_start=0.4)

checkpoint_interval = 1
log_interval = 10
total_epochs = 60
workflow = [("train", 1)]
