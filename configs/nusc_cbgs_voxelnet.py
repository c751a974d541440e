"""CBGS: VoxelNet + SpMiddleResNetFHD + RPN2, nuScenes 10-class.

Parity config: reference examples/cbgs/configs/
nusc_all_vfev3_spmiddleresnetfhd_rpn2_mghead_syncbn.py. Data root from
$NUSC_DATA. North-star target: NDS 61.3 (README.md:29).
"""

import itertools
import os

from det3d_tpu.config_presets.nusc import (nusc_anchor_generators,
                                           nusc_db_sampler, nusc_tasks)

data_root = os.environ.get("NUSC_DATA", "/data/nuscenes")
nsweeps = 10

tasks = nusc_tasks()
class_names = list(itertools.chain(*[t["class_names"] for t in tasks]))
norm_cfg = dict(type="SyncBN", eps=1e-3, momentum=0.01)

target_assigner = dict(
    type="iou",
    anchor_generators=nusc_anchor_generators(51.2),
    sample_positive_fraction=-1,
    sample_size=512,
    region_similarity_calculator=dict(type="nearest_iou_similarity"),
    tasks=tasks,
)
box_coder = dict(type="ground_box3d_coder", n_dim=9, linear_dim=False,
                 encode_angle_vector=True)

model = dict(
    type="VoxelNet",
    reader=dict(type="VoxelFeatureExtractorV3", num_input_features=5),
    # dense_from=2: res2 of the 60k-voxel middle is ~8% occupied — dense
    # conv3d beats rulebook gathers there (measured 245 -> 192 ms/scan
    # predict @ B=2 on v5e, docs/DESIGN_NOTES.md section 8)
    # serve_band: plan-fed serving runs subm convs on the banded one-hot
    # matmul kernel (ops/band_conv.py); bucket covers the measured
    # per-256-row-block target spread (<= 1320 on structured 300k-point
    # scans; host_plan_fn certifies each batch and raises if exceeded)
    # serve_precision: plan-fed serving runs the middle (band fetch
    # matmuls + dense conv3d tail) on bf16; BN/decode stay fp32.
    backbone=dict(type="SpMiddleResNetFHD", num_input_features=5,
                  ds_factor=8, norm_cfg=norm_cfg, dense_from=2,
                  serve_band=1536,
                  # per-column sub-bands: measured per-col spread <= 596
                  serve_col_band=768,
                  # strided convs on the band kernel too (r5: the two
                  # gather-path down convs were 38 of 132 ms/call in the
                  # device trace); measured buckets 1240/774 (+margin)
                  serve_down_band=1536, serve_down_col_band=896,
                  serve_precision="bf16"),
    neck=dict(type="RPN", layer_nums=[5, 5], ds_layer_strides=[1, 2],
              ds_num_filters=[128, 256], us_layer_strides=[1, 2],
              us_num_filters=[256, 256], num_input_features=256,
              norm_cfg=norm_cfg),
    bbox_head=dict(
        type="MultiGroupHead", mode="3d", in_channels=512,
        norm_cfg=norm_cfg, tasks=tasks, weights=[1],
        box_coder=box_coder,
        encode_background_as_zeros=True,
        loss_norm=dict(type="NormByNumPositives", pos_cls_weight=1.0,
                       neg_cls_weight=2.0),
        loss_cls=dict(type="SigmoidFocalLoss", alpha=0.25, gamma=2.0,
                      loss_weight=1.0),
        use_sigmoid_score=True,
        loss_bbox=dict(type="WeightedSmoothL1Loss", sigma=3.0,
                       code_weights=[1.0, 1.0, 1.0, 1.0, 1.0, 1.0,
                                     0.2, 0.2, 1.0, 1.0],
                       codewise=True, loss_weight=0.25),
        encode_rad_error_by_sin=False,
        loss_aux=None,
    ),
)

assigner = dict(box_coder=box_coder, target_assigner=target_assigner,
                out_size_factor=8)
train_cfg = dict(assigner=assigner)

test_cfg = dict(
    nms=dict(use_rotate_nms=True, use_multi_class_nms=False,
             nms_pre_max_size=1000, nms_post_max_size=83,
             nms_iou_threshold=0.2),
    score_threshold=0.1,
    post_center_limit_range=[-61.2, -61.2, -10.0, 61.2, 61.2, 10.0],
    max_per_img=500,
)

voxel_generator = dict(
    range=[-51.2, -51.2, -5.0, 51.2, 51.2, 3.0],
    voxel_size=[0.1, 0.1, 0.2],
    max_points_in_voxel=10,
    max_voxel_num=60000,
)

db_sampler = nusc_db_sampler(
    os.path.join(data_root, f"dbinfos_train_{nsweeps:02d}sweeps.pkl"),
    enable=False)

train_preprocessor = dict(
    mode="train", shuffle_points=True,
    gt_loc_noise=[0.0, 0.0, 0.0], gt_rot_noise=[0.0, 0.0],
    global_rot_noise=[-0.3925, 0.3925],
    global_scale_noise=[0.95, 1.05],
    global_trans_noise=[0.2, 0.2, 0.2],
    remove_unknown_examples=False,
    db_sampler=db_sampler,
    class_names=class_names,
)
val_preprocessor = dict(mode="val", shuffle_points=False)

train_pipeline = [
    dict(type="LoadPointCloudFromFile", dataset="NuScenesDataset"),
    dict(type="LoadPointCloudAnnotations", with_bbox=True),
    dict(type="Preprocess", cfg=train_preprocessor),
    dict(type="Voxelization", cfg=voxel_generator),
    dict(type="AssignTarget", cfg=train_cfg["assigner"]),
    dict(type="Reformat", max_points=300000, max_gt=500, box_dim=9),
]
test_pipeline = [
    dict(type="LoadPointCloudFromFile", dataset="NuScenesDataset"),
    dict(type="LoadPointCloudAnnotations", with_bbox=True),
    dict(type="Preprocess", cfg=val_preprocessor),
    dict(type="Reformat", max_points=300000, max_gt=500, box_dim=9),
]

train_anno = os.path.join(data_root,
                          f"infos_train_{nsweeps:02d}sweeps_withvelo.pkl")
val_anno = os.path.join(data_root,
                        f"infos_val_{nsweeps:02d}sweeps_withvelo.pkl")

data = dict(
    samples_per_gpu=16,
    workers_per_gpu=6,
    train=dict(type="NuScenesDataset", root_path=data_root,
               info_path=train_anno, nsweeps=nsweeps,
               class_names=class_names, pipeline=train_pipeline),
    val=dict(type="NuScenesDataset", root_path=data_root,
             info_path=val_anno, nsweeps=nsweeps, test_mode=True,
             class_names=class_names, pipeline=test_pipeline),
)

optimizer = dict(TYPE="adam", VALUE=dict(amsgrad=0.0, wd=0.01),
                 FIXED_WD=True, MOVING_AVERAGE=False)
optimizer_config = dict(grad_clip=dict(max_norm=35, norm_type=2))
lr_config = dict(type="one_cycle", lr_max=0.002, moms=[0.95, 0.85],
                 div_factor=10.0, pct_start=0.4)

checkpoint_interval = 1
log_interval = 5
total_epochs = 20
workflow = [("train", 1)]
