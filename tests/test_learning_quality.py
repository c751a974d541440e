"""End-to-end learning-quality gate on the synthetic mini-KITTI.

Trains the small PointPillars config through the full stack (GT-AUG paste
augmentation, per-object noise, global transforms, on-device voxelize +
targets, jitted mesh step) and requires real detection quality on the
held-out split under the OFFICIAL evaluator. Reference-quality anchor: the
same recipe at 150 epochs reaches 3D AP@0.5 ~ 81 (see docs); the gate is
set well below to absorb seed variance.
"""

import numpy as np
import pytest

from tests import mini_kitti as mk


@pytest.mark.slow
def test_trains_to_detection_quality(tmp_path_factory):
    root = tmp_path_factory.mktemp("learn_kitti")
    mk.make_tree(root, n_scenes=16)
    cfg = mk.mini_config(str(root), total_epochs=150, workers=2)
    cfg["checkpoint_interval"] = 150
    cfg["log_interval"] = 100
    # pin global batch to 2 (not 2 x 8 virtual devices): the gate anchors
    # to the 600-gradient-step recipe, not to examples seen
    cfg["scale_batch_by_devices"] = False

    from det3d_tpu.apis import eval_detector, train_detector
    work = tmp_path_factory.mktemp("learn_work")
    trainer = train_detector(cfg, work_dir=str(work))
    results, dets = eval_detector(cfg, trainer.state, work_dir=str(work))
    detail = results["detail"]["eval.kitti"]["official"]
    # loose-overlap 3D AP (IoU 0.5): the model must genuinely detect.
    # Recipe reproducibly reaches ~81; the 70 gate absorbs seed variance
    # while still failing on any real training-path regression.
    assert detail["Car_3d_easy_loose"] > 70.0, detail
    # and the strict bbox AP shows localization, not box spam
    assert detail["Car_bbox_easy"] > 40.0, detail


@pytest.mark.slow
def test_sparse_family_trains_to_detection_quality(tmp_path_factory):
    """Same gate for the sparse-middle (SECOND) family: catches rulebook /
    gather-GEMM training-path regressions where they live."""
    root = tmp_path_factory.mktemp("learn_kitti_second")
    mk.make_tree(root, n_scenes=16)
    cfg = mk.mini_second_config(str(root), total_epochs=150, workers=2)
    cfg["checkpoint_interval"] = 150
    cfg["log_interval"] = 100
    cfg["scale_batch_by_devices"] = False

    from det3d_tpu.apis import eval_detector, train_detector
    work = tmp_path_factory.mktemp("learn_second_work")
    trainer = train_detector(cfg, work_dir=str(work))
    results, dets = eval_detector(cfg, trainer.state, work_dir=str(work))
    detail = results["detail"]["eval.kitti"]["official"]
    # sparse recipe is noisier than the pillar one; 60 still fails a 2x
    # training-quality regression (reproduced level ~81)
    assert detail["Car_3d_easy_loose"] > 60.0, detail
    assert detail["Car_bbox_easy"] > 40.0, detail
