"""Synthetic mini-nuScenes: info creation, sweeps, CBGS, native NDS eval."""

import pickle

import numpy as np
import pytest

from tests import mini_nuscenes as mn


@pytest.fixture(scope="module")
def nusc_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("mini_nusc")
    gt_truth = mn.make_tree(root, n_scenes=2, keyframes=4, sweeps_between=2)
    from det3d_tpu.datasets.nuscenes.nusc_common import create_nuscenes_infos
    create_nuscenes_infos(str(root), version=mn.VERSION, nsweeps=3)
    return root, gt_truth


def test_infos(nusc_root):
    root, gt_truth = nusc_root
    with open(root / "infos_train_03sweeps_withvelo.pkl", "rb") as f:
        train = pickle.load(f)
    with open(root / "infos_val_03sweeps_withvelo.pkl", "rb") as f:
        val = pickle.load(f)
    assert len(train) == 4 and len(val) == 4
    info = train[1]                                 # keyframe 1 has sweeps
    assert len(info["sweeps"]) == 2
    assert info["sweeps"][0]["transform_matrix"] is not None
    # gt boxes in sensor frame, 9-dim [x y z w l h vx vy r]
    truth = gt_truth[info["token"]]
    gt = np.asarray(info["gt_boxes"])
    assert gt.shape == (3, 9)
    for i, t in enumerate(truth):
        np.testing.assert_allclose(gt[i, :3], t["center"], atol=1e-6)
        np.testing.assert_allclose(gt[i, 3:6], t["wlh"], atol=1e-6)
        np.testing.assert_allclose(gt[i, 6:8], t["velocity"], atol=1e-6)
        # r = -yaw - pi/2
        np.testing.assert_allclose(gt[i, 8], -t["yaw"] - np.pi / 2,
                                   atol=1e-6)
    names = list(info["gt_names"])
    assert names == ["car", "car", "pedestrian"]
    assert list(info["gt_attributes"]) == [
        "vehicle.moving", "vehicle.parked", "pedestrian.moving"]


def test_pipeline_sweeps_and_cbgs(nusc_root):
    root, _ = nusc_root
    from det3d_tpu.datasets import build_dataset
    pipeline = [
        dict(type="LoadPointCloudFromFile", dataset="NuScenesDataset"),
        dict(type="LoadPointCloudAnnotations", with_bbox=True),
        dict(type="Preprocess", cfg=dict(
            mode="train", shuffle_points=False,
            gt_loc_noise=[0, 0, 0], gt_rot_noise=[0, 0],
            global_rot_noise=[0, 0], global_scale_noise=[1, 1],
            global_trans_noise=0.0,
            class_names=["car", "pedestrian"])),
        dict(type="Reformat", max_points=16384, max_gt=16),
    ]
    ds = build_dataset(dict(
        type="NuScenesDataset", root_path=str(root),
        info_path=str(root / "infos_train_03sweeps_withvelo.pkl"),
        class_names=["car", "pedestrian"], nsweeps=3, pipeline=pipeline))
    # CBGS resampling: every info has both classes so counts stay balanced,
    # but resampled length = sum over classes of ~len/2-normalized picks
    assert len(ds) >= 4
    ex = ds[1]
    assert ex["points"].shape == (16384, 6)   # xyzit + time channel
    n = int(ex["num_points"])
    pts = ex["points"][:n]
    # 3 sweeps concatenated -> distinct time lags present
    lags = np.unique(np.round(pts[:, -1], 3))
    assert len(lags) >= 2 and lags.min() == 0.0
    assert ex["gt_boxes"].shape[-1] == 9
    assert int(ex["gt_valid"].sum()) == 3


def _perfect_preds(infos, class_names, noise=0.0, rng=None):
    dets = {}
    for info in infos:
        boxes = np.asarray(info["gt_boxes"], np.float64).copy()
        if noise and rng is not None:
            boxes[:, :2] += rng.uniform(-noise, noise, (len(boxes), 2))
        labels = np.array([class_names.index(n)
                           for n in info["gt_names"]])
        dets[info["token"]] = {
            "box3d_lidar": boxes.astype(np.float32),
            "scores": np.linspace(0.95, 0.6, len(boxes)).astype(np.float32),
            "label_preds": labels.astype(np.int64),
        }
    return dets


def test_native_eval(nusc_root):
    root, _ = nusc_root
    from det3d_tpu.datasets import build_dataset
    class_names = ["car", "pedestrian"]
    ds = build_dataset(dict(
        type="NuScenesDataset", root_path=str(root),
        info_path=str(root / "infos_val_03sweeps_withvelo.pkl"),
        class_names=class_names, nsweeps=3, pipeline=[], test_mode=True))
    dets = _perfect_preds(ds._nusc_infos, class_names)
    results, _ = ds.evaluation(dets, None)
    m = results["detail"]["eval.nusc"]
    assert m["mean_ap"] > 0.99, m["mean_ap"]
    assert m["tp_errors"]["trans_err"] < 0.01
    assert m["tp_errors"]["vel_err"] < 0.01
    assert m["nd_score"] > 0.9, m["nd_score"]

    # moving car must be attributed vehicle.moving by the velocity heuristic
    preds = ds._det_eval_boxes(dets)
    any_tok = next(iter(preds))
    attr = {round(b["velocity"][0], 1): b["attribute_name"]
            for b in preds[any_tok] if b["detection_name"] == "car"}
    assert "vehicle.moving" in attr.values()
    assert "vehicle.parked" in attr.values()

    # noisy predictions degrade AP at the tight threshold
    rng = np.random.RandomState(3)
    noisy = _perfect_preds(ds._nusc_infos, class_names, noise=0.8, rng=rng)
    results2, _ = ds.evaluation(noisy, None)
    m2 = results2["detail"]["eval.nusc"]
    aps2 = m2["label_aps"]["car"]
    assert aps2[0.5] < aps2[4.0]
    assert m2["tp_errors"]["trans_err"] > 0.2

    # empty predictions
    empty = {info["token"]: {"box3d_lidar": np.zeros((0, 9), np.float32),
                             "scores": np.zeros((0,), np.float32),
                             "label_preds": np.zeros((0,), np.int64)}
             for info in ds._nusc_infos}
    results3, _ = ds.evaluation(empty, None)
    assert results3["detail"]["eval.nusc"]["mean_ap"] < 0.01


def test_lyft_dataset_and_eval(nusc_root):
    """Lyft shares the table machinery; kaggle-style 3D-IoU mAP eval."""
    root, _ = nusc_root
    from det3d_tpu.datasets.lyft.lyft import create_lyft_infos
    from det3d_tpu.datasets import build_dataset
    import json
    create_lyft_infos(str(root), version=mn.VERSION, nsweeps=3,
                      splits=json.loads((root / "splits.json").read_text()))
    class_names = ["vehicle.car", "human.pedestrian.adult"]
    ds = build_dataset(dict(
        type="LyftDataset", root_path=str(root),
        info_path=str(root / "lyft_infos_val_03sweeps.pkl"),
        class_names=class_names, nsweeps=3, pipeline=[], test_mode=True))
    assert len(ds) == 4
    dets = _perfect_preds(ds._nusc_infos, class_names)
    results, _ = ds.evaluation(dets, None)
    detail = results["detail"]["eval.lyft"]
    assert detail["mAP"] > 0.99, detail

    # degraded boxes lose the high-IoU thresholds first
    rng = np.random.RandomState(5)
    noisy = _perfect_preds(ds._nusc_infos, class_names, noise=0.4, rng=rng)
    results2, _ = ds.evaluation(noisy, None)
    aps = np.asarray(results2["detail"]["eval.lyft"]["aps"])
    assert np.nanmean(aps[:, 0]) > np.nanmean(aps[:, -1])


def test_nds_golden_fixture():
    """Hand-derived golden values for the full NDS path (nusc_eval.evaluate;
    reference: nuscenes-devkit detection algo.py / evaluate.py).

    Fixture: 4 car GTs, 4 detections matched in score order 0.9/0.8/0.7/0.6
    with pure x-translation errors 0.1/0.2/0.3/0.4 m (all < every matching
    threshold), identical sizes/yaws/velocities/attributes, no FPs.

    Hand derivation:
      rec = [.25, .5, .75, 1], prec = [1,1,1,1] -> 101-pt interp precision
      is 1.0 everywhere -> AP = 1.0 exactly at each of the 4 thresholds.
      cummean(trans errs) = [.1, .15, .2, .25] at conf [.9, .8, .7, .6];
      conf(r) is piecewise-linear through (0.25, .9)..(1.0, .6) (left=.9),
      and err(conf) linear through those knots, so on the recall grid
      err(r) = .1 for r <= .25 and .1 + .2*(r - .25) for r in [.25, 1].
      ATE = mean over the 90 grid points r = .11..1.00.
      NDS = (5*mAP + (1-ATE) + 4*1.0) / 10.
    """
    from det3d_tpu.datasets.nuscenes import nusc_eval

    def box(x, score=None, err=0.0):
        b = {
            "detection_name": "car",
            "translation": (x + err, 0.0, 1.0),
            "size": (2.0, 4.5, 1.6),
            "yaw": 0.3,
            "velocity": (1.0, 0.0),
            "attribute_name": "vehicle.moving",
            "num_pts": 10,
        }
        if score is not None:
            b["detection_score"] = score
        return b

    xs = [5.0, 15.0, 25.0, 35.0]
    gts = {"tok": [box(x) for x in xs]}
    preds = {"tok": [box(x, score=s, err=e) for x, s, e in
                     zip(xs, [0.9, 0.8, 0.7, 0.6], [0.1, 0.2, 0.3, 0.4])]}

    m = nusc_eval.evaluate(gts, preds, classes=["car"])

    for th, ap in m["label_aps"]["car"].items():
        assert abs(ap - 1.0) < 1e-12, (th, ap)
    assert abs(m["mean_ap"] - 1.0) < 1e-12

    # closed-form ATE over the recall grid
    grid = np.linspace(0, 1, 101)[11:]
    err = np.where(grid <= 0.25, 0.1, 0.1 + 0.2 * (grid - 0.25))
    ate = float(err.mean())
    assert abs(m["tp_errors"]["trans_err"] - ate) < 1e-12
    for k in ("scale_err", "orient_err", "vel_err", "attr_err"):
        assert abs(m["tp_errors"][k]) < 1e-12, (k, m["tp_errors"][k])

    nds = (5.0 * 1.0 + (1.0 - ate) + 4.0) / 10.0
    assert abs(m["nd_score"] - nds) < 1e-12
