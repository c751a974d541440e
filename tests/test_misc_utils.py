"""2D eval utils, RANSAC ground plane, cloud path shim, fileio."""

import numpy as np
import pytest

from det3d_tpu.core import eval2d


def test_bbox_overlaps_known_values():
    a = np.array([[0, 0, 10, 10]], np.float32)
    b = np.array([[0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]],
                 np.float32)
    iou = eval2d.bbox_overlaps(a, b)
    np.testing.assert_allclose(iou[0], [1.0, 25.0 / 175.0, 0.0], rtol=1e-6)
    iof = eval2d.bbox_overlaps(a, b, mode="iof")
    np.testing.assert_allclose(iof[0], [1.0, 0.25, 0.0], rtol=1e-6)


def test_average_precision_perfect_and_modes():
    rec = np.array([0.5, 1.0])
    prec = np.array([1.0, 1.0])
    assert eval2d.average_precision(rec, prec, "area") == pytest.approx(1.0)
    assert eval2d.average_precision(rec, prec,
                                    "11points") == pytest.approx(1.0)
    # half the GTs found at precision 1 -> area AP 0.5
    rec2 = np.array([0.25, 0.5])
    assert eval2d.average_precision(rec2, prec,
                                    "area") == pytest.approx(0.5)


def test_eval_map_hand_case():
    # 1 image, 1 class, 2 GTs; 3 dets: hit, duplicate-hit (fp), miss (fp)
    gts = [np.array([[0, 0, 10, 10], [20, 0, 30, 10]], np.float32)]
    labels = [np.array([1, 1])]
    dets = [[np.array([[0, 0, 10, 10, 0.9],
                       [1, 0, 11, 10, 0.8],
                       [50, 50, 60, 60, 0.7]], np.float32)]]
    mean_ap, results = eval2d.eval_map(dets, gts, labels, iou_thr=0.5)
    # PR walk: r=[.5,.5,.5], p=[1,.5,1/3] -> area AP = 0.5 * 1.0
    assert mean_ap == pytest.approx(0.5)
    assert results[0]["num_gts"] == 2 and results[0]["num_dets"] == 3


def test_eval_map_ignored_gt_absorbs():
    gts = [np.array([[0, 0, 10, 10]], np.float32)]
    labels = [np.array([1])]
    ignore = [np.array([True])]
    dets = [[np.array([[0, 0, 10, 10, 0.9]], np.float32)]]
    mean_ap, results = eval2d.eval_map(dets, gts, labels, gt_ignore=ignore)
    assert results[0]["num_gts"] == 0            # ignored GT not counted
    assert mean_ap == 0.0                        # no countable class


def test_eval_recalls():
    gts = [np.array([[0, 0, 10, 10], [20, 20, 30, 30]], np.float32)]
    props = [np.array([[0, 0, 10, 10, 0.9], [100, 100, 110, 110, 0.8]],
                      np.float32)]
    rec = eval2d.eval_recalls(gts, props, proposal_nums=(1, 2),
                              iou_thrs=(0.5,))
    np.testing.assert_allclose(rec, [[0.5], [0.5]])


def test_get_classes():
    assert eval2d.get_classes("kitti")[0] == "Car"
    assert len(eval2d.get_classes("nuscenes")) == 10
    with pytest.raises(KeyError):
        eval2d.get_classes("waymo")


def test_ransac_ground_plane(rng):
    from det3d_tpu.datasets.utils.ground_plane import (estimate_ground_plane,
                                                       fit_plane_ransac,
                                                       point_plane_distance)
    n = 500
    ground = np.stack([rng.uniform(0, 60, n), rng.uniform(-30, 30, n),
                       -1.7 + 0.02 * rng.randn(n)], -1)
    outliers = rng.uniform([0, -30, -1.0], [60, 30, 2.0], (150, 3))
    pts = np.vstack([ground, outliers]).astype(np.float32)
    plane, inliers = fit_plane_ransac(pts, inlier_thresh=0.08, seed=1)
    # normal ~ +z, offset ~ +1.7
    assert abs(plane[2]) > 0.99 and plane[3] == pytest.approx(1.7, abs=0.05)
    assert inliers.size >= 0.9 * n
    d = point_plane_distance(ground, plane)
    assert np.median(d) < 0.05
    plane2, _ = estimate_ground_plane(pts)
    assert abs(plane2[2]) > 0.99


def test_smart_path_dispatch(tmp_path):
    from det3d_tpu.utils.cloudpath import OSSPath, is_oss_path, smart_path
    p = smart_path(str(tmp_path / "x.bin"))
    assert hasattr(p, "read_bytes") and not is_oss_path(p)
    with pytest.raises(ImportError):
        smart_path("oss://bucket/data/file.bin")
    # pure-path surface works without the SDK
    o = OSSPath("oss://bucket/data/infos_train.pkl")
    assert o.name == "infos_train.pkl" and o.suffix == ".pkl"
    assert o.stem == "infos_train"
    assert str(o.parent) == "oss://bucket/data"
    assert str(o.parent / "gt.bin") == "oss://bucket/data/gt.bin"
    assert is_oss_path(o)


def test_fileio_roundtrip_and_progress(tmp_path, capsys):
    from det3d_tpu.utils import fileio
    obj = {"a": [1, 2, 3], "b": "x"}
    for ext in ("json", "pkl"):
        f = str(tmp_path / f"t.{ext}")
        fileio.dump(obj, f)
        assert fileio.load(f) == obj
    s = fileio.dump(obj, file_format="json")
    import json
    assert json.loads(s) == obj
    with pytest.raises(TypeError):
        fileio.dump(obj, str(tmp_path / "t.unknown"))

    out = fileio.track_progress(lambda x: x * 2, [1, 2, 3], bar_width=10)
    assert out == [2, 4, 6]
    assert list(fileio.track_iter_progress([5, 6])) == [5, 6]
    captured = capsys.readouterr()
    assert "3/3" in captured.out


def test_dist_primitives_single_process():
    from det3d_tpu.parallel.dist_utils import (get_dist_info, master_only,
                                               reduce_dict, synchronize)
    rank, world = get_dist_info()
    assert rank == 0 and world >= 1
    synchronize()                                 # no-op barrier

    calls = []

    @master_only
    def only_rank0(x):
        calls.append(x)
        return x * 2

    assert only_rank0(21) == 42 and calls == [21]

    red = reduce_dict({"loss": 1.5, "acc": np.float64(0.5)})
    assert red == {"acc": 0.5, "loss": 1.5}
    assert all(isinstance(v, float) for v in red.values())
