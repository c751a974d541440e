"""Visualization: KITTI image projection, 3D viewer/PLY export, netviz."""

import numpy as np

from det3d_tpu.visualization.kitti_image import (Calibration,
                                                 compute_box_3d,
                                                 show_image_with_boxes,
                                                 show_lidar_boxes_on_image)


def _identity_calib():
    # camera at origin looking +z, f=100, principal point (200, 150)
    return Calibration({
        "P2": np.array([[100, 0, 200, 0], [0, 100, 150, 0], [0, 0, 1, 0]],
                       np.float64),
        "R0_rect": np.eye(3),
        "Tr_velo_to_cam": np.array(
            # lidar x->cam z, lidar -y->cam x, lidar -z->cam y
            [[0, -1, 0, 0], [0, 0, -1, 0], [1, 0, 0, 0]], np.float64),
    })


def test_projection_known_point():
    calib = _identity_calib()
    # lidar point 10 m ahead -> cam (0, 0, 10) -> pixel (200, 150)
    uv = calib.project_velo_to_image(np.array([[10.0, 0.0, 0.0]]))
    np.testing.assert_allclose(uv[0], [200.0, 150.0], atol=1e-9)
    # 1 m to the lidar-left -> cam x = -1 -> u = 200 - 100/10 = 190
    uv = calib.project_velo_to_image(np.array([[10.0, 1.0, 0.0]]))
    np.testing.assert_allclose(uv[0], [190.0, 150.0], atol=1e-9)


def test_compute_box_3d_and_draw():
    calib = _identity_calib()
    box_cam = np.array([0.0, 1.0, 10.0, 1.5, 1.6, 4.0, 0.3])
    corners2d, corners3d = compute_box_3d(box_cam, calib)
    assert corners2d.shape == (8, 2) and corners3d.shape == (8, 3)
    # bottom y = 1.0, top y = 1.0 - h
    np.testing.assert_allclose(sorted(set(np.round(corners3d[:, 1], 6))),
                               [-0.5, 1.0])
    img = np.zeros((300, 400, 3), np.uint8)
    out = show_image_with_boxes(img, box_cam[None], calib, labels=["Car"],
                                scores=[0.9])
    assert out.sum() > 0 and img.sum() == 0      # drawn on a copy

    behind = np.array([0.0, 1.0, -5.0, 1.5, 1.6, 4.0, 0.0])
    c2d, _ = compute_box_3d(behind, calib)
    assert c2d is None


def test_lidar_boxes_on_image():
    calib = _identity_calib()
    img = np.zeros((300, 400, 3), np.uint8)
    boxes_lidar = np.array([[10.0, 0.0, -1.0, 1.6, 3.9, 1.56, 0.4]])
    out = show_lidar_boxes_on_image(img, boxes_lidar, calib)
    assert out.sum() > 0


def test_viewer3d_png_and_ply(tmp_path, rng):
    from det3d_tpu.visualization.viewer3d import export_ply, show_pointcloud
    pts = rng.uniform([-5, -5, -2], [5, 5, 1], (500, 3)).astype(np.float32)
    pts = np.hstack([pts, rng.uniform(0, 1, (500, 1)).astype(np.float32)])
    gt = np.array([[0, 0, -0.5, 1.6, 3.9, 1.5, 0.3]])
    png = tmp_path / "scene.png"
    show_pointcloud(pts, gt_boxes=gt, save=str(png))
    assert png.exists() and png.stat().st_size > 1000

    ply = tmp_path / "scene.ply"
    export_ply(str(ply), pts, gt_boxes=gt, det_boxes=gt)
    text = ply.read_text()
    assert text.startswith("ply")
    assert f"element vertex {500 + 16}" in text
    assert "element edge 24" in text


def test_netviz_dot_and_summary(tmp_path):
    import jax
    from flax import linen as nn

    from det3d_tpu.visualization import netviz

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Dense(3)(nn.relu(nn.Dense(5)(x)))

    params = Tiny().init(jax.random.PRNGKey(0),
                         np.zeros((1, 4), np.float32))["params"]
    dot = netviz.to_dot(params, "tiny")
    assert dot.startswith('digraph "tiny"')
    assert "Dense_0" in dot and "->" in dot
    written = netviz.render(params, str(tmp_path / "g"), "tiny")
    assert (tmp_path / "g.dot").exists() and written

    table = netviz.summarize(params)
    assert "Dense_0" in table and "total" in table
    # param counts: 4*5+5 + 5*3+3 = 43
    assert "43" in table
