"""KITTI image-domain viewer: project 3D boxes into the camera image.

Parity: det3d/visualization/kitti.py — Calibration (:68), project_to_image
(:307), compute_box_3d (:329), the image drawing path of kitti_object /
show helpers. The reference draws with mayavi/cv2 on a GUI; here the
drawing is cv2 onto numpy arrays (headless-safe, save with cv2.imwrite or
PIL), and the projection math reuses core.box_ops (one implementation
framework-wide instead of the reference's third copy).

Camera-frame boxes are KITTI label convention: (x, y, z) bottom-center in
rect coords, (h, w, l) extents, ry around the camera y (down) axis.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


class Calibration:
    """KITTI calib file view (kitti.py:68-244 surface: P2, R0_rect,
    Tr_velo_to_cam + the project/transform methods)."""

    def __init__(self, calib_path_or_dict):
        if isinstance(calib_path_or_dict, dict):
            calibs = calib_path_or_dict
        else:
            calibs = self._read(calib_path_or_dict)
        self.P = np.asarray(calibs["P2"], np.float64).reshape(3, 4)
        self.V2C = np.asarray(calibs["Tr_velo_to_cam"],
                              np.float64).reshape(3, 4)
        self.R0 = np.asarray(calibs["R0_rect"], np.float64).reshape(3, 3)

    @staticmethod
    def _read(path):
        out = {}
        for line in Path(path).read_text().splitlines():
            if ":" not in line:
                continue
            k, v = line.split(":", 1)
            out[k.strip()] = np.fromstring(v, sep=" ")
        return out

    def project_velo_to_rect(self, pts):
        """(N, 3) lidar -> rect camera coords."""
        hom = np.hstack([pts, np.ones((pts.shape[0], 1))])
        return (self.R0 @ (self.V2C @ hom.T)).T

    def project_rect_to_image(self, pts):
        """(N, 3) rect -> (N, 2) pixels (kitti.py:307-327)."""
        hom = np.hstack([pts, np.ones((pts.shape[0], 1))])
        uvw = (self.P @ hom.T).T
        return uvw[:, :2] / uvw[:, 2:3]

    def project_velo_to_image(self, pts):
        return self.project_rect_to_image(self.project_velo_to_rect(pts))


def compute_box_3d(box_camera, calib: Calibration):
    """KITTI camera box (x,y,z,h,w,l,ry) -> ((8, 2) pixel corners or None
    if behind the camera, (8, 3) rect corners). Parity: kitti.py:329-361
    (corner ordering: 4 top, then 4 bottom, x-l/w pattern matching the
    reference's qs list)."""
    x, y, z, h, w, l, ry = (float(v) for v in box_camera[:7])
    c, s = np.cos(ry), np.sin(ry)
    rot = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
    xs = np.array([l, l, -l, -l, l, l, -l, -l]) / 2
    ys = np.array([0, 0, 0, 0, -h, -h, -h, -h])
    zs = np.array([w, -w, -w, w, w, -w, -w, w]) / 2
    corners = (rot @ np.stack([xs, ys, zs])).T + np.array([x, y, z])
    if np.any(corners[:, 2] < 0.1):
        return None, corners
    return calib.project_rect_to_image(corners), corners


_EDGES = [(0, 1), (1, 2), (2, 3), (3, 0),          # bottom ring
          (4, 5), (5, 6), (6, 7), (7, 4),          # top ring
          (0, 4), (1, 5), (2, 6), (3, 7)]          # verticals


def draw_projected_box3d(image, corners2d, color=(0, 255, 0), thickness=2):
    """Draw a projected wireframe onto an HxWx3 uint8 image (in place)."""
    import cv2
    if corners2d is None:
        return image
    pts = np.round(corners2d).astype(int)
    for a, b in _EDGES:
        cv2.line(image, tuple(pts[a]), tuple(pts[b]), color, thickness,
                 cv2.LINE_AA)
    return image


def draw_box2d(image, bbox, color=(255, 200, 0), thickness=2, label=None):
    import cv2
    x1, y1, x2, y2 = (int(round(v)) for v in bbox[:4])
    cv2.rectangle(image, (x1, y1), (x2, y2), color, thickness)
    if label:
        cv2.putText(image, str(label), (x1, max(y1 - 4, 10)),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.5, color, 1, cv2.LINE_AA)
    return image


def show_image_with_boxes(image, boxes_camera, calib, labels=None,
                          color=(0, 255, 0), scores=None):
    """Draw camera-frame 3D boxes (N, 7) on a copy of the image.

    Returns the drawn image (the reference pops a GUI window; headless
    callers save the array instead)."""
    img = np.ascontiguousarray(image).copy()
    for i, box in enumerate(np.asarray(boxes_camera).reshape(-1, 7)):
        corners2d, _ = compute_box_3d(box, calib)
        draw_projected_box3d(img, corners2d, color=color)
        if corners2d is not None and labels is not None:
            import cv2
            tag = str(labels[i])
            if scores is not None:
                tag += f" {float(scores[i]):.2f}"
            anchor = (int(corners2d[:, 0].min()),
                      max(int(corners2d[:, 1].min()) - 4, 10))
            cv2.putText(img, tag, anchor, cv2.FONT_HERSHEY_SIMPLEX, 0.5,
                        color, 1, cv2.LINE_AA)
    return img


def show_lidar_boxes_on_image(image, boxes_lidar, calib, **kw):
    """Lidar-frame (x,y,z,w,l,h,yaw) boxes -> image overlay, converting
    through core.box_ops.box_lidar_to_camera (one conversion kernel
    framework-wide)."""
    from det3d_tpu.core.box_ops import box_lidar_to_camera
    r_rect = np.eye(4)
    r_rect[:3, :3] = calib.R0
    v2c = np.eye(4)
    v2c[:3] = calib.V2C
    cam = box_lidar_to_camera(np.asarray(boxes_lidar).reshape(-1, 7),
                              r_rect, v2c)
    # box_lidar_to_camera yields center-origin (x,y,z,l,h,w,r); shift to
    # KITTI label layout (bottom-origin x,y,z,h,w,l,ry)
    out = np.zeros_like(cam)
    out[:, 0] = cam[:, 0]
    out[:, 1] = cam[:, 1] + cam[:, 4] / 2.0      # bottom y
    out[:, 2] = cam[:, 2]
    out[:, 3] = cam[:, 4]                        # h
    out[:, 4] = cam[:, 5]                        # w
    out[:, 5] = cam[:, 3]                        # l
    out[:, 6] = cam[:, 6]
    return show_image_with_boxes(image, out, calib, **kw)
