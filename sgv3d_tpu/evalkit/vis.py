"""BEV / image visualisation helpers (demo and dataset sanity checks).

Equivalent of the reference's /root/reference/evaluators/utils.py
(PointCloudFilter BEV canvas :18, KittiCalibration :365) and the 3D-box
drawing used by result2kitti's `demo=` flag; implemented with PIL instead of
cv2 (not in this image).
"""
from __future__ import annotations

import os

import numpy as np
from PIL import Image, ImageDraw


class BEVCanvas:
    """Top-down raster over (side, forward) ranges at a given resolution."""

    def __init__(self, side_range=(-60, 60), fwd_range=(0, 100), res=0.1):
        self.side_range = side_range
        self.fwd_range = fwd_range
        self.res = res
        self.width = int((side_range[1] - side_range[0]) / res)
        self.height = int((fwd_range[1] - fwd_range[0]) / res)
        self.img = Image.new("RGB", (self.width, self.height), (0, 0, 0))
        self.draw = ImageDraw.Draw(self.img)
        # range rings every 10 m
        for r in range(10, int(fwd_range[1]) + 1, 10):
            px = self.to_pixels(np.array([[0.0, r]]))[0]
            self.draw.ellipse(
                [self.width / 2 - r / res, self.height - r / res,
                 self.width / 2 + r / res, self.height + r / res],
                outline=(40, 40, 40))
            del px

    def to_pixels(self, xy: np.ndarray) -> np.ndarray:
        """(N, 2) of (side, forward) metres -> pixel coords."""
        px = (xy[:, 0] - self.side_range[0]) / self.res
        py = self.height - (xy[:, 1] - self.fwd_range[0]) / self.res
        return np.stack([px, py], axis=1)

    def draw_box(self, corners_xy: np.ndarray, color=(255, 0, 0), width=2):
        """corners_xy: (4, 2) BEV footprint in (side, forward) metres."""
        px = self.to_pixels(corners_xy)
        for i in range(4):
            a, b = px[i], px[(i + 1) % 4]
            self.draw.line([tuple(a), tuple(b)], fill=color, width=width)

    def save(self, path: str):
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self.img.save(path)


def box_bev_corners(x, y, dx, dy, yaw) -> np.ndarray:
    """BEV footprint corners of an ego-frame box; (side, forward) = (y, x)."""
    c, s = np.cos(yaw), np.sin(yaw)
    local = np.array([[dx / 2, dy / 2], [dx / 2, -dy / 2],
                      [-dx / 2, -dy / 2], [-dx / 2, dy / 2]])
    R = np.array([[c, -s], [s, c]])
    world = local @ R.T + np.array([x, y])
    return np.stack([world[:, 1], world[:, 0]], axis=1)


def render_bev_comparison(pred_boxes, gt_boxes, save_path,
                          side_range=(-60, 60), fwd_range=(0, 100)):
    """Predictions (blue) vs GT (red) BEV demo image; boxes are 9-dim ego."""
    canvas = BEVCanvas(side_range, fwd_range)
    for b in np.asarray(gt_boxes).reshape(-1, 9):
        canvas.draw_box(box_bev_corners(b[0], b[1], b[3], b[4], b[6]),
                        color=(255, 0, 0))
    for b in np.asarray(pred_boxes).reshape(-1, 9):
        canvas.draw_box(box_bev_corners(b[0], b[1], b[3], b[4], b[6]),
                        color=(0, 128, 255))
    canvas.save(save_path)
    return save_path


class KittiCalibration:
    """KITTI calib txt reader: P2, Tr_velo_to_cam and derived transforms."""

    def __init__(self, calib_path: str):
        self.P2 = None
        self.Tr_velo_to_cam = np.eye(4)
        with open(calib_path) as f:
            for line in f:
                parts = line.strip().split(" ")
                if parts[0] == "P2:":
                    self.P2 = np.array(parts[1:13], np.float64).reshape(3, 4)
                elif parts[0] == "Tr_velo_to_cam:":
                    self.Tr_velo_to_cam[:3] = np.array(
                        parts[1:13], np.float64).reshape(3, 4)
        self.Tr_cam_to_velo = np.linalg.inv(self.Tr_velo_to_cam)

    def project_lidar_to_image(self, pts: np.ndarray) -> np.ndarray:
        """(N, 3) lidar points -> (N, 2) pixels."""
        homog = np.concatenate([pts, np.ones((pts.shape[0], 1))], axis=1)
        cam = (self.Tr_velo_to_cam @ homog.T)[:3]
        uv = self.P2 @ np.concatenate([cam, np.ones((1, cam.shape[1]))])
        return (uv[:2] / uv[2]).T


def draw_boxes_on_image(img: np.ndarray, corners_2d_list, color=(0, 255, 0),
                        width=2) -> np.ndarray:
    """Draw projected 3D wireframes ((8, 2) corners each) on an RGB array."""
    pil = Image.fromarray(img.astype(np.uint8))
    draw = ImageDraw.Draw(pil)
    edges = [(0, 1), (1, 2), (2, 3), (3, 0), (4, 5), (5, 6), (6, 7), (7, 4),
             (0, 4), (1, 5), (2, 6), (3, 7)]
    for corners in corners_2d_list:
        for a, b in edges:
            draw.line([tuple(corners[a]), tuple(corners[b])], fill=color,
                      width=width)
    return np.array(pil)
