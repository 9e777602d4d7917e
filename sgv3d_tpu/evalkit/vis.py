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


# ---------------------------------------------------------------------------
# Point-cloud BEV demo (reference pcd_vis parity)
# ---------------------------------------------------------------------------

class PointCloudFilter:
    """Lidar point-cloud range filter + BEV rasteriser.

    Vectorised equivalent of the reference's PointCloudFilter
    (/root/reference/evaluators/utils.py:18-150: per-point python loops ->
    numpy masks), preserving its pixel convention (x_img = -y/res shifted by
    side_range, y_img = -x/res shifted by fwd_range).
    """

    def __init__(self, side_range=(-39.68, 39.68), fwd_range=(0, 69.12),
                 height_range=(-2.0, -2.0), res=0.1):
        self.side_range = side_range
        self.fwd_range = fwd_range
        self.height_range = height_range
        self.res = res

    def read_bin(self, path: str) -> np.ndarray:
        """KITTI velodyne .bin -> range-filtered (N, 3) xyz."""
        pts = np.fromfile(path, dtype=np.float32).reshape(-1, 4)
        x, y, z, _ = self.get_pcl_range(pts)
        return np.stack([x, y, z], axis=1)

    def get_pcl_range(self, points: np.ndarray):
        """(N, >=3) points -> (x, y, z, indices) inside side/fwd range."""
        x, y = points[:, 0], points[:, 1]
        keep = ((x > self.fwd_range[0]) & (x < self.fwd_range[1])
                & (y > self.side_range[0]) & (y < self.side_range[1]))
        idx = np.flatnonzero(keep)
        return points[idx, 0], points[idx, 1], points[idx, 2], idx

    def clip_height(self, z: np.ndarray) -> np.ndarray:
        return np.clip(z, self.height_range[0], self.height_range[1])

    def scale_to_255(self, value, minimum, maximum, dtype=np.uint8):
        if minimum == maximum:
            # degenerate range: full intensity per point (shape-preserving;
            # the reference returns a meshgrid image here, which no caller
            # can actually consume — see pcl_2_bev's own special case)
            return np.full(np.shape(value), 255, dtype=dtype)
        return (((value - minimum) / float(maximum - minimum)) * 255).astype(
            dtype)

    def get_meshgrid(self) -> np.ndarray:
        x_max = 1 + int((self.side_range[1] - self.side_range[0]) / self.res)
        y_max = 1 + int((self.fwd_range[1] - self.fwd_range[0]) / self.res)
        return np.zeros([y_max, x_max], dtype=np.uint8)

    def pcl2xy_plane(self, x_points, y_points):
        x_img = (-np.asarray(y_points) / self.res).astype(np.int32)
        y_img = (-np.asarray(x_points) / self.res).astype(np.int32)
        x_img -= int(np.floor(self.side_range[0] / self.res))
        y_img += int(np.ceil(self.fwd_range[1] / self.res))
        return x_img, y_img

    def pcl_2_bev(self, points: np.ndarray) -> np.ndarray:
        """(N, >=3) points -> uint8 BEV intensity image (height-coded)."""
        x, y, z, _ = self.get_pcl_range(points)
        bev = self.get_meshgrid()
        if len(x) == 0:
            return bev
        x_img, y_img = self.pcl2xy_plane(x, y)
        x_img = np.clip(x_img, 0, bev.shape[1] - 1)
        y_img = np.clip(y_img, 0, bev.shape[0] - 1)
        if self.height_range[0] == self.height_range[1]:
            vals = np.full(len(x), 255, np.uint8)
        else:
            vals = self.scale_to_255(self.clip_height(z),
                                     self.height_range[0],
                                     self.height_range[1])
        bev[y_img, x_img] = vals
        return bev


def read_label_bboxes(label_path: str, Tr_cam2lidar: np.ndarray):
    """KITTI label txt -> list of (8, 3) lidar corner boxes.

    Parity with /root/reference/evaluators/result2kitti.py:34-60 including
    the column quirk (file stores h, l, w at cols 8-10, read back as
    dim = [w, l, h]) and the alpha>pi re-derivation of ry.
    """
    import math

    boxes = []
    with open(label_path) as f:
        for line in f:
            row = line.split()
            if len(row) < 15:
                continue
            alpha = float(row[3])
            h, l, w = float(row[8]), float(row[9]), float(row[10])
            pos = np.array([float(row[11]), float(row[12]), float(row[13])],
                           np.float64)
            ry = float(row[14])
            if alpha > np.pi:
                alpha -= 2 * np.pi
                ry = alpha + math.atan2(pos[0], pos[2])
                if ry > np.pi:
                    ry -= 2 * np.pi
                if ry < -np.pi:
                    ry += 2 * np.pi
            yaw_lidar = 0.5 * np.pi - ry
            if h + l + w == 0:
                continue
            loc_lidar = (Tr_cam2lidar @ np.array(
                [pos[0], pos[1], pos[2], 1.0]))[:3]
            loc_lidar[2] += 0.5 * h
            # reference get_lidar_3d_8points subtracts h/2 again -> bottom
            # plane at the original z; dim order [w, l, h] mirrors the writer
            from sgv3d_tpu.evalkit.kitti_writer import lidar_corners
            boxes.append(lidar_corners([w, l, h], yaw_lidar,
                                       [loc_lidar[0], loc_lidar[1],
                                        loc_lidar[2] - 0.5 * h]))
    return boxes


def pcd_vis(boxes, save_file: str, label_path: str | None = None,
            Tr_velo_to_cam: np.ndarray | None = None,
            points: np.ndarray | None = None):
    """Render predictions (blue) vs GT labels (red) over the lidar BEV.

    Parity with /root/reference/evaluators/result2kitti.py:126-155, extended
    with an optional `points` array ((N, >=3) lidar xyz, e.g. from
    PointCloudFilter.read_bin or tools/converters/pcd.read_pcd) rendered as
    the height-coded background the reference's PointCloudFilter.pcl_2_bev
    produces.

    `boxes`: list of (8, 3) lidar-frame corner boxes (predictions).
    """
    range_list = [(-60, 60), (0, 100), (-2.0, -2.0), 0.1]
    # height_range min == max -> points render at full intensity (the
    # reference's scale_to_255 degenerate-range behaviour).
    pf = PointCloudFilter(side_range=range_list[0], fwd_range=range_list[1],
                          height_range=range_list[2], res=range_list[3])
    bev = pf.pcl_2_bev(points) if points is not None else pf.get_meshgrid()
    img = Image.fromarray(np.stack([bev] * 3, axis=-1))
    draw = ImageDraw.Draw(img)

    def draw_corners(corners, color):
        corners = np.asarray(corners)
        x_img, y_img = pf.pcl2xy_plane(corners[:, 0], corners[:, 1])
        for a, b in ((0, 1), (0, 3), (1, 2), (2, 3)):
            draw.line([(int(x_img[a]), int(y_img[a])),
                       (int(x_img[b]), int(y_img[b]))], fill=color, width=2)

    for corners in boxes:
        draw_corners(corners, (0, 128, 255))
    if label_path is not None and os.path.exists(label_path):
        if Tr_velo_to_cam is None:
            raise ValueError(
                "pcd_vis: label_path requires Tr_velo_to_cam (the KITTI "
                "velo->cam extrinsic, e.g. KittiCalibration(...).Tr_velo_to_cam) "
                "to map camera-frame GT boxes into the lidar BEV")
        Tr_cam2lidar = np.linalg.inv(Tr_velo_to_cam)
        for corners in read_label_bboxes(label_path, Tr_cam2lidar):
            draw_corners(corners, (255, 0, 0))
    os.makedirs(os.path.dirname(os.path.abspath(save_file)), exist_ok=True)
    if save_file.lower().endswith((".jpg", ".jpeg")):
        # full-resolution chroma so the 2 px wireframes keep their colour
        img.save(save_file, quality=95, subsampling=0)
    else:
        img.save(save_file)
    return save_file
