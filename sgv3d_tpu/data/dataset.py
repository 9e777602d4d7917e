"""Roadside multi-view detection dataset (host-side, numpy; no torch).

Reads the `*_infos_*.pkl` files produced by tools/gen_info_*.py (same schema
as the reference's scripts) and reproduces the per-sample pipeline of
/root/reference/dataset/nusc_mv_det_dataset.py:239-816: calibration matrices,
denorm/sensor2virtual/reference height, 50% intrinsic/extrinsic rectify aug,
deterministic ida resize/crop, optional semantic mask, 30% brightness aug,
imnormalize, gt boxes in ego frame, CBGS resampling.

Outputs numpy arrays shaped for the jit train step: images NHWC, gt padded to
max_objs (the TPU-native replacement for the reference's ragged lists).
"""
from __future__ import annotations

import os
import pickle
from typing import Sequence

import numpy as np
from PIL import Image

from sgv3d_tpu import geom
from sgv3d_tpu.data import transforms

MAP_NAME_TO_DETECTION = {
    "human.pedestrian.adult": "pedestrian",
    "human.pedestrian.child": "pedestrian",
    "human.pedestrian.wheelchair": "ignore",
    "human.pedestrian.stroller": "ignore",
    "human.pedestrian.personal_mobility": "ignore",
    "human.pedestrian.police_officer": "pedestrian",
    "human.pedestrian.construction_worker": "pedestrian",
    "animal": "ignore",
    "vehicle.car": "car",
    "vehicle.motorcycle": "motorcycle",
    "vehicle.bicycle": "bicycle",
    "vehicle.bus.bendy": "bus",
    "vehicle.bus.rigid": "bus",
    "vehicle.truck": "truck",
    "vehicle.construction": "construction_vehicle",
    "vehicle.emergency.ambulance": "ignore",
    "vehicle.emergency.police": "ignore",
    "vehicle.trailer": "trailer",
    "movable_object.barrier": "barrier",
    "movable_object.trafficcone": "traffic_cone",
    "movable_object.pushable_pullable": "ignore",
    "movable_object.debris": "ignore",
    "static_object.bicycle_rack": "ignore",
}


def load_infos(info_path: str):
    with open(info_path, "rb") as f:
        return pickle.load(f)


def quat_to_rot(wxyz) -> np.ndarray:
    # normalised, as pyquaternion Quaternion.rotation_matrix
    w, x, y, z = np.asarray(wxyz, np.float64) / np.linalg.norm(wxyz)
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def _pose_to_mat(pose: dict) -> np.ndarray:
    out = np.eye(4)
    if "rotation_matrix" in pose:
        out[:3, :3] = np.asarray(pose["rotation_matrix"])
    else:
        out[:3, :3] = quat_to_rot(pose["rotation"])
    out[:3, 3] = np.asarray(pose["translation"])
    return out


def quat_yaw(wxyz) -> float:
    """Yaw of a quaternion (yaw_pitch_roll[0] convention of pyquaternion)."""
    w, x, y, z = np.asarray(wxyz, np.float64) / np.linalg.norm(wxyz)
    return float(np.arctan2(2 * (w * z - x * y), 1 - 2 * (y * y + z * z)))


def quat_mul(a, b) -> np.ndarray:
    w1, x1, y1, z1 = a
    w2, x2, y2, z2 = b
    return np.array([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
    ])


def quat_conj(q) -> np.ndarray:
    q = np.asarray(q, np.float64)
    return np.array([q[0], -q[1], -q[2], -q[3]])


class RoadSideDataset:
    """Map-style dataset; __getitem__ returns a dict of numpy arrays."""

    def __init__(self, ida_aug_conf: dict, classes: Sequence[str],
                 data_root: str, info_path: str, is_train: bool,
                 img_conf: dict | None = None, return_semantic: bool = False,
                 use_cbgs: bool = False, max_objs: int = 500,
                 semantic_mask_dir: str = "training/mask_image",
                 num_sweeps: int = 1, key_idxes: Sequence[int] = (),
                 seed: int = 0, device_normalize: bool = False):
        self.infos = load_infos(info_path)
        self.ida_aug_conf = ida_aug_conf
        self.classes = list(classes)
        self.data_root = data_root
        self.is_train = is_train
        img_conf = img_conf or dict(
            img_mean=[123.675, 116.28, 103.53],
            img_std=[58.395, 57.12, 57.375], to_rgb=True)
        self.img_mean = np.asarray(img_conf["img_mean"], np.float32)
        self.img_std = np.asarray(img_conf["img_std"], np.float32)
        self.to_rgb = img_conf["to_rgb"]
        # device_normalize: emit raw uint8 pixels and let the model apply
        # imnormalize on-device (models.bev_height.normalize_images) — 4x
        # smaller host->device transfers, same math in fp32.
        self.device_normalize = device_normalize
        if device_normalize and not self.to_rgb:
            raise ValueError("device_normalize assumes to_rgb channel "
                             "reversal (the reference's imnormalize default)")
        self.return_semantic = return_semantic
        self.semantic_mask_dir = semantic_mask_dir
        self.max_objs = max_objs
        # Multi-frame support mirrors the reference's key_idxes plumbing
        # (/root/reference/dataset/nusc_mv_det_dataset.py:289-292,736-758):
        # negative offsets select past key frames; a frame from another scene
        # (or before the start) falls back to the key frame itself.
        assert all(k < 0 for k in key_idxes), "key_idxes must be negative"
        self.key_idxes = [0] + list(key_idxes)
        self.num_sweeps = max(num_sweeps, len(self.key_idxes))
        self.rng = np.random.default_rng(seed)
        self.use_cbgs = use_cbgs
        if use_cbgs:
            self.cat2id = {n: i for i, n in enumerate(self.classes)}
            self.sample_indices = self._get_sample_indices()

    def _get_sample_indices(self):
        class_sample_idxs = {i: [] for i in self.cat2id.values()}
        for idx, info in enumerate(self.infos):
            names = set(a["category_name"] for a in info["ann_infos"])
            for n in names:
                n = MAP_NAME_TO_DETECTION.get(n, "ignore")
                if n in self.cat2id:
                    class_sample_idxs[self.cat2id[n]].append(idx)
        dup = sum(len(v) for v in class_sample_idxs.values())
        frac = 1.0 / len(self.classes)
        out = []
        for inds in class_sample_idxs.values():
            if not inds:
                continue
            ratio = frac / (len(inds) / dup)
            out += list(self.rng.choice(inds, int(len(inds) * ratio)))
        return out

    def __len__(self):
        return len(self.sample_indices) if self.use_cbgs else len(self.infos)

    def _resolve_image_path(self, filename: str) -> str:
        path = os.path.join(self.data_root, filename)
        if not os.path.exists(path):
            for a, b in ((".png", ".jpg"), (".jpg", ".png")):
                if a in path and os.path.exists(path.replace(a, b)):
                    return path.replace(a, b)
        return path

    def get_image(self, cam_info: dict):
        """One camera, key frame. Returns dict of per-camera arrays."""
        path = self._resolve_image_path(cam_info["filename"])
        img = Image.open(path)
        if img.mode != "RGB":
            img = img.convert("RGB")

        semantic_img = None
        if self.return_semantic:
            name = os.path.splitext(os.path.basename(path))[0] + ".npy"
            mask_path = os.path.join(self.data_root, self.semantic_mask_dir,
                                     name)
            if os.path.exists(mask_path):
                semantic_img = Image.fromarray(np.load(mask_path))
            else:
                semantic_img = Image.fromarray(
                    np.zeros((img.size[1], img.size[0], 3), np.uint8))

        sensor2ego = _pose_to_mat(cam_info["calibrated_sensor"])
        ego2sensor = np.linalg.inv(sensor2ego)
        intrin = np.eye(4)
        intrin[:3, :3] = np.asarray(
            cam_info["calibrated_sensor"]["camera_intrinsic"])

        resize, resize_dims, crop, flip, rot = \
            transforms.sample_ida_augmentation(self.ida_aug_conf)

        if self.is_train and self.rng.random() < 0.5:
            intrin, ego2sensor, ratio, roll, tpitch = \
                transforms.sample_intrin_extrin_augmentation(
                    self.rng, intrin, ego2sensor)
            img = transforms.img_intrin_extrin_transform(
                img, ratio, roll, tpitch, intrin)
            if semantic_img is not None:
                semantic_img = transforms.img_intrin_extrin_transform(
                    semantic_img, ratio, roll, tpitch, intrin)
            sensor2ego = np.linalg.inv(ego2sensor)

        denorm = geom.get_denorm(ego2sensor)
        sensor2virtual = geom.get_sensor2virtual(denorm)
        reference_height = geom.get_reference_height(denorm)

        img, ida_mat = transforms.img_transform(
            img, resize, resize_dims, crop, flip, rot)
        gt_semantic = None
        if semantic_img is not None:
            semantic_img, _ = transforms.img_transform(
                semantic_img, resize, resize_dims, crop, flip, rot)
            arr = (np.array(semantic_img) / 40).astype(np.uint8)
            gt_semantic = arr[:, :, 0] if arr.ndim == 3 else arr

        img = np.array(img)
        if self.is_train and self.rng.random() < 0.3:
            img = transforms.brightness_augment(self.rng, img)
        if self.device_normalize:
            img = np.ascontiguousarray(img.astype(np.uint8))
        else:
            img = transforms.imnormalize(img, self.img_mean, self.img_std,
                                         self.to_rgb).astype(np.float32)
        return dict(
            img=img,                                     # (H, W, 3)
            sensor2ego=sensor2ego.astype(np.float32),
            sensor2virtual=sensor2virtual.astype(np.float32),
            intrin=intrin.astype(np.float32),
            ida=ida_mat.astype(np.float32),
            reference_height=np.float32(reference_height),
            gt_semantic=gt_semantic,
        )

    def get_gt(self, info: dict):
        """Padded (max_objs, 9) boxes + (max_objs,) labels in the ego frame."""
        cams = list(info["cam_infos"].keys())
        ego2global_rotation = np.mean(
            [info["cam_infos"][c]["ego_pose"]["rotation"] for c in cams], 0)
        ego2global_translation = np.mean(
            [info["cam_infos"][c]["ego_pose"]["translation"] for c in cams], 0)
        trans = -np.asarray(ego2global_translation)
        rot_inv = quat_to_rot(ego2global_rotation).T

        boxes = np.zeros((self.max_objs, 9), np.float32)
        labels = np.full((self.max_objs,), -1, np.int32)
        n = 0
        for ann in info["ann_infos"]:
            name = MAP_NAME_TO_DETECTION.get(ann["category_name"], "ignore")
            if name not in self.classes:
                continue
            if ann.get("num_lidar_pts", 1) + ann.get("num_radar_pts", 0) <= 0:
                continue
            if n >= self.max_objs:
                break
            center = np.asarray(ann["translation"], np.float64) + trans
            center = rot_inv @ center
            wlh = np.asarray(ann["size"], np.float64)
            # composed-quaternion yaw, as nuscenes Box.rotate + yaw_pitch_roll
            # (reference get_gt :697-705): wrapped into (-pi, pi], unlike a
            # plain yaw difference (tests/data_oracle.py proves this path)
            yaw = quat_yaw(quat_mul(quat_conj(ego2global_rotation),
                                    ann["rotation"]))
            # nuscenes Box.rotate spins the FULL velocity 3-vector before
            # [:2] is taken (reference get_gt :700-707) — with pitch/roll in
            # the ego rotation the vz term leaks into vx/vy, so rotate all 3
            vel3 = np.asarray(ann.get("velocity", [0.0, 0.0, 0.0]),
                              np.float64)
            vel = (rot_inv @ vel3)[:2]
            boxes[n, :3] = center
            boxes[n, 3:6] = wlh[[1, 0, 2]]  # dx(l), dy(w), dz(h)
            boxes[n, 6] = yaw
            boxes[n, 7:9] = vel
            labels[n] = self.classes.index(name)
            n += 1
        return boxes, labels

    def __getitem__(self, idx: int):
        if self.use_cbgs:
            idx = self.sample_indices[idx]
        info = self.infos[idx]
        cams = list(info["cam_infos"].keys())

        # Resolve one frame per key_idx (scene-guarded, like the reference).
        sweep_infos = []
        for key_idx in self.key_idxes:
            cur = idx + key_idx
            if cur < 0 or (self.infos[cur]["scene_token"]
                           != info["scene_token"]):
                cur = idx
            sweep_infos.append(self.infos[cur])
        sweeps = [[self.get_image(si["cam_infos"][c]) for c in cams]
                  for si in sweep_infos]
        cam_data = sweeps[0]  # key frame

        n = len(cams)
        # sensor2sensor: key-frame sensor -> sweep sensor (ego poses are
        # identity for the roadside datasets, as in the reference infos).
        s2s = np.stack([
            np.stack([np.linalg.inv(sw[c]["sensor2ego"])
                      @ cam_data[c]["sensor2ego"]
                      for c in range(n)]).astype(np.float32)
            for sw in sweeps])
        sample = dict(
            imgs=np.stack(
                [np.stack([c["img"] for c in sw]) for sw in sweeps]),
            sensor2ego_mats=np.stack(
                [np.stack([c["sensor2ego"] for c in sw]) for sw in sweeps]),
            sensor2virtual_mats=np.stack(
                [np.stack([c["sensor2virtual"] for c in sw])
                 for sw in sweeps]),
            intrin_mats=np.stack(
                [np.stack([c["intrin"] for c in sw]) for sw in sweeps]),
            ida_mats=np.stack(
                [np.stack([c["ida"] for c in sw]) for sw in sweeps]),
            sensor2sensor_mats=s2s,
            reference_heights=np.stack(
                [np.asarray([c["reference_height"] for c in sw], np.float32)
                 for sw in sweeps]),
            bda_mat=np.eye(4, dtype=np.float32),
            img_metas=dict(
                token=info["sample_token"],
                ego2global_translation=np.mean(
                    [info["cam_infos"][c]["ego_pose"]["translation"]
                     for c in cams], 0),
                ego2global_rotation=np.mean(
                    [info["cam_infos"][c]["ego_pose"]["rotation"]
                     for c in cams], 0),
            ),
        )
        if self.is_train:
            gt_boxes, gt_labels = self.get_gt(info)
            gt_boxes, bda_rot = geom.bev_transform(gt_boxes, 0, 1.0,
                                                   False, False)
            sample["bda_mat"][:3, :3] = bda_rot
            sample["gt_boxes"] = gt_boxes
            sample["gt_labels"] = gt_labels
        else:
            sample["gt_boxes"] = np.zeros((self.max_objs, 9), np.float32)
            sample["gt_labels"] = np.full((self.max_objs,), -1, np.int32)
        if self.return_semantic:
            sample["gt_semantic"] = np.stack(
                [c["gt_semantic"] for c in cam_data]).astype(np.int32)
        return sample


def collate(samples: Sequence[dict]):
    """Stack samples into (imgs, mats, gt_boxes, gt_labels, gt_semantic,
    img_metas) — the jit train/eval step signature."""
    imgs = np.stack([s["imgs"] for s in samples])
    mats = {
        k: np.stack([s[k] for s in samples])
        for k in ("sensor2ego_mats", "sensor2virtual_mats", "intrin_mats",
                  "ida_mats", "sensor2sensor_mats", "reference_heights",
                  "bda_mat")
    }
    gt_boxes = np.stack([s["gt_boxes"] for s in samples])
    gt_labels = np.stack([s["gt_labels"] for s in samples])
    gt_semantic = (np.stack([s["gt_semantic"] for s in samples])
                   if "gt_semantic" in samples[0] else None)
    img_metas = [s["img_metas"] for s in samples]
    return imgs, mats, gt_boxes, gt_labels, gt_semantic, img_metas


class DataLoader:
    """Minimal batching loader with optional shuffling and drop_last, plus a
    one-batch lookahead prefetch thread (the host has few cores; heavy
    parallelism belongs to the TPU side).

    `shard_id`/`num_shards` give every process of a multi-host run its own
    round-robin slice of the (identically seeded, so identically shuffled)
    index sequence, padded by wrapping so all shards are the same length —
    the reference's DistributedSampler semantics (Lightning injects it,
    SURVEY §2.9), and the exact layout `dist.interleave_shards` undoes on
    the eval gather.
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 drop_last: bool = False, seed: int = 0, prefetch: bool = True,
                 to_device: bool = False, shard_id: int = 0,
                 num_shards: int = 1):
        assert 0 <= shard_id < num_shards
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.rng = np.random.default_rng(seed)
        self.prefetch = prefetch
        self.shard_id = shard_id
        self.num_shards = num_shards
        # to_device: issue jax.device_put for the array fields from the
        # prefetch thread, so the (slow) host->device transfer of batch i+1
        # overlaps with the device compute of batch i. img_metas stay host.
        self.to_device = to_device

    def _shard_len(self):
        return -(-len(self.dataset) // self.num_shards)  # padded, equal

    def __len__(self):
        n = self._shard_len()
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def _put(self, batch):
        if not self.to_device:
            return batch
        import jax
        imgs, mats, gt_boxes, gt_labels, gt_semantic, img_metas = batch
        return (jax.device_put(imgs), jax.device_put(mats),
                jax.device_put(gt_boxes), jax.device_put(gt_labels),
                gt_semantic if gt_semantic is None
                else jax.device_put(gt_semantic), img_metas)

    def _batches(self):
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(order)
        if self.num_shards > 1:
            pad = self._shard_len() * self.num_shards - order.size
            order = np.concatenate([order, order[:pad]])  # wrap-pad
            order = order[self.shard_id::self.num_shards]
        for i in range(len(self)):
            idxs = order[i * self.batch_size:(i + 1) * self.batch_size]
            yield self._put(collate([self.dataset[int(j)] for j in idxs]))

    def __iter__(self):
        if not self.prefetch:
            yield from self._batches()
            return
        import queue
        import threading
        q: "queue.Queue" = queue.Queue(maxsize=2)
        sentinel = object()
        stop = threading.Event()

        def _bounded_put(item) -> bool:
            # A consumer that abandons the iterator mid-epoch (e.g.
            # runner.train's max_steps break) never drains the queue; an
            # unconditional put would then block this thread for the
            # process lifetime, pinning up to 3 batches — device-resident
            # arrays on the to_device path (code review r5).
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            try:
                for b in self._batches():
                    if not _bounded_put(b):
                        return
            finally:
                _bounded_put(sentinel)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is sentinel:
                    break
                yield item
        finally:
            # runs on break/GC-close of the generator as well as exhaustion
            stop.set()
