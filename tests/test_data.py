"""Data pipeline tests: on-disk synthetic dataset -> batches."""
import os
import pickle

import numpy as np
import pytest
from PIL import Image

from sgv3d_tpu.data.dataset import DataLoader, RoadSideDataset, collate
from sgv3d_tpu.data.transforms import (
    imnormalize, img_transform, sample_ida_augmentation)
from sgv3d_tpu import geom

IDA_CONF = {"final_dim": (96, 160), "H": 540, "W": 960,
            "bot_pct_lim": (0.0, 0.0), "cams": ["CAM_FRONT"], "Ncams": 1}
CLASSES = ("car", "pedestrian")


def _make_fake_root(tmp_path, n_frames=4, with_masks=True):
    root = tmp_path / "fake"
    (root / "images").mkdir(parents=True)
    (root / "training/mask_image").mkdir(parents=True)
    rng = np.random.default_rng(0)
    infos = []
    for i in range(n_frames):
        img = (rng.random((540, 960, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(root / "images" / f"{i:06d}.jpg")
        if with_masks:
            mask = (rng.integers(0, 7, (540, 960, 3)) * 40).astype(np.uint8)
            np.save(root / "training/mask_image" / f"{i:06d}.npy", mask)
        cam2ego_rot = (np.array([[0, 0, 1], [-1, 0, 0], [0, -1, 0]], float)
                       @ geom.rodrigues(np.array([0.2, 0, 0])).T)
        anns = []
        for _ in range(3):
            anns.append(dict(
                category_name="vehicle.car",
                translation=[rng.uniform(10, 60), rng.uniform(-10, 10), 0.5],
                size=[1.9, 4.5, 1.6],  # w, l, h
                rotation=[1.0, 0.0, 0.0, 0.0],
                velocity=[0.0, 0.0, 0.0],
                num_lidar_pts=5, num_radar_pts=0))
        anns.append(dict(category_name="animal", translation=[5, 5, 0],
                         size=[1, 1, 1], rotation=[1, 0, 0, 0],
                         velocity=[0, 0, 0], num_lidar_pts=5,
                         num_radar_pts=0))
        infos.append(dict(
            sample_token=f"{i:06d}",
            scene_token="scene0",
            cam_infos={"CAM_FRONT": dict(
                filename=f"images/{i:06d}.jpg",
                calibrated_sensor=dict(
                    rotation_matrix=cam2ego_rot.tolist(),
                    translation=[0.0, 0.0, 6.0],
                    camera_intrinsic=[[1000, 0, 480], [0, 1000, 270],
                                      [0, 0, 1]]),
                ego_pose=dict(rotation=[1.0, 0, 0, 0],
                              translation=[0.0, 0.0, 0.0]),
                timestamp=0)},
            sweeps=[],
            ann_infos=anns))
    with open(root / "infos_train.pkl", "wb") as f:
        pickle.dump(infos, f)
    return root


def test_dataset_sample_shapes(tmp_path):
    root = _make_fake_root(tmp_path)
    ds = RoadSideDataset(IDA_CONF, CLASSES, str(root),
                         str(root / "infos_train.pkl"), is_train=True,
                         return_semantic=True, max_objs=16)
    assert len(ds) == 4
    s = ds[0]
    assert s["imgs"].shape == (1, 1, 96, 160, 3)
    assert s["sensor2ego_mats"].shape == (1, 1, 4, 4)
    assert s["gt_boxes"].shape == (16, 9)
    assert s["gt_semantic"].shape == (1, 96, 160)
    assert s["gt_semantic"].max() <= 6
    # 3 cars kept, the 'animal' (ignore) dropped
    assert (s["gt_labels"] >= 0).sum() == 3
    assert set(s["gt_labels"][s["gt_labels"] >= 0].tolist()) == {0}
    # boxes are in range of the ego frame
    valid = s["gt_boxes"][s["gt_labels"] >= 0]
    assert valid[:, 0].min() > 0
    # dims reordered to (l, w, h) = (4.5, 1.9, 1.6)
    np.testing.assert_allclose(valid[0, 3:6], [4.5, 1.9, 1.6])


def test_dataset_eval_mode_no_gt(tmp_path):
    root = _make_fake_root(tmp_path, with_masks=False)
    ds = RoadSideDataset(IDA_CONF, CLASSES, str(root),
                         str(root / "infos_train.pkl"), is_train=False,
                         max_objs=8)
    s = ds[1]
    assert (s["gt_labels"] == -1).all()
    assert s["img_metas"]["token"] == "000001"


def test_dataloader_batches(tmp_path):
    root = _make_fake_root(tmp_path)
    ds = RoadSideDataset(IDA_CONF, CLASSES, str(root),
                         str(root / "infos_train.pkl"), is_train=True,
                         return_semantic=True, max_objs=8)
    dl = DataLoader(ds, batch_size=2, shuffle=True, drop_last=True)
    batches = list(dl)
    assert len(batches) == 2
    imgs, mats, gt_boxes, gt_labels, gt_semantic, metas = batches[0]
    assert imgs.shape == (2, 1, 1, 96, 160, 3)
    assert mats["intrin_mats"].shape == (2, 1, 1, 4, 4)
    assert mats["reference_heights"].shape == (2, 1, 1)
    assert gt_boxes.shape == (2, 8, 9)
    assert gt_semantic.shape == (2, 1, 96, 160)
    assert len(metas) == 2


def test_ida_resize_crop_consistency():
    resize, resize_dims, crop, flip, rot = sample_ida_augmentation(IDA_CONF)
    # 960x540 -> final (96, 160): resize = max(96/540, 160/960) = 96/540
    assert abs(resize - 96 / 540) < 1e-9
    assert resize_dims == (170, 96)
    # crop is bottom-anchored, width-centred: ((170-160)/2, 96-96, ...)
    assert crop == (5, 0, 165, 96)


def test_imnormalize_channel_reversal():
    img = np.zeros((2, 2, 3), np.uint8)
    img[..., 0] = 100  # R channel in the loaded RGB array
    mean = np.array([10.0, 20.0, 30.0])
    std = np.array([1.0, 2.0, 4.0])
    out = imnormalize(img, mean, std, to_rgb=True)
    # channel reversal puts the 100s into the last channel
    np.testing.assert_allclose(out[0, 0, 2], (100 - 30.0) / 4.0)
    np.testing.assert_allclose(out[0, 0, 0], (0 - 10.0) / 1.0)


def test_reference_height_plausible(tmp_path):
    root = _make_fake_root(tmp_path, with_masks=False)
    ds = RoadSideDataset(IDA_CONF, CLASSES, str(root),
                         str(root / "infos_train.pkl"), is_train=False)
    s = ds[0]
    # camera mounted 6 m up, pitched 0.2 rad: reference height ~ 6 m
    assert 5.0 < float(s["reference_heights"][0, 0]) < 7.0


def test_dataset_multi_sweep(tmp_path):
    """key_idxes=[-1] produces S=2 samples with scene-guarded fallback and
    key->sweep sensor2sensor mats (reference
    dataset/nusc_mv_det_dataset.py:736-758 semantics)."""
    root = _make_fake_root(tmp_path, with_masks=False)
    ds = RoadSideDataset(IDA_CONF, CLASSES, str(root),
                         str(root / "infos_train.pkl"), is_train=False,
                         max_objs=8, key_idxes=[-1])
    s = ds[2]
    assert s["imgs"].shape == (2, 1, 96, 160, 3)
    assert s["sensor2ego_mats"].shape == (2, 1, 4, 4)
    assert s["ida_mats"].shape == (2, 1, 4, 4)
    assert s["reference_heights"].shape == (2, 1)
    assert s["sensor2sensor_mats"].shape == (2, 1, 4, 4)
    # sweep 0's sensor2sensor is the identity (key -> key)
    np.testing.assert_allclose(s["sensor2sensor_mats"][0, 0], np.eye(4),
                               atol=1e-6)
    # the past sweep is a different frame's image
    assert not np.allclose(s["imgs"][0], s["imgs"][1])

    # frame 0 has no predecessor -> falls back to the key frame
    s0 = ds[0]
    np.testing.assert_allclose(s0["imgs"][0], s0["imgs"][1])

    # scene boundary guard: a predecessor from another scene is rejected
    ds.infos[1]["scene_token"] = "other_scene"
    s2 = ds[2]
    np.testing.assert_allclose(s2["imgs"][0], s2["imgs"][1])

    # collate stacks S=2 and the multi-sweep model consumes it
    ds.infos[1]["scene_token"] = "scene0"
    from sgv3d_tpu.data.dataset import collate
    imgs, mats, *_ = collate([ds[2], ds[3]])
    assert imgs.shape == (2, 2, 1, 96, 160, 3)
    assert mats["sensor2sensor_mats"].shape == (2, 2, 1, 4, 4)


def test_device_normalize_parity(tmp_path):
    """uint8 dataset output + on-device normalize == host imnormalize path."""
    import jax.numpy as jnp
    from sgv3d_tpu.models.bev_height import normalize_images
    from tests.tiny_configs import tiny_exp

    root = _make_fake_root(tmp_path)
    kw = dict(is_train=False, max_objs=8)
    ds_host = RoadSideDataset(IDA_CONF, CLASSES, str(root),
                              str(root / "infos_train.pkl"), **kw)
    ds_dev = RoadSideDataset(IDA_CONF, CLASSES, str(root),
                             str(root / "infos_train.pkl"),
                             device_normalize=True, **kw)
    s_host = ds_host[0]["imgs"]
    s_dev = ds_dev[0]["imgs"]
    assert s_dev.dtype == np.uint8
    assert s_host.dtype == np.float32
    cfg = tiny_exp(False)
    normed = np.asarray(normalize_images(jnp.asarray(s_dev), cfg))
    np.testing.assert_allclose(normed, s_host, atol=1e-5)
    # fp32 input passes through untouched
    same = np.asarray(normalize_images(jnp.asarray(s_host), cfg))
    np.testing.assert_array_equal(same, s_host)


def test_dataloader_to_device(tmp_path):
    """to_device batches arrive as committed jax arrays; metas stay host."""
    import jax
    root = _make_fake_root(tmp_path)
    ds = RoadSideDataset(IDA_CONF, CLASSES, str(root),
                         str(root / "infos_train.pkl"), is_train=True,
                         max_objs=8, device_normalize=True)
    loader = DataLoader(ds, 2, to_device=True)
    imgs, mats, gt_boxes, gt_labels, gt_semantic, metas = next(iter(loader))
    assert isinstance(imgs, jax.Array)
    assert isinstance(mats["intrin_mats"], jax.Array)
    assert isinstance(gt_boxes, jax.Array)
    assert isinstance(metas, list)


def test_dataloader_sharding_roundtrip(tmp_path):
    """Round-robin process shards (the reference DistributedSampler layout,
    SURVEY §2.9) reassemble into the original order via
    dist.interleave_shards — the runner's multi-process eval gather."""
    from sgv3d_tpu.dist import interleave_shards

    root = _make_fake_root(tmp_path, n_frames=5)
    ds = RoadSideDataset(IDA_CONF, CLASSES, str(root),
                         str(root / "infos_train.pkl"), is_train=False,
                         max_objs=8)
    full = [m["token"] for batch in DataLoader(ds, 2, prefetch=False)
            for m in batch[5]]
    shard_tokens = []
    for shard_id in range(2):
        loader = DataLoader(ds, 2, prefetch=False, shard_id=shard_id,
                            num_shards=2)
        # both shards pad to the same length (ceil(5/2) = 3) -> equal batches
        assert len(loader) == 2
        shard_tokens.append([m["token"] for b in loader for m in b[5]])
    assert len(shard_tokens[0]) == len(shard_tokens[1]) == 3
    # shard 0 holds samples [0, 2, 4], shard 1 holds [1, 3, wrap-pad 0]
    assert shard_tokens[0] == [full[0], full[2], full[4]]
    assert shard_tokens[1] == [full[1], full[3], full[0]]
    assert interleave_shards(shard_tokens, len(ds)) == full


def test_dataloader_sharded_shuffle_consistent(tmp_path):
    """Same seed => every shard partitions the SAME global permutation (the
    multi-process training contract: processes agree on the epoch order)."""
    root = _make_fake_root(tmp_path, n_frames=4)
    ds = RoadSideDataset(IDA_CONF, CLASSES, str(root),
                         str(root / "infos_train.pkl"), is_train=False,
                         max_objs=8)
    full = [m["token"]
            for b in DataLoader(ds, 4, shuffle=True, seed=7, prefetch=False)
            for m in b[5]]
    got = []
    for shard_id in range(2):
        loader = DataLoader(ds, 2, shuffle=True, seed=7, prefetch=False,
                            shard_id=shard_id, num_shards=2)
        got.append([m["token"] for b in loader for m in b[5]])
    assert [t for pair in zip(*got) for t in pair] == full


def test_dataloader_prefetch_thread_stops_on_abandon():
    """Abandoning a prefetching loader mid-epoch (runner.train's max_steps
    break) must release the worker thread — an unconditional q.put would
    block it forever, pinning up to 3 batches of (device) memory per
    abandoned epoch (code review r5)."""
    import threading
    import time

    from sgv3d_tpu.data.dataset import DataLoader

    loader = DataLoader.__new__(DataLoader)  # bypass ctor: only the
    loader.prefetch = True                   # prefetch path is under test
    loader._batches = lambda: iter(range(100))

    n0 = threading.active_count()
    it = iter(loader)
    assert next(it) == 0
    it.close()  # what dropping the last reference does in CPython
    deadline = time.time() + 5.0
    while threading.active_count() > n0 and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() == n0, "prefetch worker leaked"
