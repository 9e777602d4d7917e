"""SSDG pipeline tests on a synthetic rope3d-kitti tree."""
import json
import os
import sys

import numpy as np
import pytest
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from ssdg import utils  # noqa: E402
from ssdg.masks import BoxMaskPredictor  # noqa: E402
from ssdg.recombine import run_ssdg  # noqa: E402

H_IMG, W_IMG = 108, 192


def _write_frame(root, fid, fx, cam_h, objs, img_color):
    """One frame: image + calib + denorm + labels."""
    from sgv3d_tpu import geom
    pitch = 0.15
    cam2ego_rot = (np.array([[0, 0, 1], [-1, 0, 0], [0, -1, 0]], float)
                   @ geom.rodrigues(np.array([pitch, 0, 0])).T)
    s2e = np.eye(4)
    s2e[:3, :3] = cam2ego_rot
    s2e[:3, 3] = [0, 0, cam_h]
    velo2cam = np.linalg.inv(s2e)
    img = np.full((H_IMG, W_IMG, 3), img_color, np.uint8)
    Image.fromarray(img).save(
        os.path.join(root, "training/image_2", fid + ".jpg"))
    with open(os.path.join(root, "training/calib", fid + ".txt"), "w") as f:
        P2 = f"{fx} 0.0 {W_IMG/2} 0.0 0.0 {fx} {H_IMG/2} 0.0 0.0 0.0 1.0 0.0"
        f.write(f"P2: {P2}\n")
        f.write("Tr_velo_to_cam: " + " ".join(
            str(v) for v in velo2cam[:3].reshape(-1)) + "\n")
    denorm = utils.get_denorm(velo2cam)
    with open(os.path.join(root, "training/denorm", fid + ".txt"), "w") as f:
        f.write(" ".join(str(v) for v in denorm) + "\n")
    lines = []
    for (x, y) in objs:
        cam = velo2cam @ np.array([x, y, 0.0, 1.0])
        lines.append(f"Car 0 0 0.2 10 20 60 60 1.5 1.9 4.5 "
                     f"{cam[0]:.4f} {cam[1]:.4f} {cam[2]:.4f} 1.2")
    with open(os.path.join(root, "training/label_2", fid + ".txt"), "w") as f:
        f.write("\n".join(lines) + ("\n" if lines else ""))
    with open(os.path.join(root, "training/label_eval", fid + ".txt"),
              "w") as f:
        f.write("\n".join(lines) + ("\n" if lines else ""))


def _fake_kitti_root(tmp_path):
    root = str(tmp_path / "rope3d-kitti")
    for sub in ("training/image_2", "training/calib", "training/denorm",
                "training/label_2", "training/label_eval", "ImageSets"):
        os.makedirs(os.path.join(root, sub))
    # 3 labeled frames (same camera height 7 m) + 2 raw/unlabeled frames:
    # one busy, one nearly empty (the background candidate)
    _write_frame(root, "000000", 420.0, 7.0, [(20, 0), (30, 3)], 120)
    _write_frame(root, "000001", 420.0, 7.0, [(25, -4)], 110)
    _write_frame(root, "000002", 420.0, 7.0, [(18, 2)], 130)
    _write_frame(root, "000010", 460.0, 7.05, [], 90)  # background (empty)
    _write_frame(root, "000011", 460.0, 7.05, [(22, 1)], 95)
    sets = os.path.join(root, "ImageSets")
    with open(os.path.join(sets, "train_dair.txt"), "w") as f:
        f.write("000000\n000001\n000002\n")
    with open(os.path.join(sets, "val_dair.txt"), "w") as f:
        f.write("000002\n")
    with open(os.path.join(sets, "unlabeled_data.txt"), "w") as f:
        f.write("000010\n000011\n")
    with open(os.path.join(root, "map_token2id.json"), "w") as f:
        json.dump({f"tok{i}": f"{i:06d}" for i in range(12)}, f)
    return root


def test_homography_identity():
    img = np.arange(48, dtype=np.float64).reshape(4, 4, 3)
    out = utils.transform_with_M_bilinear(img, np.eye(3))
    np.testing.assert_allclose(out[:3, :3], img[:3, :3], atol=1e-6)


def test_box_mask_predictor():
    img = np.zeros((50, 80, 3))
    mask = BoxMaskPredictor(inset=0.0)(
        img, np.array([[10, 10, 30, 30], [20, 20, 50, 40]]), [6, 2])
    assert mask.shape == (50, 80, 1)
    assert mask[15, 15, 0] == 6
    assert mask[35, 45, 0] == 2
    # first-written wins in the overlap
    assert mask[25, 25, 0] == 6
    assert mask[0, 0, 0] == 0


def test_annos_roundtrip_cam_ego(tmp_path):
    root = _fake_kitti_root(tmp_path)
    sample = utils.load_sample(root, "training", "000000")
    assert len(sample["annos_ego"]) == 2
    a = sample["annos_ego"][0]
    # ego-frame location close to the gt (20, 0, ~0.75 center)
    np.testing.assert_allclose(a["loc"][:2], [20, 0], atol=0.1)
    assert 6.5 < sample["height"] < 7.5
    sample = utils.update_bbox_info(sample)
    for a in sample["annos_ego"]:
        x0, y0, x1, y1 = a["bbox"]
        assert x1 > x0 and y1 > y0


def test_run_ssdg_end_to_end(tmp_path):
    root = _fake_kitti_root(tmp_path)
    dest = str(tmp_path / "rope3d-kitti-gen")
    generated = run_ssdg(root, dest, pred_root=root, num_frames=2,
                         background_threshold=5, seed=0)
    # masks generated for the labeled frames
    assert os.path.exists(
        os.path.join(dest, "training/mask_image/000000.npy"))
    mask = np.load(os.path.join(dest, "training/mask_image/000000.npy"))
    assert mask.max() == 6 * 40  # car id x40 encoding
    # recombined frames with ids >= 100000
    assert len(generated) >= 1
    gen_id = generated[0]
    assert int(gen_id) >= 100000
    for sub in ("image_2/" + gen_id + ".jpg", "label_2/" + gen_id + ".txt",
                "calib/" + gen_id + ".txt", "denorm/" + gen_id + ".txt",
                "mask_image/" + gen_id + ".npy"):
        assert os.path.exists(os.path.join(dest, "training", sub)), sub
    # the composited label parses as KITTI and contains cars
    from sgv3d_tpu.evalkit.kitti_common import get_label_anno
    anno = get_label_anno(
        os.path.join(dest, "training/label_2", gen_id + ".txt"))
    assert len(anno["name"]) >= 1
    assert all(n == "Car" for n in anno["name"])
    assert np.isfinite(anno["location"]).all()
    # split file written, generated ids first
    ssdg_split = open(
        os.path.join(dest, "ImageSets/train_ssdg.txt")).read().split()
    assert gen_id in ssdg_split and "000000" in ssdg_split
    # label_eval copied for evaluation
    assert os.path.exists(os.path.join(dest, "training/label_eval"))
