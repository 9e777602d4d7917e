"""Full-framework integration: fake on-disk dataset -> train -> checkpoint ->
resume -> evaluate -> KITTI AP artifact."""
import dataclasses
import os
import pickle

import numpy as np
import pytest
from PIL import Image

from sgv3d_tpu import geom, runner
from tests.tiny_configs import tiny_exp

H_IMG, W_IMG = 216, 384  # 4x smaller than tiny final_dim? keep simple: bigger


def _fake_root(tmp_path, n_frames=6):
    root = tmp_path / "rope3d-kitti"
    for sub in ("images", "training/mask_image", "training/calib",
                "training/label_eval"):
        (root / sub).mkdir(parents=True)
    rng = np.random.default_rng(0)
    infos = []
    cam_h = 6.0
    cam2ego_rot = (np.array([[0, 0, 1], [-1, 0, 0], [0, -1, 0]], float)
                   @ geom.rodrigues(np.array([0.15, 0, 0])).T)
    K = np.array([[400.0, 0, 192], [0, 400.0, 108], [0, 0, 1]])
    s2e = np.eye(4)
    s2e[:3, :3] = cam2ego_rot
    s2e[:3, 3] = [0, 0, cam_h]
    velo2cam = np.linalg.inv(s2e)
    for i in range(n_frames):
        img = (rng.random((H_IMG, W_IMG, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(root / "images" / f"{i:06d}.jpg")
        mask = (rng.integers(0, 4, (H_IMG, W_IMG, 3)) * 40).astype(np.uint8)
        np.save(root / "training/mask_image" / f"{i:06d}.npy", mask)
        with open(root / "training/calib" / f"{i:06d}.txt", "w") as f:
            f.write("P2: 400 0 192 0 0 400 108 0 0 0 1 0\n")
            row = velo2cam[:3].reshape(-1)
            f.write("Tr_velo_to_cam: " + " ".join(f"{v}" for v in row) + "\n")
        gt_lines = []
        anns = []
        for _ in range(3):
            x, y = rng.uniform(6, 20), rng.uniform(-8, 8)
            anns.append(dict(
                category_name="vehicle.car",
                translation=[x, y, 0.8],
                size=[1.9, 4.5, 1.6], rotation=[1.0, 0, 0, 0],
                velocity=[0, 0, 0], num_lidar_pts=5, num_radar_pts=0))
            cam = velo2cam @ np.array([x, y, 0.0, 1.0])
            gt_lines.append(
                f"Car 0 0 0.5 100 100 200 200 1.6 1.9 4.5 "
                f"{cam[0]:.4f} {cam[1]:.4f} {cam[2]:.4f} {np.pi/2:.4f}")
        with open(root / "training/label_eval" / f"{i:06d}.txt", "w") as f:
            f.write("\n".join(gt_lines) + "\n")
        infos.append(dict(
            sample_token=f"{i:06d}", scene_token="s0",
            cam_infos={"CAM_FRONT": dict(
                filename=f"images/{i:06d}.jpg",
                calibrated_sensor=dict(
                    rotation_matrix=cam2ego_rot.tolist(),
                    translation=[0.0, 0.0, cam_h],
                    camera_intrinsic=K.tolist()),
                ego_pose=dict(rotation=[1.0, 0, 0, 0],
                              translation=[0.0, 0.0, 0.0]),
                timestamp=0)},
            sweeps=[], ann_infos=anns))
    for name in ("rope3d_12hz_infos_train_dair.pkl",
                 "rope3d_12hz_infos_val_dair.pkl"):
        with open(root / name, "wb") as f:
            pickle.dump(infos, f)
    return str(root)


@pytest.mark.slow
def test_train_resume_evaluate(tmp_path):
    root = _fake_root(tmp_path)
    cfg = tiny_exp(is_bsm=True)
    cfg = dataclasses.replace(
        cfg,
        backbone=dataclasses.replace(cfg.backbone, final_dim=(64, 96)),
        batch_size_per_device=2, data_root=root, src_hw=(H_IMG, W_IMG))
    out_dir = str(tmp_path / "outputs")

    state = runner.train(cfg, data_root=root, output_dir=out_dir, max_steps=2,
                         ckpt_every_epochs=1, num_devices=2)
    assert int(state.step) == 2
    assert os.path.exists(os.path.join(out_dir, "metrics.jsonl"))
    # resume continues from the checkpoint
    state2 = runner.train(cfg, data_root=root, output_dir=out_dir, max_steps=4,
                          ckpt_every_epochs=1, num_devices=2)
    assert int(state2.step) == 4

    result = runner.evaluate(cfg, data_root=root, output_dir=out_dir,
                             state=state2, num_devices=2)
    assert result is not None

    # reference -e semantics: a ckpt_path dir is evaluated per checkpoint
    ckpt_dir = os.path.join(out_dir, "checkpoints")
    from sgv3d_tpu.train.checkpoint import CheckpointManager
    assert len(CheckpointManager(ckpt_dir).all_steps()) >= 2
    res2 = runner.evaluate(cfg, data_root=root, output_dir=out_dir,
                           ckpt_path=ckpt_dir, num_devices=2, max_batches=1)
    assert res2 is not None
    mAP, ret = result
    assert "KITTI/Car_3D_moderate_strict" in ret
    r40_dir = os.path.join(out_dir, "metrics", "R40")
    assert len(os.listdir(r40_dir)) >= 1
    # untrained model on random images: AP is a finite number (usually 0)
    assert np.isfinite(mAP)


def test_evaluate_from_msgpack_file(tmp_path):
    """-e accepts a converter-format msgpack FILE as --ckpt_path."""
    import jax
    import jax.numpy as jnp
    from flax.serialization import msgpack_serialize

    from sgv3d_tpu.data.synthetic import make_batch
    from sgv3d_tpu.models.bev_height import BEVHeight

    root = _fake_root(tmp_path)
    cfg = tiny_exp(is_bsm=False)
    cfg = dataclasses.replace(
        cfg,
        backbone=dataclasses.replace(cfg.backbone, final_dim=(64, 96)),
        batch_size_per_device=2, data_root=root, src_hw=(H_IMG, W_IMG),
        is_train_height=False)

    imgs, mats, *_ = make_batch(cfg, batch=1, num_objs=1)
    model = BEVHeight(cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(imgs), {k: jnp.asarray(v) for k, v in mats.items()},
        False)
    path = tmp_path / "converted.msgpack"
    with open(path, "wb") as f:
        f.write(msgpack_serialize(
            jax.tree_util.tree_map(np.asarray, dict(variables))))

    out_dir = str(tmp_path / "outputs")
    res = runner.evaluate(cfg, ckpt_path=str(path), data_root=root,
                          output_dir=out_dir, num_devices=2, max_batches=1)
    assert res is not None and np.isfinite(res[0])
