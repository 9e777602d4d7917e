"""End-to-end torch<->jax parity: the full BEVHeight pipeline
(backbone -> HeightNet(+DCN) -> geometry lift -> voxel pooling -> BEV head ->
decode -> circle NMS -> KITTI writer) against an independent pure-torch
oracle (tests/torch_oracle.py), through the weight converter.

This is the north-star proof (SURVEY.md §6): the two stacks must produce the
same KITTI label lines for the same weights and inputs.
"""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
sys.path.insert(0, os.path.dirname(__file__))

from convert_weights import convert_state_dict  # noqa: E402
from torch_oracle import (  # noqa: E402
    TorchBEVHeight, TorchBSMBEVHeight, numpy_decode, randomize_params)

from sgv3d_tpu.config import BackboneConfig, ExpConfig, HeadConfig, Task
from sgv3d_tpu.data.synthetic import make_batch
from sgv3d_tpu.decode import decode
from sgv3d_tpu.evalkit.evaluator import format_results
from sgv3d_tpu.evalkit.kitti_writer import result2kitti
from sgv3d_tpu.models.bev_height import BEVHeight


def _e2e_cfg(is_bsm: bool):
    backbone = BackboneConfig(
        x_bound=(0.0, 25.6, 0.4), y_bound=(-12.8, 12.8, 0.4),
        z_bound=(-5.0, 3.0, 8.0), d_bound=(-2.0, 0.0, 8),
        final_dim=(64, 96), output_channels=16, downsample_factor=16,
        resnet_depth=18, img_neck_out_channels=(8, 8, 8, 8),
        height_net_mid_channels=(32, 16), semantic_channels=4, is_bsm=is_bsm)
    head = HeadConfig(
        tasks=(Task(("car",)), Task(("pedestrian", "cyclist"))),
        # BSM BEV features carry context + semantic channels (16 + 4).
        bev_backbone_in_channels=20 if is_bsm else 16,
        bev_backbone_base_channels=16,
        bev_neck_out_channels=(8, 8, 8, 8), share_conv_channels=16,
        point_cloud_range=(0, -12.8, -5, 25.6, 12.8, 3),
        grid_size=(64, 64, 1), voxel_size=(0.4, 0.4, 8), max_objs=8,
        max_per_task=16, post_max_size=8, nms_min_radius=(0.8, 0.4),
        # BSM's suppression zeroes most BEV cells, so the map's constant
        # border regions produce periodic candidates whose scores agree
        # between the stacks to ~1e-7 but order differently at the top-k
        # cutoff (a true near-tie, not a parity bug — verified value-level
        # agreement). A threshold above that ~0.54 plateau keeps the
        # compared sets well-separated in score.
        score_threshold=0.6 if is_bsm else 0.1)
    return ExpConfig(name="e2e_parity", backbone=backbone, head=head,
                     classes=("car", "pedestrian", "cyclist"))


@pytest.fixture(scope="module", params=[False, True],
                ids=["bevheight", "bsm"])
def parity_setup(request):
    """Oracle + converted flax model for both families: BEVHeight (non-BSM)
    and the flagship BSM/SGV3D graph (MSCThead, TaskFPN+SABlock fusion,
    stride-8 lift, semantic>0.45 suppression)."""
    is_bsm = request.param
    cfg = _e2e_cfg(is_bsm)
    imgs, mats, *_ = make_batch(cfg, batch=2, num_objs=4, seed=11)

    oracle_cls = TorchBSMBEVHeight if is_bsm else TorchBEVHeight
    tm = oracle_cls(cfg).eval()
    # The MSCThead stack is much deeper than HeightNet; scale-0.2 random
    # weights decay its activations to a flat heatmap (nothing but exact-tie
    # border candidates). Scale 1.15 keeps distinct data-driven peaks with
    # adjacent top-k scores separated by >2e-6 (measured), far above the
    # ~2e-8 cross-stack numerical noise, so ranking is well-defined.
    randomize_params(tm, seed=7, scale=1.15 if is_bsm else 0.2)

    model = BEVHeight(cfg)  # fp32
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(imgs), {k: jnp.asarray(v) for k, v in mats.items()},
        False)

    sd = {"model." + k: v.numpy() for k, v in tm.state_dict().items()
          if "num_batches_tracked" not in k}
    new_vars, used, missing = convert_state_dict(
        sd, dict(variables), strict=False, is_bsm=is_bsm)
    # Every unmapped flax path must be a bias the reference module does not
    # have (ConvModule/DCN/SABlock bias=False) and must sit at its zero init,
    # so the two graphs are numerically identical.
    for path in missing:
        assert path[-1] == "bias", path
        node = new_vars[path[0]]
        for name in path[1:]:
            node = node[name]
        assert np.all(np.asarray(node) == 0.0), path
    # The only torch keys a BSM conversion may leave unused are the dead
    # depth_head0 decoder weights (never run in the reference forward).
    unused = {k for k in sd if k not in used
              and "num_batches_tracked" not in k}
    allowed = {k for k in unused if ".height_net.depth_head0." in k}
    assert unused == allowed, unused - allowed
    return cfg, imgs, mats, tm, model, new_vars


def _torch_preds(tm, imgs, mats):
    with torch.no_grad():
        x = torch.tensor(
            imgs[:, 0, 0].transpose(0, 3, 1, 2).copy(), dtype=torch.float32)
        return tm(x, mats)


def _jax_preds(model, new_vars, imgs, mats):
    preds, _ = model.apply(new_vars, jnp.asarray(imgs),
                           {k: jnp.asarray(v) for k, v in mats.items()},
                           False)
    return preds


def test_head_outputs_match(parity_setup):
    """Raw task-head tensors (pre-decode) agree between the stacks."""
    cfg, imgs, mats, tm, model, new_vars = parity_setup
    tpreds = _torch_preds(tm, imgs, mats)
    jpreds = _jax_preds(model, new_vars, imgs, mats)
    for ti in range(len(cfg.head.tasks)):
        for name in ("heatmap", "reg", "height", "dim", "rot", "vel"):
            ref = np.asarray(tpreds[ti][name])          # NCHW
            got = np.asarray(jpreds[ti][name]).transpose(0, 3, 1, 2)
            np.testing.assert_allclose(
                got, ref, rtol=2e-3, atol=2e-3,
                err_msg=f"task{ti}.{name}")


def test_decoded_boxes_match(parity_setup):
    cfg, imgs, mats, tm, model, new_vars = parity_setup
    tdets = numpy_decode(cfg.head, _torch_preds(tm, imgs, mats))
    jdets = decode(cfg.head, _jax_preds(model, new_vars, imgs, mats))
    total = 0
    for bi, (tboxes, tscores, tlabels) in enumerate(tdets):
        v = np.asarray(jdets.valid[bi])
        jboxes = np.asarray(jdets.boxes[bi])[v]
        jscores = np.asarray(jdets.scores[bi])[v]
        jlabels = np.asarray(jdets.labels[bi])[v]
        assert len(jboxes) == len(tboxes), (bi, len(jboxes), len(tboxes))
        total += len(tboxes)
        np.testing.assert_array_equal(jlabels, tlabels)
        np.testing.assert_allclose(jscores, tscores, rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(jboxes, tboxes, rtol=2e-3, atol=2e-3)
    assert total > 0, "parity test decoded zero boxes - not meaningful"


def test_kitti_txt_lines_match(parity_setup, tmp_path):
    """Both stacks write the same KITTI label lines (class, count, order;
    floats to ~the 4-decimal rounding)."""
    cfg, imgs, mats, tm, model, new_vars = parity_setup
    tdets = numpy_decode(cfg.head, _torch_preds(tm, imgs, mats))
    jdets = decode(cfg.head, _jax_preds(model, new_vars, imgs, mats))
    jlist = []
    for bi in range(len(tdets)):
        v = np.asarray(jdets.valid[bi])
        jlist.append((np.asarray(jdets.boxes[bi])[v],
                      np.asarray(jdets.scores[bi])[v],
                      np.asarray(jdets.labels[bi])[v]))

    img_metas = [{"token": f"{i:06d}"} for i in range(len(tdets))]

    def provider(token):
        i = int(token)
        velo2cam = np.linalg.inv(
            np.asarray(mats["sensor2ego_mats"][i, 0, 0], np.float64))
        K = np.asarray(mats["intrin_mats"][i, 0, 0], np.float64)
        intrinsic34 = np.concatenate([K[:3, :3], np.zeros((3, 1))], axis=1)
        return i, velo2cam, intrinsic34

    dirs = {}
    for tag, dets in (("torch", tdets), ("jax", jlist)):
        results = format_results(dets, img_metas, cfg.classes)
        out = tmp_path / tag
        dirs[tag] = result2kitti(results, str(out), provider,
                                 score_threshold=0.1)

    total_lines = 0
    for i in range(len(tdets)):
        fn = f"{i:06d}.txt"
        with open(os.path.join(dirs["torch"], fn)) as f:
            tlines = [l.split() for l in f.read().splitlines()]
        with open(os.path.join(dirs["jax"], fn)) as f:
            jlines = [l.split() for l in f.read().splitlines()]
        assert len(tlines) == len(jlines), fn
        total_lines += len(tlines)
        for tl, jl in zip(tlines, jlines):
            assert tl[0] == jl[0], (fn, tl, jl)  # class
            tv = np.array([float(v) for v in tl[3:]])
            jv = np.array([float(v) for v in jl[3:]])
            np.testing.assert_allclose(jv, tv, rtol=2e-3, atol=2e-3,
                                       err_msg=f"{fn}: {tl} vs {jl}")
    assert total_lines > 0, "no KITTI lines written - not meaningful"


@pytest.mark.slow
def test_parity_full_machinery_smoke(tmp_path):
    """tools/parity_full.py end-to-end at PRODUCTION channel widths (r101 /
    BSM mid-(512,256)) on a reduced input — keeps the recorded PARITY.json
    machinery runnable. The real artifact run uses 864x1536 (see
    PARITY.json at the repo root)."""
    import parity_full

    for exp in ("bevheight_dair_r101_128", "sgv3d_r50_128"):
        rep = parity_full.run_family(exp, str(tmp_path), seed=3,
                                     final_dim=(128, 256), gain=0.8)
        ctx = {k: rep[k] for k in
               ("exp", "head_ok", "boxes_ok", "lines_ok",
                "head_max_rel_delta", "boxes", "kitti_lines")}
        # At smoke scale the random-weight clutter has EXACT score ties at
        # the max_per_task cut, so the kept sets themselves can differ by a
        # tie choice (verified: sorted scores agree to 1e-7 while one of
        # 444 boxes has no positional counterpart). Assert the stable
        # invariants — tight heads, equal counts, equal score multisets,
        # <=2 tie-cut members unmatched; the recorded 864x1536 PARITY.json
        # run holds the strict zero-unmatched bars.
        assert rep["head_ok"], ctx
        assert rep["boxes"]["torch_count"] == rep["boxes"]["jax_count"], ctx
        assert rep["boxes"]["torch_count"] > 0, ctx  # 0==0 would hide a
        # dead decoder (and max_score_delta is None with no boxes)
        assert rep["boxes"]["max_score_delta"] < 1e-4, ctx
        assert rep["boxes"]["set_match"]["unmatched"] <= 2, ctx
        assert rep["kitti_lines"]["torch"] == rep["kitti_lines"]["jax"], ctx
        assert rep["kitti_lines"]["set_match"]["unmatched"] <= 2, ctx
