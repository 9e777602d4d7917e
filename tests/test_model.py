"""End-to-end model tests on tiny configs: forward shapes, loss, grads."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgv3d_tpu.data.synthetic import make_batch
from sgv3d_tpu.decode import decode
from sgv3d_tpu.models.bev_height import BEVHeight, train_loss
from tests.tiny_configs import tiny_exp


def _init_model(cfg, imgs, mats, train):
    model = BEVHeight(cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(imgs), {k: jnp.asarray(v) for k, v in mats.items()}, train)
    return model, variables


@pytest.mark.parametrize("is_bsm", [False, True])
def test_forward_shapes(is_bsm):
    cfg = tiny_exp(is_bsm)
    imgs, mats, *_ = make_batch(cfg, batch=2, num_objs=4)
    model, variables = _init_model(cfg, imgs, mats, False)
    preds, aux = model.apply(
        variables, jnp.asarray(imgs),
        {k: jnp.asarray(v) for k, v in mats.items()}, False)
    w, h = cfg.head.feature_map_size
    assert len(preds) == 2
    assert preds[0]["heatmap"].shape == (2, h, w, 1)
    assert preds[1]["heatmap"].shape == (2, h, w, 2)
    assert preds[0]["reg"].shape == (2, h, w, 2)
    assert preds[0]["dim"].shape == (2, h, w, 3)
    if is_bsm:
        sem0, sem1 = aux
        fh, fw = cfg.backbone.final_dim
        assert sem0.shape == (2, fh // 16, fw // 16, cfg.backbone.semantic_channels)
        assert sem1.shape == (2, fh // 8, fw // 8, cfg.backbone.semantic_channels)
    for p in preds:
        for v in p.values():
            assert np.all(np.isfinite(np.asarray(v)))


@pytest.mark.parametrize("is_bsm", [
    pytest.param(False, marks=pytest.mark.slow),  # 59 s; BSM variant (20 s)
    True])  # stays in the fast lane for train-grads coverage
def test_train_loss_and_grads(is_bsm):
    cfg = tiny_exp(is_bsm)
    imgs, mats, gt_boxes, gt_labels, gt_semantic = make_batch(
        cfg, batch=1, num_objs=3)
    model, variables = _init_model(cfg, imgs, mats, True)
    params = variables["params"]
    other = {k: v for k, v in variables.items() if k != "params"}
    jmats = {k: jnp.asarray(v) for k, v in mats.items()}

    def loss_fn(p):
        (preds, aux), _ = model.apply(
            {"params": p, **other}, jnp.asarray(imgs), jmats, True,
            rngs={"dropout": jax.random.PRNGKey(2)},
            mutable=["batch_stats"])
        loss, metrics = train_loss(
            cfg, preds, aux, jnp.asarray(gt_boxes), jnp.asarray(gt_labels),
            jnp.asarray(gt_semantic) if is_bsm else None)
        return loss, metrics

    (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(loss))
    assert float(loss) > 0
    if is_bsm:
        assert "semantic_loss" in metrics
    # Gradients reach the image backbone and the head.
    leaves = jax.tree_util.tree_leaves(grads)
    norms = [float(jnp.abs(g).sum()) for g in leaves]
    assert sum(n > 0 for n in norms) > len(norms) * 0.5, "too many zero grads"
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    bb = [jnp.abs(v).sum() for p, v in flat if "img_backbone" in str(p)]
    hd = [jnp.abs(v).sum() for p, v in flat if "task0_heatmap" in str(p)]
    assert sum(map(float, bb)) > 0
    assert sum(map(float, hd)) > 0


def test_train_lift_top_k_knob():
    """Opt-in top-k TRAINING lift: k=D is numerically the exact lift (same
    loss and grads up to float summation order), and k<D still trains — loss
    finite, gradients flow to the backbone and to the height net (the
    selected bins' heights are differentiable through lax.top_k)."""
    import dataclasses
    cfg = tiny_exp(False)
    imgs, mats, gt_boxes, gt_labels, _ = make_batch(cfg, batch=1, num_objs=3)
    model, variables = _init_model(cfg, imgs, mats, True)
    params = variables["params"]
    other = {k: v for k, v in variables.items() if k != "params"}
    jmats = {k: jnp.asarray(v) for k, v in mats.items()}

    def loss_and_grads(c):
        m = BEVHeight(c)

        def loss_fn(p):
            (preds, aux), _ = m.apply(
                {"params": p, **other}, jnp.asarray(imgs), jmats, True,
                rngs={"dropout": jax.random.PRNGKey(2)},
                mutable=["batch_stats"])
            loss, _ = train_loss(c, preds, aux, jnp.asarray(gt_boxes),
                                 jnp.asarray(gt_labels), None)
            return loss
        return jax.value_and_grad(loss_fn)(params)

    def with_k(k):
        return dataclasses.replace(cfg, backbone=dataclasses.replace(
            cfg.backbone, train_lift_top_k=k))

    loss_exact, g_exact = loss_and_grads(cfg)
    d = cfg.backbone.num_height_bins
    loss_full, g_full = loss_and_grads(with_k(d))  # k = D: exact, new layout
    np.testing.assert_allclose(float(loss_full), float(loss_exact), rtol=1e-5)
    for pe, pf in zip(jax.tree_util.tree_leaves(g_exact),
                      jax.tree_util.tree_leaves(g_full)):
        np.testing.assert_allclose(np.asarray(pf), np.asarray(pe),
                                   rtol=2e-4, atol=1e-6)

    loss_k, g_k = loss_and_grads(with_k(d // 2))
    assert np.isfinite(float(loss_k)) and float(loss_k) > 0
    flat = jax.tree_util.tree_flatten_with_path(g_k)[0]
    bb = sum(float(jnp.abs(v).sum()) for p, v in flat
             if "img_backbone" in str(p))
    hn = sum(float(jnp.abs(v).sum()) for p, v in flat
             if "height_net" in str(p))
    assert bb > 0 and hn > 0


def test_train_lift_top_k_bsm_trains():
    """The opt-in top-k training lift also compiles and trains on the BSM
    (SGV3D) path — finite loss, gradients reach the MSCThead height net."""
    import dataclasses
    cfg = tiny_exp(True)
    cfg = dataclasses.replace(cfg, backbone=dataclasses.replace(
        cfg.backbone, train_lift_top_k=cfg.backbone.num_height_bins // 2))
    imgs, mats, gt_boxes, gt_labels, gt_semantic = make_batch(
        cfg, batch=1, num_objs=3)
    model, variables = _init_model(cfg, imgs, mats, True)
    params = variables["params"]
    other = {k: v for k, v in variables.items() if k != "params"}
    jmats = {k: jnp.asarray(v) for k, v in mats.items()}

    def loss_fn(p):
        (preds, aux), _ = model.apply(
            {"params": p, **other}, jnp.asarray(imgs), jmats, True,
            rngs={"dropout": jax.random.PRNGKey(2)},
            mutable=["batch_stats"])
        loss, _ = train_loss(cfg, preds, aux, jnp.asarray(gt_boxes),
                             jnp.asarray(gt_labels), jnp.asarray(gt_semantic))
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss)) and float(loss) > 0
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    hn = sum(float(jnp.abs(v).sum()) for p, v in flat
             if "height_net" in str(p))
    assert hn > 0


def test_eval_path_decodes():
    cfg = tiny_exp(False)
    imgs, mats, *_ = make_batch(cfg, batch=1, num_objs=3)
    model, variables = _init_model(cfg, imgs, mats, False)
    preds, _ = model.apply(
        variables, jnp.asarray(imgs),
        {k: jnp.asarray(v) for k, v in mats.items()}, False)
    dets = decode(cfg.head, preds)
    assert dets.boxes.shape == (1, 2 * cfg.head.post_max_size, 9)
    assert np.all(np.isfinite(np.asarray(dets.boxes)))


def test_multi_sweep_forward():
    """num_sweeps=2: past sweep concatenated on channels, key frame grads only."""
    import dataclasses
    cfg = tiny_exp(False)
    # head must accept doubled BEV channels
    cfg = dataclasses.replace(
        cfg, head=dataclasses.replace(cfg.head, bev_backbone_in_channels=32))
    imgs, mats, *_ = make_batch(cfg, batch=1, num_objs=2)
    imgs2 = np.concatenate([imgs, imgs], axis=1)           # (B, 2, N, H, W, 3)
    mats2 = {k: (np.concatenate([v, v], axis=1)
                 if k not in ("bda_mat",) else v) for k, v in mats.items()}
    model = BEVHeight(cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(imgs2), {k: jnp.asarray(v) for k, v in mats2.items()},
        False)
    preds, _ = model.apply(
        variables, jnp.asarray(imgs2),
        {k: jnp.asarray(v) for k, v in mats2.items()}, False)
    assert np.isfinite(np.asarray(preds[0]["heatmap"])).all()


def test_predictor_api_nchw():
    """Drop-in predictor accepts reference-convention NCHW images."""
    from sgv3d_tpu.api import BEVHeightPredictor
    cfg = tiny_exp(False)
    imgs, mats, *_ = make_batch(cfg, batch=2, num_objs=2)
    model, variables = _init_model(cfg, imgs, mats, False)
    predictor = BEVHeightPredictor(cfg, variables, use_bf16=False)
    nchw = np.transpose(imgs, (0, 1, 2, 5, 3, 4))
    results = predictor(nchw, mats)
    assert len(results) == 2
    boxes, scores, labels = results[0]
    assert boxes.ndim == 2 and boxes.shape[1] == 9
    assert scores.shape == labels.shape
    # NHWC input gives the same output
    results2 = predictor(imgs, mats)
    np.testing.assert_allclose(results2[0][0], boxes, atol=1e-5)


def test_predictor_stream_matches_sequential():
    """Pipelined stream() yields identical results to per-batch __call__."""
    from sgv3d_tpu.api import BEVHeightPredictor
    cfg = tiny_exp(False)
    imgs, mats, *_ = make_batch(cfg, batch=2, num_objs=2)
    model, variables = _init_model(cfg, imgs, mats, False)
    predictor = BEVHeightPredictor(cfg, variables, use_bf16=False)
    batches = [(imgs, mats), (imgs[::-1], mats), (imgs, mats)]
    streamed = list(predictor.stream(iter(batches)))
    assert len(streamed) == 3
    for (bi, bm), out in zip(batches, streamed):
        ref = predictor(bi, bm)
        assert len(out) == len(ref)
        for (b1, s1, l1), (b2, s2, l2) in zip(out, ref):
            np.testing.assert_allclose(b1, b2, atol=1e-5)
            np.testing.assert_allclose(s1, s2, atol=1e-6)
            np.testing.assert_array_equal(l1, l2)


def test_predictor_static_rig_matches():
    """static_rig geometry caching is exact: same boxes, and the cached cells
    are recomputed only when the calibration changes."""
    from sgv3d_tpu.api import BEVHeightPredictor
    import dataclasses
    cfg = tiny_exp(False)
    # exercise the top-k path too (cells layout (BN, HW, D))
    cfg = dataclasses.replace(
        cfg, backbone=dataclasses.replace(cfg.backbone, lift_top_k=4))
    imgs, mats, *_ = make_batch(cfg, batch=2, num_objs=2)
    model, variables = _init_model(cfg, imgs, mats, False)
    plain = BEVHeightPredictor(cfg, variables, use_bf16=False,
                               static_rig=False)
    rig = BEVHeightPredictor(cfg, variables, use_bf16=False, static_rig=True)
    r1 = plain(imgs, mats)
    r2 = rig(imgs, mats)
    np.testing.assert_allclose(r2[0][0], r1[0][0], atol=1e-5)
    key1 = rig._cells_key
    rig(imgs, mats)
    assert rig._cells_key is key1  # cache hit (no recompute)
    mats2 = dict(mats)
    ida = np.array(mats["ida_mats"]).copy()
    ida[..., 0, 0] *= 1.1
    mats2["ida_mats"] = ida
    rig(imgs, mats2)
    key2 = rig._cells_key
    assert key2 != key1  # calib change invalidates
    # bda_mat feeds compute_lift_cells too (nn/lss_fpn.py:66) — a BEV-aug
    # change must also invalidate, with fixed camera calibration.
    mats3 = dict(mats2)
    bda = np.array(mats["bda_mat"]).copy()
    bda[:, 0, 0] *= -1.0  # BEV x-flip
    mats3["bda_mat"] = bda
    r_flip = rig(imgs, mats3)
    assert rig._cells_key != key2
    plain_flip = plain(imgs, mats3)
    np.testing.assert_allclose(r_flip[0][0], plain_flip[0][0], atol=1e-5)


def test_predictor_multichip_dp_matches():
    """Multi-chip serving: a data-sharded predictor on the 8-device virtual
    mesh (and a hybrid (data, bev) 2-D mesh) returns the same detections as
    the single-device predictor for the same weights and batch."""
    import dataclasses

    from sgv3d_tpu.api import BEVHeightPredictor
    from sgv3d_tpu.train.sharding import make_mesh

    cfg = tiny_exp(False)
    cfg = dataclasses.replace(
        cfg, backbone=dataclasses.replace(cfg.backbone, lift_top_k=4))
    imgs, mats, *_ = make_batch(cfg, batch=8, num_objs=2)
    model, variables = _init_model(cfg, imgs, mats, False)
    single = BEVHeightPredictor(cfg, variables, use_bf16=False)
    ref = single(imgs, mats)
    for mesh in (make_mesh(8), make_mesh(8, bev_parallel=2)):
        sharded = BEVHeightPredictor(cfg, variables, use_bf16=False,
                                     mesh=mesh)
        got = sharded(imgs, mats)
        assert len(got) == len(ref) == 8
        for (b1, s1, l1), (b2, s2, l2) in zip(got, ref):
            np.testing.assert_allclose(b1, b2, atol=1e-4)
            np.testing.assert_allclose(s1, s2, atol=1e-5)
            np.testing.assert_array_equal(l1, l2)


def test_bf16_head_close_and_param_compatible():
    """Opt-in bf16 BEV-head compute: same param tree as the fp32 head (dtype
    only changes compute, params stay fp32 — converted checkpoints load
    unchanged), fp32 outputs, and decoded boxes close to the fp32 head."""
    import dataclasses

    from flax.traverse_util import flatten_dict

    cfg = tiny_exp(False)
    cfg = dataclasses.replace(
        cfg, backbone=dataclasses.replace(cfg.backbone, lift_top_k=4))
    imgs, mats, *_ = make_batch(cfg, batch=1, num_objs=3)
    model, variables = _init_model(cfg, imgs, mats, False)
    jmats = {k: jnp.asarray(v) for k, v in mats.items()}
    model16 = BEVHeight(cfg, head_dtype=jnp.bfloat16)
    v16 = model16.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(imgs), jmats, False)
    flat, flat16 = (sorted(flatten_dict(v["params"]).items())
                    for v in (variables, v16))
    assert [k for k, _ in flat] == [k for k, _ in flat16]
    assert all(v.dtype == v2.dtype and v.shape == v2.shape
               for (_, v), (_, v2) in zip(flat, flat16))
    preds, _ = model16.apply(variables, jnp.asarray(imgs), jmats, False)
    assert preds[0]["heatmap"].dtype == jnp.float32
    preds32, _ = model.apply(variables, jnp.asarray(imgs), jmats, False)
    for p16, p32 in zip(preds, preds32):
        for k in p32:
            np.testing.assert_allclose(
                np.asarray(p16[k]), np.asarray(p32[k]), atol=0.15, rtol=0.1)


@pytest.mark.slow
def test_topk_lift_near_exact_after_training():
    """Deploy-default proof (VERDICT r1 #2): after training, the DID height
    softmax concentrates, so pooling only the top-k bins per pixel at
    inference is near-exact — decoded boxes match the exact lift.

    Trains a tiny BEVHeight to overfit one batch, then compares eval-mode
    outputs of the exact lift vs lift_top_k (k/D = 4/8; the briefly-trained toy's
    softmax is far flatter than a converged production model's,
    where 16/90 captures ~all mass)."""
    import dataclasses

    from sgv3d_tpu.train import (create_train_state, make_mesh,
                                 make_optimizer, make_train_step, shard_batch)

    cfg = tiny_exp(False)
    assert cfg.backbone.lift_top_k is None
    imgs, mats, gt_boxes, gt_labels, gt_semantic = make_batch(
        cfg, batch=2, num_objs=4, seed=3)
    mesh = make_mesh(1)
    model = BEVHeight(cfg)
    tx, _ = make_optimizer(cfg, 1, steps_per_epoch=10)
    state = create_train_state(model, cfg, tx, (imgs[:1], mats))
    step = make_train_step(model, cfg, tx, mesh=mesh, donate=False)
    batch = shard_batch(mesh, (jnp.asarray(imgs), {
        k: jnp.asarray(v) for k, v in mats.items()},
        jnp.asarray(gt_boxes), jnp.asarray(gt_labels),
        jnp.asarray(gt_semantic)))
    first = last = None
    for i in range(100):
        state, metrics = step(state, *batch)
        if i == 0:
            first = float(metrics["total_loss"])
    last = float(metrics["total_loss"])
    assert last < first, (first, last)

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    jmats = {k: jnp.asarray(v) for k, v in mats.items()}
    exact_preds, _ = model.apply(variables, jnp.asarray(imgs), jmats, False)

    # Self-calibrating k: production lift_top_k=16 of 90 keeps ~all softmax
    # mass on a converged model; the briefly-trained toy's softmax is far
    # flatter, so pick the smallest k whose top-k bins hold >= 97% of the
    # mass on average (keeps the approximation comparable, not harsher).
    from sgv3d_tpu.nn.lss_fpn import LSSFPN
    bb_vars = {"params": variables["params"]["backbone"],
               "batch_stats": variables["batch_stats"]["backbone"]}
    _, probe = LSSFPN(cfg.backbone).apply(
        bb_vars, jnp.asarray(imgs), jmats, False,
        capture_intermediates=lambda mdl, name: mdl.name == "height_net")
    h_logits = jax.tree_util.tree_leaves(
        probe["intermediates"]["height_net"]["__call__"])[0]
    probs = np.sort(np.asarray(
        jax.nn.softmax(h_logits.astype(jnp.float32), axis=-1)
    ).reshape(-1, cfg.backbone.num_height_bins), axis=-1)[:, ::-1]
    coverage = np.cumsum(probs, axis=-1).mean(axis=0)
    k = int(np.searchsorted(coverage, 0.97) + 1)
    k = min(max(k, 2), cfg.backbone.num_height_bins - 1)
    cfg_k = dataclasses.replace(
        cfg, backbone=dataclasses.replace(cfg.backbone, lift_top_k=k))
    model_k = BEVHeight(cfg_k)
    topk_preds, _ = model_k.apply(variables, jnp.asarray(imgs), jmats, False)

    # The trained softmax concentrates: the top-k bins hold most of the mass
    # wherever features actually land (heatmap peaks survive the truncation).
    exact = decode(cfg.head, exact_preds)
    topk = decode(cfg.head, topk_preds)
    # Set-based comparison of the detections that matter downstream (the
    # KITTI writer filters at score 0.45; we check everything above 0.3):
    # every confident exact detection must have a top-k twin with the same
    # label, a nearby center and a close score. Low-score tail detections may
    # flicker under truncation — they are below every reporting threshold.
    # 1) The lift approximation itself: BEV maps must agree closely. (On a
    # fully trained production model with k/D = 16/90 the error is far
    # smaller; this toy's softmax is much flatter.)
    bev_e = np.asarray(LSSFPN(cfg.backbone).apply(
        bb_vars, jnp.asarray(imgs), jmats, False)[0])
    bev_k = np.asarray(LSSFPN(cfg_k.backbone).apply(
        bb_vars, jnp.asarray(imgs), jmats, False)[0])
    rel = np.linalg.norm(bev_k - bev_e) / np.linalg.norm(bev_e)
    assert rel < 0.2, f"BEV relative error {rel:.3f}"

    # 2) Each sample's *confident* detections survive unchanged: same label,
    # same cell (within out_size_factor * voxel = 1.6 m), close score. The
    # toy's low-score tail (well below the 0.45 reporting threshold) is
    # chaotic under the k/D = 4/8 truncation, so only detections scoring
    # within 60% of the sample's best are required to match.
    def assert_confident_match(exact, approx, max_center=0.8, max_score=0.15):
        matched = 0
        for b in range(2):
            ve = np.asarray(exact.valid[b])
            be = np.asarray(exact.boxes[b])[ve]
            se = np.asarray(exact.scores[b])[ve]
            le = np.asarray(exact.labels[b])[ve]
            order = np.argsort(-se)[:3]
            top = [i for i in order if se[i] >= 0.6 * se[order[0]]]
            vk = np.asarray(approx.valid[b])
            bk = np.asarray(approx.boxes[b])[vk]
            sk = np.asarray(approx.scores[b])[vk]
            lk = np.asarray(approx.labels[b])[vk]
            for i in top:
                cand = np.where(lk == le[i])[0]
                assert len(cand), (b, i, le[i])
                d = np.linalg.norm(bk[cand, :2] - be[i, :2], axis=1)
                j = cand[np.argmin(d)]
                assert d.min() < max_center, (b, i, d.min())
                assert abs(sk[j] - se[i]) < max_score, (b, i, sk[j], se[i])
                matched += 1
        assert matched >= 2

    assert_confident_match(exact, topk)

    # The opt-in bf16 BEV head (api.BEVHeightPredictor(bf16_head=True)) is
    # held to the same bar on the trained toy: confident detections keep
    # their label, cell and score. (On random init top-k cell selection
    # flickers under bf16 noise because all scores tie near zero; after
    # training the heatmap peaks dominate.)
    bf16_preds, _ = BEVHeight(cfg, head_dtype=jnp.bfloat16).apply(
        variables, jnp.asarray(imgs), jmats, False)
    assert_confident_match(exact, decode(cfg.head, bf16_preds),
                           max_center=0.8, max_score=0.1)

    # Training mode ignores lift_top_k (gradients must reach all bins).
    t_exact, _ = model.apply(
        variables, jnp.asarray(imgs), jmats, True,
        rngs={"dropout": jax.random.PRNGKey(2)}, mutable=["batch_stats"])
    t_topk, _ = model_k.apply(
        variables, jnp.asarray(imgs), jmats, True,
        rngs={"dropout": jax.random.PRNGKey(2)}, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(t_topk[0][0]["heatmap"]),
                               np.asarray(t_exact[0][0]["heatmap"]),
                               atol=1e-6)


def test_remat_backbone_grads_match():
    """remat_backbone recomputes activations but must give identical loss
    and gradients to the stored-activation path."""
    import dataclasses

    from sgv3d_tpu.models.bev_height import train_loss

    cfg = tiny_exp(False)
    cfg_r = dataclasses.replace(
        cfg, backbone=dataclasses.replace(cfg.backbone, remat_backbone=True))
    imgs, mats, gt_boxes, gt_labels, gt_semantic = make_batch(
        cfg, batch=1, num_objs=2)
    jmats = {k: jnp.asarray(v) for k, v in mats.items()}
    model = BEVHeight(cfg)
    model_r = BEVHeight(cfg_r)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(imgs), jmats, True)

    def loss_of(mdl):
        def f(params):
            (preds, aux), _ = mdl.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                jnp.asarray(imgs), jmats, True,
                rngs={"dropout": jax.random.PRNGKey(2)},
                mutable=["batch_stats"])
            loss, _ = train_loss(cfg, preds, aux, jnp.asarray(gt_boxes),
                                 jnp.asarray(gt_labels), None, None)
            return loss
        return jax.value_and_grad(f)(variables["params"])

    l0, g0 = loss_of(model)
    l1, g1 = loss_of(model_r)
    # remat recomputes the forward, so XLA may fuse it differently — values
    # agree to recompute-roundoff (which amplifies through deep chains), so
    # check the loss tightly and the gradient direction/magnitude globally.
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-4)
    v0 = np.concatenate([np.asarray(g).ravel()
                         for g in jax.tree_util.tree_leaves(g0)])
    v1 = np.concatenate([np.asarray(g).ravel()
                         for g in jax.tree_util.tree_leaves(g1)])
    cos = float(v0 @ v1 / (np.linalg.norm(v0) * np.linalg.norm(v1)))
    assert cos > 0.99999, f"gradient direction diverged: cos={cos}"
    np.testing.assert_allclose(np.linalg.norm(v1), np.linalg.norm(v0),
                               rtol=1e-3)
