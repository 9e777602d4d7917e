"""Target generation + loss tests against straightforward numpy oracles."""
import jax.numpy as jnp
import numpy as np

from sgv3d_tpu.heads.losses import gaussian_focal_loss, head_loss
from sgv3d_tpu.heads.targets import gaussian_radius, get_targets
from sgv3d_tpu.losses.focal import (
    binary_focal_loss_with_logits, multiclass_focal_loss)
from sgv3d_tpu.losses.dice import dice_loss
from tests.tiny_configs import tiny_head


def _np_gaussian_radius(height, width, min_overlap):
    a1 = 1
    b1 = height + width
    c1 = width * height * (1 - min_overlap) / (1 + min_overlap)
    sq1 = np.sqrt(b1**2 - 4 * a1 * c1)
    r1 = (b1 + sq1) / 2
    a2 = 4
    b2 = 2 * (height + width)
    c2 = (1 - min_overlap) * width * height
    sq2 = np.sqrt(b2**2 - 4 * a2 * c2)
    r2 = (b2 + sq2) / 2
    a3 = 4 * min_overlap
    b3 = -2 * min_overlap * (height + width)
    c3 = (min_overlap - 1) * width * height
    sq3 = np.sqrt(b3**2 - 4 * a3 * c3)
    r3 = (b3 + sq3) / 2
    return min(r1, r2, r3)


def test_gaussian_radius_matches_reference_formula():
    for h, w in [(3.0, 2.0), (10.0, 4.0), (1.0, 1.0), (25.0, 12.0)]:
        got = float(gaussian_radius((jnp.float32(h), jnp.float32(w)), 0.1))
        expect = _np_gaussian_radius(h, w, 0.1)
        assert abs(got - expect) < 1e-4, (h, w, got, expect)


def test_get_targets_single_object():
    cfg = tiny_head()
    k = cfg.max_objs
    gt_boxes = np.zeros((1, k, 9), np.float32)
    gt_labels = np.full((1, k), -1, np.int32)
    # One car at (8.0, 3.2) -> feature-map coords (8/1.6, (3.2+12.8)/1.6) = (5, 10)
    gt_boxes[0, 0] = [8.0, 3.2, -0.5, 4.0, 2.0, 1.5, 0.3, 0.1, -0.2]
    gt_labels[0, 0] = 0

    t = get_targets(cfg, jnp.asarray(gt_boxes), jnp.asarray(gt_labels))
    hm_car = np.asarray(t.heatmaps[0])  # (1, 16, 16, 1)
    assert hm_car.shape == (1, 16, 16, 1)
    assert hm_car[0, 10, 5, 0] == 1.0  # peak at the centre
    assert hm_car.max() == 1.0
    # second task untouched
    assert np.asarray(t.heatmaps[1]).max() == 0.0

    np.testing.assert_array_equal(np.asarray(t.masks[0])[0, :2], [1, 0])
    assert int(t.inds[0, 0]) == 10 * 16 + 5
    anno = np.asarray(t.anno_boxes)[0, 0]
    np.testing.assert_allclose(anno[0], 8.0 / 1.6 - 5, atol=1e-5)
    np.testing.assert_allclose(anno[2], -0.5, atol=1e-6)
    np.testing.assert_allclose(anno[3:6], np.log([4.0, 2.0, 1.5]), atol=1e-5)
    np.testing.assert_allclose(anno[6], np.sin(0.3), atol=1e-6)
    np.testing.assert_allclose(anno[7], np.cos(0.3), atol=1e-6)
    np.testing.assert_allclose(anno[8:], [0.1, -0.2], atol=1e-6)


def test_get_targets_task_split_and_oob():
    cfg = tiny_head()
    k = cfg.max_objs
    gt_boxes = np.zeros((1, k, 9), np.float32)
    gt_labels = np.full((1, k), -1, np.int32)
    gt_boxes[0, 0] = [8.0, 0.0, 0, 2, 2, 2, 0, 0, 0]   # car
    gt_boxes[0, 1] = [12.0, 4.0, 0, 1, 1, 2, 0, 0, 0]  # pedestrian (task 1)
    gt_boxes[0, 2] = [100.0, 0.0, 0, 2, 2, 2, 0, 0, 0]  # out of range
    gt_labels[0, :3] = [0, 1, 0]
    t = get_targets(cfg, jnp.asarray(gt_boxes), jnp.asarray(gt_labels))
    np.testing.assert_array_equal(np.asarray(t.masks[0])[0, :3], [1, 0, 0])
    np.testing.assert_array_equal(np.asarray(t.masks[1])[0, :3], [0, 1, 0])
    # pedestrian heatmap channel 0 of task 1
    hm1 = np.asarray(t.heatmaps[1])
    assert hm1[0, :, :, 0].max() == 1.0
    assert hm1[0, :, :, 1].max() == 0.0


def test_gaussian_focal_loss_basics():
    pred = jnp.asarray([[0.9, 0.1]], jnp.float32)
    target = jnp.asarray([[1.0, 0.0]], jnp.float32)
    loss = np.asarray(gaussian_focal_loss(pred, target))
    # positive: -(log .9) * .1^2 ; negative: -(log .9) * .1^2
    expect_pos = -np.log(0.9) * 0.01
    expect_neg = -np.log(0.9) * 0.01
    np.testing.assert_allclose(loss[0], [expect_pos, expect_neg], rtol=1e-5)


def test_head_loss_perfect_prediction_low():
    """Loss with predictions matching targets should be much lower than noise."""
    cfg = tiny_head()
    k = cfg.max_objs
    rng = np.random.default_rng(0)
    gt_boxes = np.zeros((1, k, 9), np.float32)
    gt_labels = np.full((1, k), -1, np.int32)
    gt_boxes[0, 0] = [8.0, 3.2, -0.5, 4.0, 2.0, 1.5, 0.3, 0.0, 0.0]
    gt_labels[0, 0] = 0
    t = get_targets(cfg, jnp.asarray(gt_boxes), jnp.asarray(gt_labels))

    h, w = cfg.feature_map_size[1], cfg.feature_map_size[0]

    def preds_from_targets(noise):
        preds = []
        anno = np.zeros((1, h, w, 10), np.float32)
        ind = int(t.inds[0, 0])
        anno[0, ind // w, ind % w] = np.asarray(t.anno_boxes)[0, 0]
        for ti in range(2):
            hm = np.asarray(t.heatmaps[ti])
            logit = np.log(np.clip(hm, 1e-4, 1 - 1e-4) /
                           (1 - np.clip(hm, 1e-4, 1 - 1e-4)))
            p = {"heatmap": jnp.asarray(logit + noise * rng.normal(size=logit.shape)),
                 "reg": jnp.asarray(anno[..., 0:2]),
                 "height": jnp.asarray(anno[..., 2:3]),
                 "dim": jnp.asarray(anno[..., 3:6]),
                 "rot": jnp.asarray(anno[..., 6:8]),
                 "vel": jnp.asarray(anno[..., 8:10])}
            preds.append(p)
        return preds

    loss_good, _ = head_loss(cfg, t, preds_from_targets(0.0))
    loss_bad, _ = head_loss(cfg, t, preds_from_targets(4.0))
    assert float(loss_good) < 0.1 * float(loss_bad)
    assert float(loss_good) < 0.2


def test_binary_focal_matches_manual():
    logits = jnp.asarray([2.0, -1.0, 0.5])
    targets = jnp.asarray([1.0, 0.0, 1.0])
    got = float(binary_focal_loss_with_logits(logits, targets))
    p = 1 / (1 + np.exp(-np.asarray(logits)))
    t = np.asarray(targets)
    logpt = -(t * np.log(p) + (1 - t) * np.log(1 - p))
    pt = np.exp(-logpt)
    loss = (1 - pt) ** 2 * logpt * (0.25 * t + 0.75 * (1 - t))
    assert abs(got - loss.mean()) < 1e-6


def test_multiclass_focal_prefers_correct():
    labels = jnp.asarray([[0, 1], [2, 1]])
    good = jnp.zeros((2, 2, 3)).at[
        jnp.arange(2)[:, None], jnp.arange(2)[None], labels].set(8.0) - 4.0
    bad = -good
    assert float(multiclass_focal_loss(good, labels)) < float(
        multiclass_focal_loss(bad, labels))


def test_dice_loss():
    pred = jnp.asarray([1.0, 0.0, 1.0])
    assert float(dice_loss(pred, pred)) < 1e-5
    assert float(dice_loss(pred, 1 - pred)) > 0.99


def test_embed_loss_and_train_loss_hook():
    import dataclasses
    import jax
    from sgv3d_tpu.models.bev_height import embed_loss, train_loss
    from tests.tiny_configs import tiny_exp
    rng = np.random.default_rng(0)
    assist = jnp.asarray(rng.normal(size=(2, 4, 6, 8)), jnp.float32)
    embeds = np.asarray(assist).reshape(2, 1, 4, 6, 8)
    # identical embeds -> zero loss; shifted -> 1000 * mse
    assert float(embed_loss((assist, assist), jnp.asarray(embeds))) < 1e-6
    shifted = embeds + 0.1
    got = float(embed_loss((assist, assist), jnp.asarray(shifted)))
    np.testing.assert_allclose(got, 1000 * 0.01, rtol=1e-4)


# --- full loss-library modes vs torch-transcribed oracles -------------------

def _torch_binary_focal(logits, targets, gamma=2.0, alpha=0.25,
                        ignore_index=None):
    """Reference semantics (losses/_functional.py:36-99 + focal.py:60-70):
    boolean-filter ignored elements, then mean."""
    import torch
    x = torch.tensor(np.asarray(logits).reshape(-1))
    t = torch.tensor(np.asarray(targets).reshape(-1), dtype=torch.float64)
    x = x.double()
    if ignore_index is not None:
        keep = t != ignore_index
        x, t = x[keep], t[keep]
    logpt = torch.nn.functional.binary_cross_entropy_with_logits(
        x, t, reduction="none")
    pt = torch.exp(-logpt)
    loss = (1 - pt) ** gamma * logpt
    if alpha is not None:
        loss = loss * (alpha * t + (1 - alpha) * (1 - t))
    return float(loss.mean())


def test_binary_focal_ignore_index_matches_torch(rng):
    from sgv3d_tpu.losses import binary_focal_loss_with_logits
    logits = rng.normal(size=(64,)).astype(np.float32)
    targets = rng.integers(0, 2, 64).astype(np.float32)
    targets[::7] = -1  # ignored
    got = float(binary_focal_loss_with_logits(
        jnp.asarray(logits), jnp.asarray(targets), ignore_index=-1))
    ref = _torch_binary_focal(logits, targets, ignore_index=-1)
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_multiclass_focal_ignore_index_matches_torch(rng):
    from sgv3d_tpu.losses import focal_loss
    c = 4
    logits = rng.normal(size=(30, c)).astype(np.float32)
    labels = rng.integers(0, c, 30)
    labels[::5] = -1
    got = float(focal_loss(jnp.asarray(logits), jnp.asarray(labels),
                           "multiclass", ignore_index=-1))
    # reference focal.py:77-88: per-class one-vs-all on the kept elements
    ref = 0.0
    keep = labels != -1
    for cls in range(c):
        ref += _torch_binary_focal(logits[keep, cls],
                                   (labels[keep] == cls).astype(np.float32))
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_multilabel_focal_matches_binary_flatten(rng):
    from sgv3d_tpu.losses import focal_loss
    logits = rng.normal(size=(6, 5, 3)).astype(np.float32)
    targets = rng.integers(0, 2, (6, 5, 3)).astype(np.float32)
    got = float(focal_loss(jnp.asarray(logits), jnp.asarray(targets),
                           "multilabel"))
    ref = _torch_binary_focal(logits, targets)
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_dice_loss_modes_multiclass_matches_torch(rng):
    import torch
    import torch.nn.functional as F
    from sgv3d_tpu.losses import dice_loss_modes

    b, h, w, c = 2, 6, 5, 4
    logits = rng.normal(size=(b, h, w, c)).astype(np.float32)
    labels = rng.integers(0, c, (b, h, w))
    labels[:, 0] = -1  # ignored rows

    got = float(dice_loss_modes(jnp.asarray(logits), jnp.asarray(labels),
                                "multiclass", ignore_index=-1))

    # torch transcription of /root/reference/losses/dice.py:58-130 (NCHW)
    yp = torch.tensor(logits).permute(0, 3, 1, 2).double()
    yt = torch.tensor(labels)
    yp = yp.log_softmax(dim=1).exp()
    yt_flat = yt.view(b, -1)
    yp = yp.reshape(b, c, -1)
    mask = yt_flat != -1
    yp = yp * mask.unsqueeze(1)
    oh = F.one_hot((yt_flat * mask).long(), c).permute(0, 2, 1) * \
        mask.unsqueeze(1)
    dims = (0, 2)
    inter = torch.sum(yp * oh, dim=dims)
    card = torch.sum(yp + oh, dim=dims)
    scores = (2 * inter) / card.clamp_min(1e-7)
    loss = 1.0 - scores
    loss = loss * (oh.sum(dims) > 0)
    ref = float(loss.mean())
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_dice_loss_modes_binary_and_multilabel(rng):
    from sgv3d_tpu.losses import dice_loss_modes
    pred = rng.normal(size=(2, 8, 1)).astype(np.float32)
    tgt = rng.integers(0, 2, (2, 8, 1)).astype(np.float32)
    v_bin = float(dice_loss_modes(jnp.asarray(pred), jnp.asarray(tgt),
                                  "binary"))
    assert 0.0 <= v_bin <= 1.0
    pred3 = rng.normal(size=(2, 8, 3)).astype(np.float32)
    tgt3 = rng.integers(0, 2, (2, 8, 3)).astype(np.float32)
    v_ml = float(dice_loss_modes(jnp.asarray(pred3), jnp.asarray(tgt3),
                                 "multilabel"))
    assert 0.0 <= v_ml <= 1.0


def test_functional_scores_match_torch_formulas(rng):
    import torch
    from sgv3d_tpu.losses import (soft_jaccard_score, soft_tversky_score,
                                  wing_loss)
    o = rng.random((3, 4)).astype(np.float32)
    t = rng.integers(0, 2, (3, 4)).astype(np.float32)
    jac = float(soft_jaccard_score(jnp.asarray(o), jnp.asarray(t)))
    ot, tt = torch.tensor(o).double(), torch.tensor(t).double()
    inter = float((ot * tt).sum())
    card = float((ot + tt).sum())
    np.testing.assert_allclose(jac, inter / max(card - inter, 1e-7),
                               rtol=1e-5)
    tv = float(soft_tversky_score(jnp.asarray(o), jnp.asarray(t), 0.3, 0.7))
    fp = float((ot * (1 - tt)).sum())
    fn = float(((1 - ot) * tt).sum())
    np.testing.assert_allclose(tv, inter / (inter + 0.3 * fp + 0.7 * fn),
                               rtol=1e-5)
    # wing loss: quadratic-log near zero, linear far away
    w = float(wing_loss(jnp.asarray(o), jnp.asarray(t), width=5.0,
                        curvature=0.5))
    d = np.abs(t - o)
    c = 5.0 - 5.0 * np.log(1 + 5.0 / 0.5)
    ref = np.where(d < 5.0, 5.0 * np.log(1 + d / 0.5), d - c).mean()
    np.testing.assert_allclose(w, ref, rtol=1e-5)


def test_label_smoothed_nll_ignore(rng):
    from sgv3d_tpu.losses import label_smoothed_nll_loss
    lp = np.log(np.full((5, 3), 1 / 3, np.float32))
    tgt = rng.integers(0, 3, 5)
    tgt[0] = -1
    v = float(label_smoothed_nll_loss(jnp.asarray(lp), jnp.asarray(tgt), 0.1,
                                      ignore_index=-1))
    # uniform log-probs: every term is log(3) regardless of smoothing
    np.testing.assert_allclose(v, np.log(3.0), rtol=1e-5)
