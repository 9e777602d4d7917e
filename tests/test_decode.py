"""Decoder + circle NMS tests with synthetic heatmaps."""
import jax.numpy as jnp
import numpy as np

from sgv3d_tpu.decode import circle_nms, decode
from tests.tiny_configs import tiny_head


def _logit(p):
    return np.log(p / (1 - p))


def _empty_preds(cfg, h, w):
    preds = []
    for task in cfg.tasks:
        preds.append({
            "heatmap": np.full((1, h, w, task.num_classes), -8.0, np.float32),
            "reg": np.zeros((1, h, w, 2), np.float32),
            "height": np.zeros((1, h, w, 1), np.float32),
            "dim": np.zeros((1, h, w, 3), np.float32),
            "rot": np.zeros((1, h, w, 2), np.float32),
            "vel": np.zeros((1, h, w, 2), np.float32),
        })
    return preds


def test_decode_single_peak_roundtrip():
    cfg = tiny_head()
    w, h = cfg.feature_map_size
    preds = _empty_preds(cfg, h, w)
    # Car at cell (x=5, y=10) with offsets (0.25, 0.5), dims (4, 2, 1.5)
    preds[0]["heatmap"][0, 10, 5, 0] = _logit(0.95)
    preds[0]["reg"][0, 10, 5] = [0.25, 0.5]
    preds[0]["height"][0, 10, 5] = 1.2
    preds[0]["dim"][0, 10, 5] = np.log([4.0, 2.0, 1.5])
    preds[0]["rot"][0, 10, 5] = [np.sin(0.3), np.cos(0.3)]
    preds[0]["vel"][0, 10, 5] = [1.0, -1.0]

    dets = decode(cfg, [{k: jnp.asarray(v) for k, v in p.items()}
                        for p in preds])
    valid = np.asarray(dets.valid[0])
    assert valid.sum() == 1
    i = int(np.argmax(valid))
    box = np.asarray(dets.boxes[0, i])
    # x = (5 + 0.25) * 4 * 0.4 + 0 = 8.4 ; y = (10 + 0.5) * 1.6 - 12.8 = 4.0
    np.testing.assert_allclose(box[0], 8.4, atol=1e-5)
    np.testing.assert_allclose(box[1], 4.0, atol=1e-5)
    np.testing.assert_allclose(box[2], 1.2 - 0.75, atol=1e-5)  # bottom z
    np.testing.assert_allclose(box[3:6], [4.0, 2.0, 1.5], rtol=1e-5)
    np.testing.assert_allclose(box[6], 0.3, atol=1e-5)
    np.testing.assert_allclose(box[7:9], [1.0, -1.0], atol=1e-5)
    assert abs(float(dets.scores[0, i]) - 0.95) < 1e-3
    assert int(dets.labels[0, i]) == 0


def test_decode_score_threshold():
    cfg = tiny_head()
    w, h = cfg.feature_map_size
    preds = _empty_preds(cfg, h, w)
    preds[0]["heatmap"][0, 4, 4, 0] = _logit(0.05)  # below threshold 0.1
    dets = decode(cfg, [{k: jnp.asarray(v) for k, v in p.items()}
                        for p in preds])
    assert np.asarray(dets.valid).sum() == 0


def test_circle_nms_suppresses_near_duplicates():
    centers = jnp.asarray([[0.0, 0.0], [0.3, 0.0], [5.0, 5.0]], jnp.float32)
    valid = jnp.asarray([True, True, True])
    keep = np.asarray(circle_nms(centers, valid, 1.0))
    np.testing.assert_array_equal(keep, [True, False, True])


def test_circle_nms_respects_prior_validity():
    centers = jnp.asarray([[0.0, 0.0], [0.3, 0.0]], jnp.float32)
    # If the higher-scored candidate is invalid it must not suppress others.
    keep = np.asarray(circle_nms(centers, jnp.asarray([False, True]), 1.0))
    np.testing.assert_array_equal(keep, [False, True])


def test_decode_two_tasks_and_nms():
    cfg = tiny_head()
    w, h = cfg.feature_map_size
    preds = _empty_preds(cfg, h, w)
    # Two cars 0.8 m apart (cells are 1.6 m): radius 4 -> second suppressed
    preds[0]["heatmap"][0, 8, 8, 0] = _logit(0.9)
    preds[0]["heatmap"][0, 8, 9, 0] = _logit(0.8)
    # A cyclist far away in task 1 channel 1 (nms radius 0.5)
    preds[1]["heatmap"][0, 2, 2, 1] = _logit(0.7)
    dets = decode(cfg, [{k: jnp.asarray(v) for k, v in p.items()}
                        for p in preds])
    valid = np.asarray(dets.valid[0])
    labels = np.asarray(dets.labels[0])[valid]
    scores = np.asarray(dets.scores[0])[valid]
    assert sorted(labels.tolist()) == [0, 2]  # one car, one cyclist (global id 2)
    np.testing.assert_allclose(sorted(scores.tolist()), [0.7, 0.9], atol=1e-3)
