"""SAM ViT-B encoder tests (small config for CPU speed)."""
import jax
import jax.numpy as jnp
import numpy as np

from sgv3d_tpu.nn.sam_encoder import (
    ImageEncoderViT, postprocess_masks, preprocess, window_partition,
    window_unpartition)


def test_window_partition_roundtrip(rng):
    x = jnp.asarray(rng.normal(size=(2, 10, 13, 4)), jnp.float32)
    windows, pad_hw = window_partition(x, 7)
    assert windows.shape[1:] == (7, 7, 4)
    back = window_unpartition(windows, 7, pad_hw, (10, 13))
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-6)


def test_encoder_output_shape(rng):
    enc = ImageEncoderViT(img_size=64, patch_size=16, embed_dim=32, depth=2,
                          num_heads=2, out_chans=16, window_size=2,
                          global_attn_indexes=(1,))
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)), jnp.float32)
    variables = enc.init(jax.random.PRNGKey(0), x)
    out = enc.apply(variables, x)
    assert out.shape == (1, 4, 4, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_preprocess_pads_and_normalises():
    x = jnp.full((1, 40, 60, 3), 123.675, jnp.float32)
    out = preprocess(x, img_size=64)
    assert out.shape == (1, 64, 64, 3)
    # first channel was exactly the mean -> 0 after normalisation
    np.testing.assert_allclose(np.asarray(out[0, :40, :60, 0]), 0.0, atol=1e-5)
    # padded region is the normalised zero pixel? no: padding is zeros
    np.testing.assert_allclose(np.asarray(out[0, 50, 62]), 0.0, atol=1e-6)


def test_postprocess_masks_crop_resize(rng):
    masks = jnp.asarray(rng.normal(size=(1, 16, 16, 1)), jnp.float32)
    out = postprocess_masks(masks, input_size=(48, 64), original_size=(27, 48),
                            img_size=64)
    assert out.shape == (1, 27, 48, 1)
