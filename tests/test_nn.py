"""Shape and semantics tests for NN building blocks."""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgv3d_tpu.nn import ResNet, SECONDFPN
from sgv3d_tpu.nn.blocks import ASPP, BasicBlock, SELayer
from sgv3d_tpu.ops.dcn import DeformConv, deform_conv2d
from sgv3d_tpu.ops.resize import resize_bilinear


def _init_apply(module, *args, train=False):
    variables = module.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        *args, train)
    return module.apply(variables, *args, train,
                        rngs={"dropout": jax.random.PRNGKey(2)})


def test_resnet18_image_shapes(rng):
    x = jnp.asarray(rng.normal(size=(2, 64, 96, 3)), jnp.float32)
    outs = _init_apply(ResNet(depth=18), x)
    assert [o.shape for o in outs] == [
        (2, 16, 24, 64), (2, 8, 12, 128), (2, 4, 6, 256), (2, 2, 3, 512)]


def test_resnet50_channels(rng):
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)), jnp.float32)
    outs = _init_apply(ResNet(depth=50), x)
    assert [o.shape[-1] for o in outs] == [256, 512, 1024, 2048]


def test_bev_trunk_resnet(rng):
    # BEV trunk variant: 3 stages, strides (1,2,2), no maxpool, base 16
    x = jnp.asarray(rng.normal(size=(1, 32, 32, 20)), jnp.float32)
    outs = _init_apply(ResNet(depth=18, base_channels=16, num_stages=3,
                              strides=(1, 2, 2), out_indices=(0, 1, 2),
                              with_maxpool=False), x)
    assert [o.shape for o in outs] == [
        (1, 16, 16, 16), (1, 8, 8, 32), (1, 4, 4, 64)]


def test_second_fpn_multiscale_fuse(rng):
    # 4 levels at strides 4, 8, 16, 32 of a 64x96 input -> all to stride 16
    feats = [jnp.asarray(rng.normal(size=(2, 16, 24, 4)), jnp.float32),
             jnp.asarray(rng.normal(size=(2, 8, 12, 8)), jnp.float32),
             jnp.asarray(rng.normal(size=(2, 4, 6, 16)), jnp.float32),
             jnp.asarray(rng.normal(size=(2, 2, 3, 32)), jnp.float32)]
    out = _init_apply(SECONDFPN((8, 8, 8, 8), (0.25, 0.5, 1, 2)), feats)
    assert out.shape == (2, 4, 6, 32)


def test_second_fpn_bev_strides(rng):
    feats = [jnp.asarray(rng.normal(size=(1, 16, 16, 4)), jnp.float32),
             jnp.asarray(rng.normal(size=(1, 8, 8, 8)), jnp.float32),
             jnp.asarray(rng.normal(size=(1, 4, 4, 16)), jnp.float32)]
    out = _init_apply(SECONDFPN((4, 4, 4), (1, 2, 4)), feats)
    assert out.shape == (1, 16, 16, 12)


def test_basic_block_identity_shape(rng):
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 16)), jnp.float32)
    out = _init_apply(BasicBlock(16), x)
    assert out.shape == x.shape
    assert np.all(np.asarray(out) >= 0)  # post-ReLU


def test_selayer_gating(rng):
    x = jnp.asarray(rng.normal(size=(2, 4, 4, 8)), jnp.float32)
    se = jnp.asarray(rng.normal(size=(2, 1, 1, 8)), jnp.float32)
    m = SELayer(8)
    variables = m.init(jax.random.PRNGKey(0), x, se)
    out = m.apply(variables, x, se)
    assert out.shape == x.shape
    # gate in (0, 1): |out| <= |x|
    assert np.all(np.abs(np.asarray(out)) <= np.abs(np.asarray(x)) + 1e-6)


def test_aspp_shape(rng):
    x = jnp.asarray(rng.normal(size=(1, 8, 12, 16)), jnp.float32)
    out = _init_apply(ASPP(16), x)
    assert out.shape == (1, 8, 12, 16)


def test_resize_bilinear_align_corners_true():
    # Corner-aligned upsample of a linear ramp stays an exact linear ramp.
    x = jnp.arange(4, dtype=jnp.float32).reshape(1, 1, 4, 1)
    out = resize_bilinear(x, size=(1, 7), align_corners=True)
    np.testing.assert_allclose(
        np.asarray(out)[0, 0, :, 0], np.linspace(0, 3, 7), atol=1e-6)


def test_resize_bilinear_half_pixel_matches_jax(rng):
    x = jnp.asarray(rng.normal(size=(1, 5, 7, 3)), jnp.float32)
    out = resize_bilinear(x, scale=2, align_corners=False)
    expect = jax.image.resize(x, (1, 10, 14, 3), method="bilinear")
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect), atol=1e-6)


def test_deform_conv_zero_offset_equals_conv(rng):
    """With zero offsets DCN must reduce to an ordinary 3x3 conv."""
    x = jnp.asarray(rng.normal(size=(1, 6, 6, 4)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 4, 8)) * 0.1, jnp.float32)
    offset = jnp.zeros((1, 6, 6, 18), jnp.float32)
    out = deform_conv2d(x, offset, w, None, 3, 1)
    expect = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                               rtol=1e-4, atol=1e-4)


def test_deform_conv_integer_shift(rng):
    """Offset (0, +1) shifts sampling one pixel right for every tap."""
    x = jnp.asarray(rng.normal(size=(1, 6, 8, 2)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 2, 2)) * 0.1, jnp.float32)
    off = jnp.zeros((1, 6, 8, 9, 2), jnp.float32).at[..., 1].set(1.0)
    out = deform_conv2d(x, off.reshape(1, 6, 8, 18), w, None, 3, 1)
    base = deform_conv2d(x, jnp.zeros((1, 6, 8, 18)), w, None, 3, 1)
    # Interior columns of `out` equal base shifted left by one column.
    np.testing.assert_allclose(np.asarray(out)[:, 1:-1, 1:-2],
                               np.asarray(base)[:, 1:-1, 2:-1],
                               rtol=1e-4, atol=1e-4)


def test_deform_conv_module_grouped(rng):
    x = jnp.asarray(rng.normal(size=(2, 5, 5, 8)), jnp.float32)
    m = DeformConv(8, kernel=3, groups=4)
    variables = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(variables, x)
    assert out.shape == (2, 5, 5, 8)
    # offset conv is zero-init: module output equals grouped plain conv
    w = variables["params"]["weight"]
    b = variables["params"]["bias"]
    expect = deform_conv2d(x, jnp.zeros((2, 5, 5, 18)), w, b, 3, 4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                               rtol=1e-4, atol=1e-4)


def _dcn_v1_numpy_oracle(x, offset, weight, bias, k, groups):
    """Handwritten mmcv DCNv1 reference (nested loops, NHWC in/out).

    Semantics transcribed from mmcv's deform_conv CUDA kernel
    (deformable_im2col_gpu_kernel + dmcn_im2col_bilinear): for output pixel
    (h0, w0) and tap (i, j), sample x at (h0 - pad + i + dy, w0 - pad + j +
    dx) with bilinear interpolation, zero for any coordinate outside
    (-1, H) x (-1, W) and zero-weight for out-of-range corners. Offset
    channels are (dy, dx) pairs, taps row-major. stride=1, dilation=1,
    pad=k//2 (the HeightNet conf, /root/reference/layers/backbones/
    lss_fpn.py:190-198).
    """
    b, h, w, cin = x.shape
    cout = weight.shape[-1]
    cg, og = cin // groups, cout // groups
    pad = k // 2
    out = np.zeros((b, h, w, cout), np.float64)

    def bilin(img, y, xx):  # img (H, W), scalar float coords, zero pad
        if y <= -1 or y >= h or xx <= -1 or xx >= w:
            return 0.0
        y0, x0 = int(np.floor(y)), int(np.floor(xx))
        wy, wx = y - y0, xx - x0
        val = 0.0
        for dy_c, dx_c in ((0, 0), (0, 1), (1, 0), (1, 1)):
            yy, xc = y0 + dy_c, x0 + dx_c
            if 0 <= yy < h and 0 <= xc < w:
                val += img[yy, xc] * ((1 - wy) if dy_c == 0 else wy) * \
                       ((1 - wx) if dx_c == 0 else wx)
        return val

    for bi in range(b):
        for h0 in range(h):
            for w0 in range(w):
                for t in range(k * k):
                    i, j = t // k, t % k
                    dy = offset[bi, h0, w0, 2 * t]
                    dx = offset[bi, h0, w0, 2 * t + 1]
                    py = h0 - pad + i + dy
                    px = w0 - pad + j + dx
                    for g in range(groups):
                        for ci in range(cg):
                            v = bilin(x[bi, :, :, g * cg + ci], py, px)
                            for co in range(og):
                                out[bi, h0, w0, g * og + co] += (
                                    v * weight[i, j, ci, g * og + co])
    if bias is not None:
        out += bias
    return out


def test_deform_conv_fractional_offsets_oracle(rng):
    """Fractional offsets vs an independent nested-loop mmcv-DCNv1 oracle,
    grouped (groups=4 as HeightNet uses). Catches (dy,dx) layout or corner-
    weighting bugs the zero-offset/integer-shift tests cannot see."""
    b, h, w, cin, cout, k, groups = 1, 5, 6, 8, 8, 3, 4
    x = rng.normal(size=(b, h, w, cin)).astype(np.float32)
    # Offsets up to ~2px, incl. samples that land outside the image.
    offset = (rng.normal(size=(b, h, w, 2 * k * k)) * 1.3).astype(np.float32)
    weight = (rng.normal(size=(k, k, cin // groups, cout)) * 0.2).astype(
        np.float32)
    bias = rng.normal(size=(cout,)).astype(np.float32)

    ref = _dcn_v1_numpy_oracle(x, offset, weight, bias, k, groups)
    out = deform_conv2d(jnp.asarray(x), jnp.asarray(offset),
                        jnp.asarray(weight), jnp.asarray(bias), k, groups)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_deform_conv_fractional_offsets_oracle_ungrouped(rng):
    b, h, w, cin, cout, k = 1, 4, 5, 3, 4, 3
    x = rng.normal(size=(b, h, w, cin)).astype(np.float32)
    offset = (rng.normal(size=(b, h, w, 2 * k * k)) * 0.9).astype(np.float32)
    weight = (rng.normal(size=(k, k, cin, cout)) * 0.2).astype(np.float32)
    ref = _dcn_v1_numpy_oracle(x, offset, weight, None, k, 1)
    out = deform_conv2d(jnp.asarray(x), jnp.asarray(offset),
                        jnp.asarray(weight), None, k, 1)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)
