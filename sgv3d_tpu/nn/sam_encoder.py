"""SAM ViT-B image encoder (flax.linen, NHWC).

Faithful re-implementation of the vendored SAM encoder the reference carries
(/root/reference/layers/backbones/sam_encoder.py:19-476): ViT with 16x16
patch embed, absolute + decomposed relative position embeddings, 14x14
windowed attention with global attention at blocks (2, 5, 8, 11), and a
conv neck to 256 channels. Used by the embedding-distillation variant of
BEVHeight (the reference imports it at lss_fpn.py:13); kept API-compatible:
`build_sam_vit_b()` returns the module, `preprocess`/`postprocess_masks`
mirror the original normalisation/pad/crop behaviour.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from sgv3d_tpu.ops.resize import resize_bilinear

SAM_PIXEL_MEAN = (123.675, 116.28, 103.53)
SAM_PIXEL_STD = (58.395, 57.12, 57.375)


class MLPBlock(nn.Module):
    mlp_dim: int

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        x = nn.Dense(self.mlp_dim, name="lin1")(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(d, name="lin2")(x)


class LayerNorm2d(nn.Module):
    """Channel-wise LayerNorm over the last axis of NHWC maps (the reference's
    channel-first LN transposed to our layout)."""
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones_init(), (x.shape[-1],))
        b = self.param("bias", nn.initializers.zeros_init(), (x.shape[-1],))
        mu = x.mean(axis=-1, keepdims=True)
        var = ((x - mu) ** 2).mean(axis=-1, keepdims=True)
        return (x - mu) / jnp.sqrt(var + self.eps) * w + b


def window_partition(x, window: int):
    """(B, H, W, C) -> (B*nW, window, window, C) with padding; returns
    (windows, (Hp, Wp))."""
    b, h, w, c = x.shape
    pad_h = (window - h % window) % window
    pad_w = (window - w % window) % window
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    hp, wp = h + pad_h, w + pad_w
    x = x.reshape(b, hp // window, window, wp // window, window, c)
    windows = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window, window, c)
    return windows, (hp, wp)


def window_unpartition(windows, window: int, pad_hw, hw):
    hp, wp = pad_hw
    h, w = hw
    b = windows.shape[0] // (hp * wp // window // window)
    x = windows.reshape(b, hp // window, wp // window, window, window, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, -1)
    return x[:, :h, :w]


def get_rel_pos(q_size: int, k_size: int, rel_pos: jnp.ndarray) -> jnp.ndarray:
    """Interpolate relative position embeddings to the needed length and
    index by pairwise relative coordinates."""
    max_rel_dist = 2 * max(q_size, k_size) - 1
    if rel_pos.shape[0] != max_rel_dist:
        rel = resize_bilinear(rel_pos[None, :, :, None],
                              size=(max_rel_dist, rel_pos.shape[1]),
                              align_corners=False)
        rel_pos = rel[0, :, :, 0]
    q_coords = jnp.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k_coords = jnp.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    rel_coords = (q_coords - k_coords) + (k_size - 1) * max(q_size / k_size, 1.0)
    return rel_pos[rel_coords.astype(jnp.int32)]


def add_decomposed_rel_pos(attn, q, rel_pos_h, rel_pos_w, q_size, k_size):
    q_h, q_w = q_size
    k_h, k_w = k_size
    Rh = get_rel_pos(q_h, k_h, rel_pos_h)
    Rw = get_rel_pos(q_w, k_w, rel_pos_w)
    b, _, dim = q.shape
    r_q = q.reshape(b, q_h, q_w, dim)
    rel_h = jnp.einsum("bhwc,hkc->bhwk", r_q, Rh)
    rel_w = jnp.einsum("bhwc,wkc->bhwk", r_q, Rw)
    attn = attn.reshape(b, q_h, q_w, k_h, k_w)
    attn = attn + rel_h[:, :, :, :, None] + rel_w[:, :, :, None, :]
    return attn.reshape(b, q_h * q_w, k_h * k_w)


class Attention(nn.Module):
    num_heads: int
    use_rel_pos: bool = True
    input_size: tuple[int, int] = (14, 14)

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        head_dim = c // self.num_heads
        scale = head_dim ** -0.5
        qkv = nn.Dense(c * 3, name="qkv")(x.reshape(b, h * w, c))
        qkv = qkv.reshape(b, h * w, 3, self.num_heads, head_dim)
        qkv = qkv.transpose(2, 0, 3, 1, 4).reshape(
            3, b * self.num_heads, h * w, head_dim)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q * scale) @ k.transpose(0, 2, 1)
        if self.use_rel_pos:
            rel_pos_h = self.param(
                "rel_pos_h", nn.initializers.zeros_init(),
                (2 * self.input_size[0] - 1, head_dim))
            rel_pos_w = self.param(
                "rel_pos_w", nn.initializers.zeros_init(),
                (2 * self.input_size[1] - 1, head_dim))
            attn = add_decomposed_rel_pos(attn, q, rel_pos_h, rel_pos_w,
                                          (h, w), (h, w))
        attn = jax.nn.softmax(attn, axis=-1)
        x = (attn @ v).reshape(b, self.num_heads, h, w, head_dim)
        x = x.transpose(0, 2, 3, 1, 4).reshape(b, h, w, c)
        return nn.Dense(c, name="proj")(x)


class Block(nn.Module):
    num_heads: int
    mlp_ratio: float = 4.0
    window_size: int = 14
    input_size: tuple[int, int] = (64, 64)

    @nn.compact
    def __call__(self, x):
        shortcut = x
        h, w = x.shape[1], x.shape[2]
        y = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        if self.window_size > 0:
            y, pad_hw = window_partition(y, self.window_size)
            attn_size = (self.window_size, self.window_size)
        else:
            attn_size = (h, w)
        y = Attention(self.num_heads, input_size=attn_size, name="attn")(y)
        if self.window_size > 0:
            y = window_unpartition(y, self.window_size, pad_hw, (h, w))
        x = shortcut + y
        y = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        return x + MLPBlock(int(x.shape[-1] * self.mlp_ratio), name="mlp")(y)


class ImageEncoderViT(nn.Module):
    img_size: int = 1024
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    out_chans: int = 256
    window_size: int = 14
    global_attn_indexes: Sequence[int] = (2, 5, 8, 11)

    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, 3) normalised, H = W = img_size. Returns
        (B, H/16, W/16, out_chans)."""
        x = nn.Conv(self.embed_dim, (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size),
                    padding="VALID", name="patch_embed")(x)
        grid = self.img_size // self.patch_size
        pos = self.param("pos_embed", nn.initializers.zeros_init(),
                         (1, grid, grid, self.embed_dim))
        if pos.shape[1] != x.shape[1] or pos.shape[2] != x.shape[2]:
            pos = resize_bilinear(pos, size=(x.shape[1], x.shape[2]))
        x = x + pos
        for i in range(self.depth):
            ws = 0 if i in self.global_attn_indexes else self.window_size
            x = Block(self.num_heads, window_size=ws,
                      input_size=(x.shape[1], x.shape[2]),
                      name=f"block{i}")(x)
        x = nn.Conv(self.out_chans, (1, 1), use_bias=False, name="neck_conv1")(x)
        x = LayerNorm2d(name="neck_ln1")(x)
        x = nn.Conv(self.out_chans, (3, 3), padding=[(1, 1), (1, 1)],
                    use_bias=False, name="neck_conv2")(x)
        return LayerNorm2d(name="neck_ln2")(x)


def build_sam_vit_b(img_size: int = 1024) -> ImageEncoderViT:
    return ImageEncoderViT(img_size=img_size, embed_dim=768, depth=12,
                           num_heads=12, global_attn_indexes=(2, 5, 8, 11))


def preprocess(x: jnp.ndarray, img_size: int = 1024) -> jnp.ndarray:
    """Normalise with SAM statistics and zero-pad bottom/right to img_size^2.
    x: (B, H, W, 3) raw pixels."""
    mean = jnp.asarray(SAM_PIXEL_MEAN)
    std = jnp.asarray(SAM_PIXEL_STD)
    x = (x - mean) / std
    h, w = x.shape[1], x.shape[2]
    return jnp.pad(x, ((0, 0), (0, img_size - h), (0, img_size - w), (0, 0)))


def postprocess_masks(masks: jnp.ndarray, input_size, original_size,
                      img_size: int = 1024) -> jnp.ndarray:
    """Upsample to img_size, crop padding, resize to the original size."""
    masks = resize_bilinear(masks, size=(img_size, img_size),
                            align_corners=False)
    masks = masks[:, : input_size[0], : input_size[1]]
    return resize_bilinear(masks, size=tuple(original_size),
                           align_corners=False)
