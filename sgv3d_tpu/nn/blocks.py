"""Shared NN building blocks (flax.linen, NHWC).

Convs use explicit symmetric padding so outputs match the PyTorch padding
convention exactly (XLA 'SAME' distributes padding differently for strided
convs). BatchNorm follows torch defaults (eps 1e-5) unless noted.

Reference parity targets:
  Mlp/SELayer/ASPP:  /root/reference/layers/backbones/lss_fpn.py:18-160
  SABlock/TaskHead/TaskFPN: /root/reference/layers/backbones/bsm_lss_fpn.py:151-212
  BasicBlock: mmdet.models.backbones.resnet.BasicBlock (external dep of ref)
"""
from __future__ import annotations

from typing import Callable, Sequence

import flax.linen as nn
import jax.numpy as jnp

from sgv3d_tpu.ops.resize import resize_bilinear


def conv(features: int, kernel: int, stride: int = 1, padding: int | None = None,
         dilation: int = 1, use_bias: bool = True, groups: int = 1,
         name: str | None = None, dtype=None) -> nn.Conv:
    """Torch-convention Conv2d: explicit symmetric padding (default k//2 * d)."""
    if padding is None:
        padding = (kernel // 2) * dilation
    return nn.Conv(
        features=features,
        kernel_size=(kernel, kernel),
        strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        kernel_dilation=(dilation, dilation),
        use_bias=use_bias,
        feature_group_count=groups,
        name=name,
        dtype=dtype,
    )


class BatchNorm(nn.Module):
    """BatchNorm tracking running stats (torch semantics).

    `train=True` uses batch statistics and updates the `batch_stats`
    collection; `train=False` uses running statistics.
    """
    eps: float = 1e-5
    momentum: float = 0.9  # flax momentum = 1 - torch momentum (torch 0.1)
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool):
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=self.momentum,
            epsilon=self.eps,
            dtype=self.dtype,
            name="bn",
        )(x)


class ConvBNReLU(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    dilation: int = 1
    use_bias: bool = True
    bn_eps: float = 1e-5
    bn_momentum: float = 0.9
    relu: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool):
        x = conv(self.features, self.kernel, self.stride,
                 dilation=self.dilation, use_bias=self.use_bias,
                 dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=self.bn_momentum,
                         epsilon=self.bn_eps, dtype=self.dtype, name="bn")(x)
        if self.relu:
            x = nn.relu(x)
        return x


class BasicBlock(nn.Module):
    """ResNet basic block: two 3x3 convs + identity (or 1x1-projected) skip."""
    features: int
    stride: int = 1
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool):
        identity = x
        out = conv(self.features, 3, self.stride, use_bias=False,
                   dtype=self.dtype, name="conv1")(x)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           epsilon=1e-5, dtype=self.dtype, name="bn1")(out)
        out = nn.relu(out)
        out = conv(self.features, 3, 1, use_bias=False,
                   dtype=self.dtype, name="conv2")(out)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           epsilon=1e-5, dtype=self.dtype, name="bn2")(out)
        if self.stride != 1 or x.shape[-1] != self.features:
            identity = conv(self.features, 1, self.stride, use_bias=False,
                            dtype=self.dtype, name="downsample_conv")(x)
            identity = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                    epsilon=1e-5, dtype=self.dtype,
                                    name="downsample_bn")(identity)
        return nn.relu(out + identity)


class Mlp(nn.Module):
    hidden: int
    out: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, name="fc1")(x)
        x = nn.relu(x)
        return nn.Dense(self.out, name="fc2")(x)


class SELayer(nn.Module):
    """Camera-aware squeeze-excitation: gates `x` by a transform of `x_se`."""
    channels: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, x_se):
        g = conv(self.channels, 1, dtype=self.dtype, name="conv_reduce")(x_se)
        g = nn.relu(g)
        g = conv(self.channels, 1, dtype=self.dtype, name="conv_expand")(g)
        return x * nn.sigmoid(g)


class ASPP(nn.Module):
    """Atrous spatial pyramid pooling with dilations (1, 6, 12, 18) + global
    pooling branch, fused by a 1x1 conv. Dropout(0.5) active only in train."""
    mid_channels: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool):
        branches = []
        for i, (k, d) in enumerate([(1, 1), (3, 6), (3, 12), (3, 18)]):
            b = conv(self.mid_channels, k, dilation=d, use_bias=False,
                     dtype=self.dtype, name=f"aspp{i + 1}_conv")(x)
            b = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype,
                             name=f"aspp{i + 1}_bn")(b)
            branches.append(nn.relu(b))
        # Global branch: adaptive 1x1 avg pool -> conv/BN/ReLU -> broadcast
        # back to (H, W); bilinear upsample of a 1x1 map is a broadcast.
        g = jnp.mean(x, axis=(1, 2), keepdims=True)
        g = conv(self.mid_channels, 1, use_bias=False, dtype=self.dtype,
                 name="gap_conv")(g)
        g = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="gap_bn")(g)
        g = nn.relu(g)
        g = jnp.broadcast_to(g, branches[0].shape)
        out = jnp.concatenate(branches + [g], axis=-1)
        out = conv(self.mid_channels, 1, use_bias=False, dtype=self.dtype,
                   name="proj_conv")(out)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           epsilon=1e-5, dtype=self.dtype, name="proj_bn")(out)
        out = nn.relu(out)
        return nn.Dropout(0.5, deterministic=not train, name="dropout")(out)


class SABlock(nn.Module):
    """Spatial attention: conv(x) gated by sigmoid(conv(y))."""
    channels: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, y):
        att = conv(self.channels, 3, use_bias=False, dtype=self.dtype,
                   name="attention_conv")(y)
        v = conv(self.channels, 3, use_bias=False, dtype=self.dtype,
                 name="conv")(x)
        return v * nn.sigmoid(att)


class TaskHead(nn.Module):
    """Two BasicBlocks + conv/BN/ReLU decoder + 1x1 prediction head.

    There is deliberately no `with_head=False` variant: the reference's
    TaskHead(with_head=False, return_feat=True) forward returns its input
    UNCHANGED (bsm_lss_fpn.py:195-201 — the decoder params are dead), so the
    one such call site (`depth_head0`) is an identity in msct_head.py rather
    than a module here.
    """
    mid_channels: int
    out_channels: int = 0
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool, return_feat: bool = True):
        feat = BasicBlock(self.mid_channels, dtype=self.dtype, name="block1")(x, train)
        feat = BasicBlock(self.mid_channels, dtype=self.dtype, name="block2")(feat, train)
        feat = ConvBNReLU(self.mid_channels, 3, dtype=self.dtype,
                          name="decoder_out")(feat, train)
        pred = conv(self.out_channels, 1, dtype=self.dtype, name="head")(feat)
        if return_feat:
            return pred, feat
        return pred


class TaskFPN(nn.Module):
    """Upsample coarse feature x2, fuse with fine scale via spatial attention."""
    out_channels: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, feat0, feat1):
        up = resize_bilinear(feat0, scale=2, align_corners=False)
        up = conv(self.out_channels, 3, dtype=self.dtype, name="reduce_conv")(up)
        return up + SABlock(self.out_channels, dtype=self.dtype,
                            name="self_attention")(feat1, up)


class SeparateTaskBranch(nn.Module):
    """CenterHead separate-head branch: (num_conv-1) ConvBNReLU + final conv."""
    out_channels: int
    num_conv: int = 2
    head_conv: int = 64
    final_kernel: int = 3
    init_bias: float | None = None
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool):
        for i in range(self.num_conv - 1):
            x = ConvBNReLU(self.head_conv, self.final_kernel,
                           dtype=self.dtype, name=f"conv{i}")(x, train)
        bias_init = (nn.initializers.constant(self.init_bias)
                     if self.init_bias is not None else nn.initializers.zeros_init())
        return nn.Conv(
            self.out_channels, (self.final_kernel, self.final_kernel),
            padding=[(self.final_kernel // 2,) * 2] * 2,
            bias_init=bias_init, dtype=self.dtype, name="final")(x)
