"""Numerical parity: flax modules + weight converter vs torch reference
implementations (eval mode). Validates conv padding conventions, BN handling,
residual wiring and the name mapping together."""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from convert_weights import convert_state_dict  # noqa: E402
from sgv3d_tpu.nn.msct_head import MSCThead  # noqa: E402
from sgv3d_tpu.nn.resnet import ResNet  # noqa: E402
from sgv3d_tpu.nn.second_fpn import SECONDFPN  # noqa: E402

torch.manual_seed(0)


class TorchBasicBlock(tnn.Module):
    def __init__(self, cin, planes, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, planes, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.downsample = None
        if stride != 1 or cin != planes:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, planes, 1, stride, bias=False),
                tnn.BatchNorm2d(planes))

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        out = torch.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return torch.relu(out + idt)


class TorchResNet18Img(tnn.Module):
    """mmdet-style ResNet-18 (stem + maxpool + 4 stages of 2 blocks)."""

    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        cin = 64
        for li, planes in enumerate([64, 128, 256, 512]):
            blocks = []
            for b in range(2):
                stride = (1 if li == 0 or b > 0 else 2)
                blocks.append(TorchBasicBlock(cin, planes, stride))
                cin = planes
            setattr(self, f"layer{li + 1}", tnn.Sequential(*blocks))

    def forward(self, x):
        x = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
        outs = []
        for li in range(4):
            x = getattr(self, f"layer{li + 1}")(x)
            outs.append(x)
        return outs


def _randomize_bn_stats(model):
    g = torch.Generator().manual_seed(3)
    for m in model.modules():
        if isinstance(m, tnn.BatchNorm2d):
            with torch.no_grad():
                m.running_mean.copy_(torch.randn(
                    m.running_mean.shape, generator=g) * 0.3)
                m.running_var.copy_(torch.rand(
                    m.running_var.shape, generator=g) + 0.5)
                m.weight.copy_(torch.randn(m.weight.shape, generator=g) * 0.2
                               + 1.0)
                m.bias.copy_(torch.randn(m.bias.shape, generator=g) * 0.1)


def test_resnet18_full_parity_through_converter(rng):
    tm = TorchResNet18Img().eval()
    _randomize_bn_stats(tm)
    x = rng.normal(size=(2, 64, 96, 3)).astype(np.float32)
    with torch.no_grad():
        ref = [o.numpy() for o in tm(torch.tensor(x.transpose(0, 3, 1, 2)))]

    fm = ResNet(18, out_indices=(0, 1, 2, 3))
    variables = fm.init(jax.random.PRNGKey(0), jnp.asarray(x), False)
    # prefix torch keys the way the reference checkpoint names them
    sd = {"model.backbone.img_backbone." + k: v.numpy()
          for k, v in tm.state_dict().items()
          if "num_batches_tracked" not in k}
    wrapped = {
        "params": {"backbone": {"img_backbone": variables["params"]}},
        "batch_stats": {"backbone": {"img_backbone": variables["batch_stats"]}},
    }
    new_vars, used, missing = convert_state_dict(sd, wrapped, strict=True)
    assert not missing and len(used) == len(sd)
    converted = {
        "params": new_vars["params"]["backbone"]["img_backbone"],
        "batch_stats": new_vars["batch_stats"]["backbone"]["img_backbone"],
    }
    outs = fm.apply(converted, jnp.asarray(x), False)
    for o, r in zip(outs, ref):
        np.testing.assert_allclose(
            np.asarray(o).transpose(0, 3, 1, 2), r, rtol=1e-3, atol=1e-3)


def test_secondfpn_parity_through_converter(rng):
    class TorchSECONDFPN(tnn.Module):
        def __init__(self):
            super().__init__()
            blocks = []
            for cin, s, cout in [(16, 0.5, 8), (32, 1, 8), (64, 2, 8)]:
                if s >= 1:
                    up = tnn.ConvTranspose2d(cin, cout, int(s), int(s))
                else:
                    k = int(round(1 / s))
                    up = tnn.Conv2d(cin, cout, k, k)
                blocks.append(tnn.Sequential(
                    up, tnn.BatchNorm2d(cout, eps=1e-3, momentum=0.01),
                    tnn.ReLU()))
            self.deblocks = tnn.ModuleList(blocks)

        def forward(self, feats):
            return torch.cat([b(f) for b, f in zip(self.deblocks, feats)], 1)

    tm = TorchSECONDFPN().eval()
    _randomize_bn_stats(tm)
    feats = [rng.normal(size=(1, 16, 16, 16)).astype(np.float32),
             rng.normal(size=(1, 8, 8, 32)).astype(np.float32),
             rng.normal(size=(1, 4, 4, 64)).astype(np.float32)]
    with torch.no_grad():
        ref = tm([torch.tensor(f.transpose(0, 3, 1, 2)) for f in feats]).numpy()

    fm = SECONDFPN((8, 8, 8), (0.5, 1, 2))
    variables = fm.init(jax.random.PRNGKey(0),
                        [jnp.asarray(f) for f in feats], False)
    sd = {"model.backbone.img_neck." + k: v.numpy()
          for k, v in tm.state_dict().items()
          if "num_batches_tracked" not in k}
    wrapped = {
        "params": {"backbone": {"img_neck": variables["params"]}},
        "batch_stats": {"backbone": {"img_neck": variables["batch_stats"]}},
    }
    new_vars, used, missing = convert_state_dict(sd, wrapped, strict=True)
    assert not missing
    converted = {
        "params": new_vars["params"]["backbone"]["img_neck"],
        "batch_stats": new_vars["batch_stats"]["backbone"]["img_neck"],
    }
    out = fm.apply(converted, [jnp.asarray(f) for f in feats], False)
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref,
                               rtol=1e-3, atol=1e-3)


def test_mscthead_parity_through_converter(rng):
    """Module-level MSCThead numeric parity (cheap insurance on top of the
    e2e BSM proof): a randomized torch MSCThead (tests/torch_oracle.py
    transcription of bsm_lss_fpn.py:214-320) converted through the mapper
    must match the flax module's four outputs."""
    sys.path.insert(0, os.path.dirname(__file__))
    from torch_oracle import TorchMSCThead, randomize_params

    m0, m1, d, s, ctx = 16, 8, 6, 4, 10
    tm = TorchMSCThead([12, 12], [m0, m1], d, s, ctx).eval()
    randomize_params(tm, seed=5, scale=0.5)

    f16 = rng.normal(size=(2, 8, 12, 12)).astype(np.float32)
    f8 = rng.normal(size=(2, 16, 24, 12)).astype(np.float32)
    mlp = rng.normal(size=(2, 27)).astype(np.float32)
    with torch.no_grad():
        ref = tm([torch.tensor(f16.transpose(0, 3, 1, 2)),
                  torch.tensor(f8.transpose(0, 3, 1, 2))], torch.tensor(mlp))

    fm = MSCThead(mid_channels=(m0, m1), depth_channels=d,
                  semantic_channels=s, context_channels=ctx)
    variables = fm.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        [jnp.asarray(f16), jnp.asarray(f8)], jnp.asarray(mlp), False)
    sd = {"model.backbone.height_net." + k: v.numpy()
          for k, v in tm.state_dict().items()
          if "num_batches_tracked" not in k}
    wrapped = {
        "params": {"backbone": {"height_net": variables["params"]}},
        "batch_stats": {"backbone": {"height_net": variables["batch_stats"]}},
    }
    new_vars, used, missing = convert_state_dict(
        sd, wrapped, strict=False, is_bsm=True)
    # unmapped flax paths must be zero-init biases torch lacks; unused torch
    # keys must be the dead depth_head0 decoder
    for path in missing:
        assert path[-1] == "bias", path
    unused = {k for k in sd if k not in used}
    assert all(".depth_head0." in k for k in unused), unused
    converted = {
        "params": new_vars["params"]["backbone"]["height_net"],
        "batch_stats": new_vars["batch_stats"]["backbone"]["height_net"],
    }
    outs = fm.apply(converted, [jnp.asarray(f16), jnp.asarray(f8)],
                    jnp.asarray(mlp), False)
    names = ("depth1", "semantic1", "context1", "semantic0")
    for name, o, r in zip(names, outs, ref):
        np.testing.assert_allclose(
            np.asarray(o).transpose(0, 3, 1, 2), np.asarray(r),
            rtol=2e-3, atol=2e-3, err_msg=name)


def test_resnet50_bottleneck_parity_through_converter(rng):
    """Bottleneck (r50/r101 production backbone) parity via the oracle's
    TorchResNet(depth=50) through the weight converter — the production
    graphs use mmdet bottleneck ResNets
    (/root/reference/exps/bevheight/dair-v2x/...r101...py:44-52)."""
    from torch_oracle import TorchResNet, randomize_params

    tm = TorchResNet(depth=50).eval()
    randomize_params(tm, seed=5, scale=0.3)
    x = rng.normal(size=(1, 64, 96, 3)).astype(np.float32)
    with torch.no_grad():
        ref = [o.numpy() for o in tm(torch.tensor(x.transpose(0, 3, 1, 2)))]

    fm = ResNet(50, out_indices=(0, 1, 2, 3))
    variables = fm.init(jax.random.PRNGKey(0), jnp.asarray(x), False)
    sd = {"model.backbone.img_backbone." + k: v.numpy()
          for k, v in tm.state_dict().items()
          if "num_batches_tracked" not in k}
    wrapped = {
        "params": {"backbone": {"img_backbone": variables["params"]}},
        "batch_stats": {"backbone": {"img_backbone": variables["batch_stats"]}},
    }
    new_vars, used, missing = convert_state_dict(sd, wrapped, strict=True)
    assert not missing and len(used) == len(sd)
    converted = {
        "params": new_vars["params"]["backbone"]["img_backbone"],
        "batch_stats": new_vars["batch_stats"]["backbone"]["img_backbone"],
    }
    outs = fm.apply(converted, jnp.asarray(x), False)
    for o, r in zip(outs, ref):
        np.testing.assert_allclose(
            np.asarray(o).transpose(0, 3, 1, 2), r, rtol=1e-3, atol=1e-3)
