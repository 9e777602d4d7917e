#!/usr/bin/env python
"""Convert reference PyTorch checkpoints to sgv3d_tpu flax variables.

Maps the reference's Lightning state_dict names (mmdet/mmdet3d/torch
conventions: `model.backbone.img_backbone.layer1.0.conv1.weight`, neck
`deblocks.N.{0,1}`, HeightNet/MSCThead submodules, CenterHead
`task_heads.N.<branch>.{0.conv,0.bn,1}`) onto our flax param/batch_stats
trees, handling layout transposes:
  conv     OIHW -> HWIO
  deconv   IOHW -> HWIO (flax ConvTranspose layout)
  linear   (out, in) -> (in, out)
  BN       weight/bias -> scale/bias; running stats -> batch_stats

Usage:
  python tools/convert_weights.py --ckpt model.ckpt --exp sgv3d_r50_128 \
      --out converted.msgpack
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _t_conv(w):
    return np.transpose(np.asarray(w), (2, 3, 1, 0))  # OIHW -> HWIO


def _t_deconv(w):
    # torch ConvTranspose2d weight (in, out, kh, kw) -> flax ConvTranspose
    # kernel (kh, kw, in, out) with a spatial flip (flax's conv_transpose
    # correlates where torch convolves; verified numerically in tests).
    w = np.asarray(w)[:, :, ::-1, ::-1]
    return np.ascontiguousarray(np.transpose(w, (2, 3, 0, 1)))


def _t_linear(w):
    return np.transpose(np.asarray(w), (1, 0))


def _resnet_rules(flax_prefix, torch_prefix, mmdet_stem=True):
    """Yield (flax_path_suffix_matcher, torch_key_fn) rules for a ResNet."""
    stem_conv = "conv1" if mmdet_stem else "conv1"
    rules = []

    def tr(path):
        # path like ('layer1_block0', 'conv1', 'kernel')
        name = path[0]
        if name == "stem_conv":
            return f"{torch_prefix}.{stem_conv}.weight", _t_conv
        if name == "stem_bn":
            return _bn_key(f"{torch_prefix}.bn1", path[-1])
        if name.startswith("layer"):
            layer = name.split("_")[0]  # layer1
            block = name.split("block")[1]
            mod = path[1]
            if mod.startswith("conv"):
                return (f"{torch_prefix}.{layer}.{block}.{mod}.weight",
                        _t_conv)
            if mod.startswith("bn"):
                return _bn_key(f"{torch_prefix}.{layer}.{block}.{mod}",
                               path[-1])
            if mod == "downsample_conv":
                return (f"{torch_prefix}.{layer}.{block}.downsample.0.weight",
                        _t_conv)
            if mod == "downsample_bn":
                return _bn_key(
                    f"{torch_prefix}.{layer}.{block}.downsample.1", path[-1])
        return None
    rules.append((flax_prefix, tr))
    return rules


def _bn_key(torch_prefix, leaf):
    mapping = {"scale": ("weight", np.asarray),
               "bias": ("bias", np.asarray),
               "mean": ("running_mean", np.asarray),
               "var": ("running_var", np.asarray)}
    suffix, fn = mapping[leaf]
    return f"{torch_prefix}.{suffix}", fn


def _secondfpn_key(path, torch_prefix):
    # path: ('deblock0_deconv'|'deblock0_conv'|'deblock0_bn', leaf)
    name = path[0]
    idx = name.split("_")[0].replace("deblock", "")
    kind = name.split("_")[1]
    if kind in ("deconv", "conv"):
        tfn = _t_deconv if kind == "deconv" else _t_conv
        if path[-1] == "kernel":
            return f"{torch_prefix}.deblocks.{idx}.0.weight", tfn
        return f"{torch_prefix}.deblocks.{idx}.0.bias", np.asarray
    return _bn_key(f"{torch_prefix}.deblocks.{idx}.1", path[-1])


def _conv_or_dense(path, torch_key_base):
    leaf = path[-1]
    if leaf == "kernel":
        return torch_key_base + ".weight", (
            _t_linear if len(path) >= 2 and path[-2].startswith("fc")
            else _t_conv)
    return torch_key_base + ".bias", np.asarray


def _heightnet_key(path):
    """HeightNet flax path -> reference torch name
    (/root/reference/layers/backbones/lss_fpn.py:162-205)."""
    base = "model.backbone.height_net"
    name = path[0]
    leaf = path[-1]
    if name == "mlp_bn":
        return _bn_key(f"{base}.bn", leaf)
    if name == "reduce_conv":
        if path[1] == "conv":
            return _conv_or_dense(path, f"{base}.reduce_conv.0")
        return _bn_key(f"{base}.reduce_conv.1", leaf)
    if name in ("context_mlp", "height_mlp"):
        fc = path[1]  # fc1 / fc2
        key, _ = _conv_or_dense(path, f"{base}.{name}.{fc}")
        return key, (_t_linear if leaf == "kernel" else np.asarray)
    if name in ("context_se", "height_se"):
        return _conv_or_dense(path, f"{base}.{name}.{path[1]}")
    if name == "context_conv":
        return _conv_or_dense(path, f"{base}.context_conv")
    if name.startswith("height_block"):
        i = int(name.replace("height_block", ""))
        mod = path[1]
        if mod.startswith("conv"):
            return f"{base}.height_conv.{i}.{mod}.weight", _t_conv
        if mod.startswith("bn"):
            return _bn_key(f"{base}.height_conv.{i}.{mod}", leaf)
        if mod == "downsample_conv":
            return f"{base}.height_conv.{i}.downsample.0.weight", _t_conv
        if mod == "downsample_bn":
            return _bn_key(f"{base}.height_conv.{i}.downsample.1", leaf)
    if name == "aspp":
        return _aspp_key(path[1:], f"{base}.height_conv.3")
    if name == "dcn":
        if path[1] == "offset_conv":
            return _conv_or_dense(path, f"{base}.height_conv.4.conv_offset")
        if leaf == "weight":
            return f"{base}.height_conv.4.weight", _t_conv
        return f"{base}.height_conv.4.bias", np.asarray
    if name == "height_layer":
        return _conv_or_dense(path, f"{base}.height_layer")
    return None


def _aspp_key(rest, torch_prefix):
    """ASPP flax path suffix -> torch name. The reference's ASPP
    (/root/reference/layers/backbones/lss_fpn.py:49-120) has aspp1..aspp4
    _ASPPModules (atrous_conv + bn), a global_avg_pool Sequential
    [AdaptiveAvgPool2d, Conv2d, BatchNorm2d, ReLU], then conv1/bn1."""
    mod, leaf = rest[0], rest[-1]
    if mod.endswith("_conv") and mod.startswith("aspp"):
        return f"{torch_prefix}.{mod[:-5]}.atrous_conv.weight", _t_conv
    if mod.endswith("_bn") and mod.startswith("aspp"):
        return _bn_key(f"{torch_prefix}.{mod[:-3]}.bn", leaf)
    if mod == "gap_conv":
        return f"{torch_prefix}.global_avg_pool.1.weight", _t_conv
    if mod == "gap_bn":
        return _bn_key(f"{torch_prefix}.global_avg_pool.2", leaf)
    if mod == "proj_conv":
        return f"{torch_prefix}.conv1.weight", _t_conv
    if mod == "proj_bn":
        return _bn_key(f"{torch_prefix}.bn1", leaf)
    return None


def _basicblock_key(rest, torch_prefix):
    """mmdet BasicBlock: conv1/bn1/conv2/bn2 (+ downsample.0/.1)."""
    mod, leaf = rest[0], rest[-1]
    if mod.startswith("conv"):
        return f"{torch_prefix}.{mod}.weight", _t_conv
    if mod.startswith("bn"):
        return _bn_key(f"{torch_prefix}.{mod}", leaf)
    if mod == "downsample_conv":
        return f"{torch_prefix}.downsample.0.weight", _t_conv
    if mod == "downsample_bn":
        return _bn_key(f"{torch_prefix}.downsample.1", leaf)
    return None


def _taskhead_key(rest, torch_prefix):
    """TaskHead (/root/reference/layers/backbones/bsm_lss_fpn.py:178-201):
    decoder Sequential = [BasicBlock, BasicBlock, Conv2d, BatchNorm2d, ReLU]
    plus optional 1x1 `head` conv. Flax: block1/block2/decoder_out/head."""
    mod = rest[0]
    if mod == "block1":
        return _basicblock_key(rest[1:], f"{torch_prefix}.decoder.0")
    if mod == "block2":
        return _basicblock_key(rest[1:], f"{torch_prefix}.decoder.1")
    if mod == "decoder_out":
        if rest[1] == "conv":
            return _conv_or_dense(rest, f"{torch_prefix}.decoder.2")
        return _bn_key(f"{torch_prefix}.decoder.3", rest[-1])
    if mod == "head":
        return _conv_or_dense(rest, f"{torch_prefix}.head")
    return None


def _taskfpn_key(rest, torch_prefix):
    """TaskFPN (bsm_lss_fpn.py:203-212): reduce_conv Conv2d + SABlock
    (attention = Sequential[Conv2d(bias=False), Sigmoid]; conv bias=False)."""
    mod = rest[0]
    if mod == "reduce_conv":
        return _conv_or_dense(rest, f"{torch_prefix}.reduce_conv")
    if mod == "self_attention":
        if rest[1] == "attention_conv":
            return (f"{torch_prefix}.self_attention.attention.0.weight",
                    _t_conv)
        if rest[1] == "conv":
            return f"{torch_prefix}.self_attention.conv.weight", _t_conv
    return None


def _mscthead_key(path):
    """MSCThead flax path -> reference torch name
    (/root/reference/layers/backbones/bsm_lss_fpn.py:214-320). The BSM
    backbone instantiates it as `self.height_net` (bsm_lss_fpn.py:380)."""
    base = "model.backbone.height_net"
    name = path[0]
    leaf = path[-1]
    if name == "mlp_bn":
        return _bn_key(f"{base}.bn", leaf)
    if name in ("reduce_conv0", "reduce_conv1", "context_conv0"):
        if path[1] == "conv":
            return _conv_or_dense(path, f"{base}.{name}.0")
        return _bn_key(f"{base}.{name}.1", leaf)
    if name in ("scale0_mlp", "scale1_mlp"):
        key, _ = _conv_or_dense(path, f"{base}.{name}.{path[1]}")
        return key, (_t_linear if leaf == "kernel" else np.asarray)
    if name in ("scale0_se", "scale1_se"):
        return _conv_or_dense(path, f"{base}.{name}.{path[1]}")
    if name == "aspp":
        return _aspp_key(path[1:], f"{base}.aspp")
    # `depth_head0` has no flax counterpart: its reference forward returns
    # the input unchanged (with_head=False + return_feat=True,
    # bsm_lss_fpn.py:195-201), so its checkpoint weights are dead and the
    # torch keys are intentionally left unused.
    if name in ("semantic_head0", "depth_head1", "semantic_head1"):
        return _taskhead_key(path[1:], f"{base}.{name}")
    if name in ("depth_fpn", "semantic_fpn", "context_fpn"):
        return _taskfpn_key(path[1:], f"{base}.{name}")
    if name == "context_conv1a":
        if path[1] == "conv":
            return _conv_or_dense(path, f"{base}.context_conv1.0")
        return _bn_key(f"{base}.context_conv1.1", leaf)
    if name == "context_conv1b":
        return _conv_or_dense(path, f"{base}.context_conv1.3")
    return None


def flax_path_to_torch(path, is_bsm: bool = False):
    """Full flax variable path (tuple of names) -> (torch key, transform).

    `is_bsm` selects the MSCThead mapping for `backbone.height_net` (the BSM
    backbone reuses the attribute name `height_net` for its MSCThead,
    bsm_lss_fpn.py:380; both modules contain an `aspp` child so the flax path
    alone cannot disambiguate)."""
    # path[0] in {'backbone', 'head'}; strip collection prefixes upstream.
    if path[0] == "backbone":
        sub = path[1]
        rest = path[2:]
        if sub == "img_backbone":
            for _, tr in _resnet_rules("", "model.backbone.img_backbone"):
                out = tr(rest)
                if out:
                    return out
        if sub in ("img_neck", "img_neck_16", "img_neck_8"):
            return _secondfpn_key(rest, f"model.backbone.{sub}")
        if sub == "height_net":
            return _mscthead_key(rest) if is_bsm else _heightnet_key(rest)
        if sub == "assist_layer":
            return _conv_or_dense(rest, "model.backbone.assist_layer")
    if path[0] == "head":
        sub = path[1]
        rest = path[2:]
        if sub == "trunk":
            for _, tr in _resnet_rules("", "model.head.trunk"):
                out = tr(rest)
                if out:
                    return out
        if sub == "neck":
            return _secondfpn_key(rest, "model.head.neck")
        if sub == "shared_conv":
            if rest[0] == "conv":
                return _conv_or_dense(rest, "model.head.shared_conv.conv")
            return _bn_key("model.head.shared_conv.bn", rest[-1])
        if sub.startswith("task"):
            # task{t}_{branch}: conv{i} ConvModule layers then 'final'
            tnum, branch = sub.replace("task", "").split("_", 1)
            base = f"model.head.task_heads.{tnum}.{branch}"
            mod = rest[0]
            if mod.startswith("conv"):
                i = int(mod.replace("conv", ""))
                if rest[1] == "conv":
                    return _conv_or_dense(rest, f"{base}.{i}.conv")
                return _bn_key(f"{base}.{i}.bn", rest[-1])
            if mod == "final":
                # final conv is the last entry of the sequential
                return _conv_or_dense(rest, f"{base}.1")
    return None


def convert_state_dict(state_dict: dict, variables: dict, strict=True,
                       is_bsm: bool = False):
    """Fill our flax `variables` ({'params', 'batch_stats'}) from a torch
    state_dict; returns (new_variables, used_keys, missing_paths)."""
    import jax

    used, missing = set(), []

    def fill(tree, collection):
        flat = jax.tree_util.tree_flatten_with_path(tree)[0]
        out = {}
        for keypath, val in flat:
            names = tuple(getattr(k, "key", str(k)) for k in keypath)
            mapped = flax_path_to_torch(names, is_bsm=is_bsm)
            if mapped is None:
                missing.append((collection,) + names)
                out[names] = val
                continue
            torch_key, tfn = mapped
            if torch_key not in state_dict:
                missing.append((collection,) + names)
                out[names] = val
                continue
            new = tfn(np.asarray(state_dict[torch_key]))
            assert new.shape == val.shape, (
                f"{torch_key} {new.shape} != {names} {val.shape}")
            used.add(torch_key)
            out[names] = new.astype(np.asarray(val).dtype)
        # rebuild nested dict
        nested = {}
        for names, val in out.items():
            d = nested
            for n in names[:-1]:
                d = d.setdefault(n, {})
            d[names[-1]] = val
        return nested

    new_vars = {
        "params": fill(variables["params"], "params"),
        "batch_stats": fill(variables.get("batch_stats", {}), "batch_stats"),
    }
    if strict and missing:
        raise KeyError(f"{len(missing)} unmapped flax paths, e.g. "
                       f"{missing[:5]}")
    return new_vars, used, missing


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True)
    p.add_argument("--exp", default="bevheight_dair_r50_128")
    p.add_argument("--out", required=True)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import torch
    from flax.serialization import msgpack_serialize

    from sgv3d_tpu.configs import get_exp
    from sgv3d_tpu.data.synthetic import make_batch
    from sgv3d_tpu.models.bev_height import BEVHeight

    ckpt = torch.load(args.ckpt, map_location="cpu")
    state_dict = ckpt.get("state_dict", ckpt)

    cfg = get_exp(args.exp)
    imgs, mats, *_ = make_batch(cfg, batch=1, num_objs=1)
    model = BEVHeight(cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(imgs), {k: jnp.asarray(v) for k, v in mats.items()},
        False)
    new_vars, used, missing = convert_state_dict(
        dict(state_dict), dict(variables), strict=False,
        is_bsm=cfg.backbone.is_bsm)
    print(f"mapped {len(used)} torch tensors; {len(missing)} flax paths "
          f"left at init")
    with open(args.out, "wb") as f:
        f.write(msgpack_serialize(new_vars))


if __name__ == "__main__":
    main()
