"""Torch->flax weight conversion: numerical layout checks + name coverage."""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import flax.linen as nn  # noqa: E402

from convert_weights import (  # noqa: E402
    _t_conv, _t_deconv, _t_linear, convert_state_dict, flax_path_to_torch)
from sgv3d_tpu.nn.blocks import conv as flax_conv  # noqa: E402

torch.manual_seed(0)


def test_conv_layout_matches(rng):
    tconv = torch.nn.Conv2d(3, 8, 3, stride=2, padding=1)
    x = rng.normal(size=(1, 10, 12, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tconv(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    m = flax_conv(8, 3, 2)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    variables = {"params": {
        "kernel": jnp.asarray(_t_conv(tconv.weight.detach().numpy())),
        "bias": jnp.asarray(tconv.bias.detach().numpy())}}
    out = np.asarray(m.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(out.transpose(0, 3, 1, 2), ref, rtol=1e-4,
                               atol=1e-4)


def test_deconv_layout_matches(rng):
    tdeconv = torch.nn.ConvTranspose2d(4, 6, 2, stride=2)
    x = rng.normal(size=(1, 5, 7, 4)).astype(np.float32)
    with torch.no_grad():
        ref = tdeconv(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    m = nn.ConvTranspose(6, (2, 2), strides=(2, 2), padding="VALID")
    variables = {"params": {
        "kernel": jnp.asarray(_t_deconv(tdeconv.weight.detach().numpy())),
        "bias": jnp.asarray(tdeconv.bias.detach().numpy())}}
    out = np.asarray(m.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(out.transpose(0, 3, 1, 2), ref, rtol=1e-4,
                               atol=1e-4)


def test_linear_layout_matches(rng):
    tl = torch.nn.Linear(5, 3)
    x = rng.normal(size=(2, 5)).astype(np.float32)
    with torch.no_grad():
        ref = tl(torch.tensor(x)).numpy()
    m = nn.Dense(3)
    variables = {"params": {
        "kernel": jnp.asarray(_t_linear(tl.weight.detach().numpy())),
        "bias": jnp.asarray(tl.bias.detach().numpy())}}
    out = np.asarray(m.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_bn_eval_matches(rng):
    tbn = torch.nn.BatchNorm2d(4).eval()
    with torch.no_grad():
        tbn.running_mean.copy_(torch.tensor(rng.normal(size=4).astype(np.float32)))
        tbn.running_var.copy_(torch.tensor(rng.random(4).astype(np.float32) + 0.5))
        tbn.weight.copy_(torch.tensor(rng.normal(size=4).astype(np.float32)))
        tbn.bias.copy_(torch.tensor(rng.normal(size=4).astype(np.float32)))
    x = rng.normal(size=(2, 6, 6, 4)).astype(np.float32)
    with torch.no_grad():
        ref = tbn(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    m = nn.BatchNorm(use_running_average=True, epsilon=1e-5)
    variables = {
        "params": {"scale": jnp.asarray(tbn.weight.detach().numpy()),
                   "bias": jnp.asarray(tbn.bias.detach().numpy())},
        "batch_stats": {"mean": jnp.asarray(tbn.running_mean.numpy()),
                        "var": jnp.asarray(tbn.running_var.numpy())},
    }
    out = np.asarray(m.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(out.transpose(0, 3, 1, 2), ref, rtol=1e-4,
                               atol=1e-4)


def test_name_mapping_spot_checks():
    key, fn = flax_path_to_torch(
        ("backbone", "img_backbone", "stem_conv", "kernel"))
    assert key == "model.backbone.img_backbone.conv1.weight"
    key, _ = flax_path_to_torch(
        ("backbone", "img_backbone", "layer2_block3", "conv3", "kernel"))
    assert key == "model.backbone.img_backbone.layer2.3.conv3.weight"
    key, _ = flax_path_to_torch(
        ("backbone", "img_backbone", "layer1_block0", "downsample_bn", "var"))
    assert key == "model.backbone.img_backbone.layer1.0.downsample.1.running_var"
    key, _ = flax_path_to_torch(
        ("backbone", "img_neck", "deblock2_deconv", "kernel"))
    assert key == "model.backbone.img_neck.deblocks.2.0.weight"
    key, _ = flax_path_to_torch(
        ("backbone", "height_net", "height_mlp", "fc1", "kernel"))
    assert key == "model.backbone.height_net.height_mlp.fc1.weight"
    key, _ = flax_path_to_torch(
        ("backbone", "height_net", "aspp", "aspp2_conv", "kernel"))
    assert key == ("model.backbone.height_net.height_conv.3.aspp2"
                   ".atrous_conv.weight")
    key, _ = flax_path_to_torch(
        ("head", "task3_heatmap", "final", "bias"))
    assert key == "model.head.task_heads.3.heatmap.1.bias"
    key, _ = flax_path_to_torch(
        ("head", "task0_reg", "conv0", "bn", "mean"))
    assert key == "model.head.task_heads.0.reg.0.bn.running_mean"


def _make_coverage_cfg(is_bsm: bool):
    from sgv3d_tpu.config import BackboneConfig, ExpConfig, HeadConfig, Task

    backbone = BackboneConfig(
        x_bound=(0.0, 25.6, 1.6), y_bound=(-12.8, 12.8, 1.6),
        d_bound=(-2.0, 0.0, 8), final_dim=(64, 96), output_channels=16,
        resnet_depth=50, img_neck_out_channels=(8, 8, 8, 8),
        height_net_mid_channels=(32, 16),
        semantic_channels=4, is_bsm=is_bsm)
    head = HeadConfig(
        tasks=(Task(("car",)), Task(("pedestrian", "cyclist"))),
        bev_backbone_in_channels=20 if is_bsm else 16,
        bev_backbone_base_channels=16,
        bev_neck_out_channels=(8, 8, 8, 8), share_conv_channels=16,
        point_cloud_range=(0, -12.8, -5, 25.6, 12.8, 3),
        grid_size=(64, 64, 1), voxel_size=(0.4, 0.4, 8), max_objs=8,
        max_per_task=16, post_max_size=8, nms_min_radius=(4.0, 0.5))
    return ExpConfig(name="conv_test", backbone=backbone, head=head,
                     classes=("car", "pedestrian", "cyclist"))


def _mapping_coverage_check(cfg, is_bsm: bool):
    """Every param/batch_stat of the model must map to a torch key, and a
    synthetic state_dict with those names fills the tree."""
    from sgv3d_tpu.data.synthetic import make_batch
    from sgv3d_tpu.models.bev_height import BEVHeight

    imgs, mats, *_ = make_batch(cfg, batch=1, num_objs=1)
    model = BEVHeight(cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(imgs), {k: jnp.asarray(v) for k, v in mats.items()},
        False)

    # collect required torch keys from the mapping
    state_dict = {}
    for collection in ("params", "batch_stats"):
        flat = jax.tree_util.tree_flatten_with_path(variables[collection])[0]
        for keypath, val in flat:
            names = tuple(getattr(k, "key", str(k)) for k in keypath)
            mapped = flax_path_to_torch(names, is_bsm=is_bsm)
            assert mapped is not None, (collection, names)
            torch_key, tfn = mapped
            # synthesize a torch tensor of the transposed-back shape
            arr = np.asarray(val)
            if tfn is _t_conv:
                src = np.random.default_rng(0).normal(
                    size=(arr.shape[3], arr.shape[2], arr.shape[0],
                          arr.shape[1])).astype(np.float32)
            elif tfn is _t_deconv:
                src = np.random.default_rng(0).normal(
                    size=(arr.shape[2], arr.shape[3], arr.shape[0],
                          arr.shape[1])).astype(np.float32)
            elif tfn is _t_linear:
                src = np.random.default_rng(0).normal(
                    size=(arr.shape[1], arr.shape[0])).astype(np.float32)
            else:
                src = np.random.default_rng(0).normal(
                    size=arr.shape).astype(np.float32)
            state_dict[torch_key] = src

    new_vars, used, missing = convert_state_dict(
        state_dict, dict(variables), strict=True, is_bsm=is_bsm)
    assert not missing
    assert len(used) == len(state_dict)
    # a converted conv actually changed from init
    k0 = np.asarray(new_vars["params"]["backbone"]["img_backbone"][
        "stem_conv"]["kernel"])
    assert not np.allclose(
        k0, np.asarray(variables["params"]["backbone"]["img_backbone"][
            "stem_conv"]["kernel"]))
    return state_dict


@pytest.mark.slow
def test_full_bevheight_mapping_coverage():
    _mapping_coverage_check(_make_coverage_cfg(is_bsm=False), is_bsm=False)


@pytest.mark.slow
def test_full_bsm_mapping_coverage():
    """BSM/SGV3D twin: every flax path of the MSCThead + two-neck backbone
    must map onto a reference torch key (bsm_lss_fpn.py:214-380 names)."""
    sd = _mapping_coverage_check(_make_coverage_cfg(is_bsm=True), is_bsm=True)
    # Spot-check that the synthesized keys use the reference module names.
    expect = [
        "model.backbone.height_net.reduce_conv0.0.weight",
        "model.backbone.height_net.bn.running_mean",
        "model.backbone.height_net.scale1_mlp.fc2.weight",
        "model.backbone.height_net.scale0_se.conv_expand.weight",
        "model.backbone.height_net.aspp.aspp3.atrous_conv.weight",
        "model.backbone.height_net.aspp.global_avg_pool.1.weight",
        "model.backbone.height_net.semantic_head0.head.weight",
        "model.backbone.height_net.depth_fpn.reduce_conv.weight",
        "model.backbone.height_net.semantic_fpn.self_attention.attention.0"
        ".weight",
        "model.backbone.height_net.context_fpn.self_attention.conv.weight",
        "model.backbone.height_net.depth_head1.decoder.3.running_var",
        "model.backbone.height_net.context_conv1.0.weight",
        "model.backbone.height_net.context_conv1.3.weight",
        "model.backbone.img_neck_16.deblocks.0.0.weight",
        "model.backbone.img_neck_8.deblocks.3.0.weight",
    ]
    for key in expect:
        assert key in sd, key


@pytest.mark.slow  # 58 s on the 1-core host
def test_msgpack_variables_round_trip(tmp_path):
    """Converter-format msgpack files load back through api.load_variables
    and produce identical predictions."""
    import jax
    import jax.numpy as jnp
    from flax.serialization import msgpack_serialize

    from sgv3d_tpu.data.synthetic import make_batch
    from sgv3d_tpu.models.bev_height import BEVHeight
    from tests.tiny_configs import tiny_exp

    cfg = tiny_exp(False)
    imgs, mats, *_ = make_batch(cfg, batch=1, num_objs=2)
    model = BEVHeight(cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(imgs), {k: jnp.asarray(v) for k, v in mats.items()},
        False)
    path = tmp_path / "weights.msgpack"
    with open(path, "wb") as f:
        f.write(msgpack_serialize(
            jax.tree_util.tree_map(np.asarray, dict(variables))))

    from sgv3d_tpu.api import BEVHeightPredictor, load_variables
    loaded = load_variables(cfg, str(path))
    p1 = BEVHeightPredictor(cfg, variables, use_bf16=False)(imgs, mats)
    p2 = BEVHeightPredictor(cfg, loaded, use_bf16=False)(imgs, mats)
    np.testing.assert_allclose(p2[0][0], p1[0][0], atol=1e-6)
