"""Faithful pure-torch rebuild of the reference BEVHeight (non-BSM) inference
graph, used as the end-to-end parity oracle.

Module/attribute names reproduce the reference state_dict keys exactly
(`backbone.img_backbone.*`, `backbone.img_neck.deblocks.*`,
`backbone.height_net.*`, `head.trunk.*`, `head.task_heads.*`), so
`tools/convert_weights.py` can map this oracle's weights onto the flax model.

Numerics transcribed from:
  HeightNet / Mlp / SELayer / ASPP:  /root/reference/layers/backbones/lss_fpn.py:18-250
  frustum (DID) / height2localtion / get_geometry:  lss_fpn.py:325-401
  voxel pooling semantics:  /root/reference/ops/voxel_pooling/src/voxel_pooling_forward_cuda.cu:9-56
  head (trunk/neck/separate heads):  /root/reference/layers/heads/bev_height_head.py:31-111
  decode + circle NMS:  mmdet3d CenterHead/CenterPointBBoxCoder semantics as
  configured at /root/reference/exps/sgv3d/...r50...py:131-166
"""
from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


# ---------------------------------------------------------------------------
# Building blocks (reference names)
# ---------------------------------------------------------------------------

class TorchBasicBlock(nn.Module):
    def __init__(self, cin, planes, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, planes, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.downsample = None
        if stride != 1 or cin != planes:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, planes, 1, stride, bias=False),
                nn.BatchNorm2d(planes))

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        out = torch.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return torch.relu(out + idt)


class TorchBottleneck(nn.Module):
    """mmdet/torchvision 'pytorch'-style bottleneck: 1x1 -> 3x3(stride) ->
    1x1(x4 expansion); stride lives on conv2
    (mmdet ResNet as configured at
    /root/reference/exps/bevheight/dair-v2x/...r101...py:44-52)."""

    def __init__(self, cin, planes, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.downsample = None
        if stride != 1 or cin != planes * 4:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, planes * 4, 1, stride, bias=False),
                nn.BatchNorm2d(planes * 4))

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        out = torch.relu(self.bn1(self.conv1(x)))
        out = torch.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        return torch.relu(out + idt)


STAGE_BLOCKS = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3), 50: (3, 4, 6, 3),
                101: (3, 4, 23, 3), 152: (3, 8, 36, 3)}


class TorchResNet(nn.Module):
    """mmdet-style ResNet (BasicBlock for depth<50, Bottleneck for >=50),
    stem 7x7/2 + optional maxpool."""

    def __init__(self, cin=3, base=64, stages=4, strides=(1, 2, 2, 2),
                 maxpool=True, depth=18):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, base, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(base)
        self.maxpool = nn.MaxPool2d(3, 2, 1) if maxpool else None
        self.num_stages = stages
        bottleneck = depth >= 50
        c = base
        for li in range(stages):
            planes = base * 2 ** li
            blocks = []
            for b in range(STAGE_BLOCKS[depth][li]):
                s = strides[li] if b == 0 else 1
                if bottleneck:
                    blocks.append(TorchBottleneck(c, planes, s))
                    c = planes * 4
                else:
                    blocks.append(TorchBasicBlock(c, planes, s))
                    c = planes
            setattr(self, f"layer{li + 1}", nn.Sequential(*blocks))

    def forward(self, x):
        x = torch.relu(self.bn1(self.conv1(x)))
        if self.maxpool is not None:
            x = self.maxpool(x)
        outs = []
        for li in range(self.num_stages):
            x = getattr(self, f"layer{li + 1}")(x)
            outs.append(x)
        return outs


class TorchSECONDFPN(nn.Module):
    def __init__(self, cins, strides, couts):
        super().__init__()
        blocks = []
        for cin, s, cout in zip(cins, strides, couts):
            if s >= 1:
                up = nn.ConvTranspose2d(cin, cout, int(s), int(s))
            else:
                k = int(round(1 / s))
                up = nn.Conv2d(cin, cout, k, k)
            blocks.append(nn.Sequential(
                up, nn.BatchNorm2d(cout, eps=1e-3, momentum=0.01), nn.ReLU()))
        self.deblocks = nn.ModuleList(blocks)

    def forward(self, feats):
        return torch.cat([b(f) for b, f in zip(self.deblocks, feats)], 1)


class TorchMlp(nn.Module):
    def __init__(self, cin, hidden, cout):
        super().__init__()
        self.fc1 = nn.Linear(cin, hidden)
        self.fc2 = nn.Linear(hidden, cout)

    def forward(self, x):
        return self.fc2(torch.relu(self.fc1(x)))


class TorchSELayer(nn.Module):
    def __init__(self, channels):
        super().__init__()
        self.conv_reduce = nn.Conv2d(channels, channels, 1, bias=True)
        self.conv_expand = nn.Conv2d(channels, channels, 1, bias=True)

    def forward(self, x, x_se):
        x_se = self.conv_expand(torch.relu(self.conv_reduce(x_se)))
        return x * torch.sigmoid(x_se)


class _TorchASPPModule(nn.Module):
    def __init__(self, cin, cout, k, padding, dilation):
        super().__init__()
        self.atrous_conv = nn.Conv2d(cin, cout, k, 1, padding,
                                     dilation, bias=False)
        self.bn = nn.BatchNorm2d(cout)

    def forward(self, x):
        return torch.relu(self.bn(self.atrous_conv(x)))


class TorchASPP(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.aspp1 = _TorchASPPModule(c, c, 1, 0, 1)
        self.aspp2 = _TorchASPPModule(c, c, 3, 6, 6)
        self.aspp3 = _TorchASPPModule(c, c, 3, 12, 12)
        self.aspp4 = _TorchASPPModule(c, c, 3, 18, 18)
        self.global_avg_pool = nn.Sequential(
            nn.AdaptiveAvgPool2d((1, 1)), nn.Conv2d(c, c, 1, bias=False),
            nn.BatchNorm2d(c), nn.ReLU())
        self.conv1 = nn.Conv2d(5 * c, c, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(c)

    def forward(self, x):
        xs = [self.aspp1(x), self.aspp2(x), self.aspp3(x), self.aspp4(x)]
        g = self.global_avg_pool(x)
        g = F.interpolate(g, size=x.shape[2:], mode="bilinear",
                          align_corners=True)
        out = torch.relu(self.bn1(self.conv1(torch.cat(xs + [g], 1))))
        return out  # dropout is identity in eval


class TorchDCN(nn.Module):
    """mmcv DeformConv2dPack (DCNv1) equivalent: conv_offset + bilinear taps.

    Bilinear semantics as mmcv's dmcn_im2col_bilinear: zero outside
    (-1, H) x (-1, W), zero-weight out-of-range corners. No bias (mmcv DCNv1
    asserts bias=False).
    """

    def __init__(self, c, k=3, groups=4):
        super().__init__()
        self.k, self.groups = k, groups
        self.weight = nn.Parameter(torch.zeros(c, c // groups, k, k))
        self.conv_offset = nn.Conv2d(c, 2 * k * k, k, 1, k // 2)

    def forward(self, x):
        b, cin, h, w = x.shape
        k, g = self.k, self.groups
        pad = k // 2
        taps = k * k
        offset = self.conv_offset(x)  # (B, 2*taps, H, W), (dy, dx) pairs
        off = offset.permute(0, 2, 3, 1).reshape(b, h, w, taps, 2)
        base_y = torch.arange(h, dtype=x.dtype).view(1, h, 1, 1)
        base_x = torch.arange(w, dtype=x.dtype).view(1, 1, w, 1)
        tap_dy = (torch.arange(taps) // k - pad).to(x.dtype).view(1, 1, 1, -1)
        tap_dx = (torch.arange(taps) % k - pad).to(x.dtype).view(1, 1, 1, -1)
        py = base_y + tap_dy + off[..., 0]  # (B, H, W, taps)
        px = base_x + tap_dx + off[..., 1]

        y0 = torch.floor(py)
        x0 = torch.floor(px)
        wy = py - y0
        wx = px - x0
        inside = (py > -1) & (py < h) & (px > -1) & (px < w)
        xf = x.reshape(b, cin, h * w)
        sampled = torch.zeros(b, h, w, taps, cin, dtype=x.dtype)
        for dy in (0, 1):
            for dx in (0, 1):
                yy = y0 + dy
                xx = x0 + dx
                weight = ((1 - wy) if dy == 0 else wy) * \
                         ((1 - wx) if dx == 0 else wx)
                ok = (yy >= 0) & (yy <= h - 1) & (xx >= 0) & (xx <= w - 1)
                yi = yy.clamp(0, h - 1).long()
                xi = xx.clamp(0, w - 1).long()
                idx = (yi * w + xi).reshape(b, 1, -1).expand(b, cin, -1)
                vals = torch.gather(xf, 2, idx).reshape(b, cin, h, w, taps)
                vals = vals.permute(0, 2, 3, 4, 1)
                sampled = sampled + vals * (weight * ok * inside).unsqueeze(-1)
        # grouped contraction: weight (cout, cin/g, k, k)
        cout = self.weight.shape[0]
        og, cg = cout // g, cin // g
        sg = sampled.reshape(b, h, w, taps, g, cg)
        wg = self.weight.reshape(g, og, cg, taps)
        out = torch.einsum("bhwtgc,goct->bhwgo", sg, wg)
        return out.reshape(b, h, w, cout).permute(0, 3, 1, 2)


class TorchHeightNet(nn.Module):
    def __init__(self, cin, mid, ctx, d):
        super().__init__()
        self.reduce_conv = nn.Sequential(
            nn.Conv2d(cin, mid, 3, 1, 1), nn.BatchNorm2d(mid),
            nn.ReLU(inplace=True))
        self.context_conv = nn.Conv2d(mid, ctx, 1)
        self.bn = nn.BatchNorm1d(27)
        self.height_mlp = TorchMlp(27, mid, mid)
        self.height_se = TorchSELayer(mid)
        self.context_mlp = TorchMlp(27, mid, mid)
        self.context_se = TorchSELayer(mid)
        self.height_conv = nn.Sequential(
            TorchBasicBlock(mid, mid), TorchBasicBlock(mid, mid),
            TorchBasicBlock(mid, mid), TorchASPP(mid), TorchDCN(mid, 3, 4))
        self.height_layer = nn.Conv2d(mid, d, 1)

    def forward(self, x, mlp_input):
        mlp_input = self.bn(mlp_input)
        x = self.reduce_conv(x)
        ctx_se = self.context_mlp(mlp_input)[..., None, None]
        context = self.context_conv(self.context_se(x, ctx_se))
        h_se = self.height_mlp(mlp_input)[..., None, None]
        height = self.height_layer(self.height_conv(self.height_se(x, h_se)))
        return torch.cat([height, context], dim=1)


def conv_module(cin, cout, k):
    """mmdet ConvModule(conv, BN, ReLU); bias='auto' -> False with norm."""

    class CM(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv = nn.Conv2d(cin, cout, k, 1, k // 2, bias=False)
            self.bn = nn.BatchNorm2d(cout)

        def forward(self, x):
            return torch.relu(self.bn(self.conv(x)))

    return CM()




class TorchBEVHead(nn.Module):
    def __init__(self, head_cfg):
        super().__init__()
        cfg = head_cfg
        cin = cfg.bev_backbone_in_channels
        base = cfg.bev_backbone_base_channels
        self.trunk = TorchResNet(cin=cin, base=base, stages=3,
                                 strides=(1, 2, 2), maxpool=False)
        trunk_out = [base, base * 2, base * 4]
        self.neck = TorchSECONDFPN([cin] + trunk_out,
                                   cfg.bev_neck_upsample_strides,
                                   cfg.bev_neck_out_channels)
        self.shared_conv = conv_module(sum(cfg.bev_neck_out_channels),
                                       cfg.share_conv_channels, 3)
        self.task_heads = nn.ModuleList()
        for task in cfg.tasks:
            branches = {}
            for name, (out_ch, num_conv) in cfg.common_heads:
                branches[name] = nn.Sequential(
                    conv_module(cfg.share_conv_channels, 64,
                                cfg.final_kernel),
                    nn.Conv2d(64, out_ch, cfg.final_kernel, 1,
                              cfg.final_kernel // 2))
            branches["heatmap"] = nn.Sequential(
                conv_module(cfg.share_conv_channels, 64, cfg.final_kernel),
                nn.Conv2d(64, task.num_classes, cfg.final_kernel, 1,
                          cfg.final_kernel // 2))
            holder = nn.Module()
            for name, mod in branches.items():
                holder.add_module(name, mod)
            self.task_heads.append(holder)
        self.branch_names = [n for n, _ in cfg.common_heads] + ["heatmap"]

    def forward(self, bev):
        feats = [bev] + self.trunk(bev)
        x = self.shared_conv(self.neck(feats))
        outs = []
        for holder in self.task_heads:
            outs.append({n: getattr(holder, n)(x) for n in self.branch_names})
        return outs


class TorchBEVHeight(nn.Module):
    """Reference BEVHeight inference graph; state_dict keys match the
    reference checkpoints modulo the `model.` Lightning prefix."""

    def __init__(self, cfg):
        super().__init__()
        b = cfg.backbone
        self.cfg = cfg
        backbone = nn.Module()
        backbone.img_backbone = TorchResNet(
            cin=3, base=64, stages=4, strides=(1, 2, 2, 2), maxpool=True,
            depth=b.resnet_depth)
        neck_in = list(b.resnet_out_channels)
        backbone.img_neck = TorchSECONDFPN(
            neck_in, (0.25, 0.5, 1, 2), b.img_neck_out_channels)
        backbone.height_net = TorchHeightNet(
            sum(b.img_neck_out_channels), b.height_net_mid_channels[0],
            b.output_channels, b.num_height_bins)
        backbone.assist_layer = nn.Conv2d(
            sum(b.img_neck_out_channels), 256, 1)
        self.backbone = backbone
        self.head = TorchBEVHead(cfg.head)

    def forward(self, imgs, mats):
        """imgs (B, 3, H, W) float32; mats: numpy dict from make_batch."""
        cfg = self.cfg.backbone
        bsz = imgs.shape[0]
        d = cfg.num_height_bins
        feats = self.backbone.img_backbone(imgs)
        feat = self.backbone.img_neck(feats)
        mlp_input = build_mlp_input(mats)
        out = self.backbone.height_net(feat, mlp_input)
        height = out[:, :d].softmax(1)
        context = out[:, d:d + cfg.output_channels]

        cell = torch_cell_index(cfg, mats)  # (B, D*fH*fW) int64
        lifted = height.unsqueeze(1) * context.unsqueeze(2)  # (B, C, D, fH, fW)
        c = cfg.output_channels
        pts = lifted.permute(0, 2, 3, 4, 1).reshape(bsz, -1, c)
        grid = cfg.voxel_grid
        num_y, num_x = int(grid.voxel_num[1]), int(grid.voxel_num[0])
        bev = torch.zeros(bsz, num_y * num_x + 1, c)
        bev.scatter_add_(1, cell.unsqueeze(-1).expand_as(pts), pts)
        bev = bev[:, :num_y * num_x].reshape(bsz, num_y, num_x, c)
        bev = bev.permute(0, 3, 1, 2).contiguous()
        return self.head(bev)


# ---------------------------------------------------------------------------
# BSM / SGV3D modules (torch transcription of bsm_lss_fpn.py:151-614)
# ---------------------------------------------------------------------------

class TorchSABlock(nn.Module):
    """Spatial attention block (bsm_lss_fpn.py:151-160): conv(x) gated by
    sigmoid(attention(y)); both convs 3x3 bias-free."""

    def __init__(self, cin, cout):
        super().__init__()
        self.attention = nn.Sequential(
            nn.Conv2d(cin, cout, 3, padding=1, bias=False), nn.Sigmoid())
        self.conv = nn.Conv2d(cin, cout, 3, padding=1, bias=False)

    def forward(self, x, y):
        return torch.mul(self.conv(x), self.attention(y))


class TorchTaskHead(nn.Module):
    """TaskHead (bsm_lss_fpn.py:178-201). Forward semantics reproduced
    exactly, including the quirk that `with_head=False` + `return_feat=True`
    returns the input UNCHANGED (the decoder is dead weight)."""

    def __init__(self, mid_channels, out_channels, with_head=True):
        super().__init__()
        self.with_head = with_head
        self.decoder = nn.Sequential(
            TorchBasicBlock(mid_channels, mid_channels),
            TorchBasicBlock(mid_channels, mid_channels),
            nn.Conv2d(mid_channels, mid_channels, 3, 1, 1),
            nn.BatchNorm2d(mid_channels),
            nn.ReLU(inplace=True))
        if with_head:
            self.head = nn.Conv2d(mid_channels, out_channels, 1)

    def forward(self, feat, return_feat=True):
        if return_feat:
            if self.with_head:
                feat = self.decoder(feat)
                return self.head(feat), feat
            return feat
        return self.head(self.decoder(feat))


class TorchTaskFPN(nn.Module):
    """TaskFPN (bsm_lss_fpn.py:203-212): x2 bilinear upsample + 3x3 reduce
    (bias=True), residual spatial attention from the fine scale."""

    def __init__(self, cin, cout):
        super().__init__()
        self.reduce_conv = nn.Conv2d(cin, cout, 3, 1, 1)
        self.self_attention = TorchSABlock(cout, cout)

    def forward(self, feat0, feat1):
        feat0 = self.reduce_conv(F.interpolate(
            feat0, scale_factor=2, mode="bilinear", align_corners=False))
        return feat0 + self.self_attention(feat1, feat0)


class TorchMSCThead(nn.Module):
    """MSCThead (bsm_lss_fpn.py:214-320): two-scale multi-task image head.
    Attribute names match the reference state_dict keys exactly."""

    def __init__(self, in_channels, mid_channels, depth_channels,
                 semantic_channels, context_channels):
        super().__init__()
        m0, m1 = mid_channels

        def cbr(cin, cout):
            return nn.Sequential(nn.Conv2d(cin, cout, 3, 1, 1),
                                 nn.BatchNorm2d(cout), nn.ReLU(inplace=True))

        self.reduce_conv0 = cbr(in_channels[0], m0)
        self.reduce_conv1 = cbr(in_channels[1], m1)
        self.bn = nn.BatchNorm1d(27)
        self.scale0_mlp = TorchMlp(27, m0, m0)
        self.scale1_mlp = TorchMlp(27, m1, m1)
        self.scale0_se = TorchSELayer(m0)
        self.scale1_se = TorchSELayer(m1)
        self.aspp = TorchASPP(m0)
        # stage one; depth_head0's decoder is dead weight (never run)
        self.depth_head0 = TorchTaskHead(m0, depth_channels, with_head=False)
        self.semantic_head0 = TorchTaskHead(m0, semantic_channels)
        self.context_conv0 = cbr(m0, m0)
        # combine information
        self.depth_fpn = TorchTaskFPN(m0, m1)
        self.semantic_fpn = TorchTaskFPN(m0, m1)
        self.context_fpn = TorchTaskFPN(m0, m1)
        # stage two
        self.depth_head1 = TorchTaskHead(m1, depth_channels)
        self.semantic_head1 = TorchTaskHead(m1, semantic_channels)
        self.context_conv1 = nn.Sequential(
            nn.Conv2d(m1, m1, 3, 1, 1), nn.BatchNorm2d(m1),
            nn.ReLU(inplace=True),
            nn.Conv2d(m1, context_channels, 1))

    def forward(self, feats, mlp_input):
        """feats: [scale0 (BN, C, H16, W16), scale1 (BN, C, H8, W8)];
        mlp_input: (BN, 27) pre-BN camera vector (build_mlp_input)."""
        mlp_input = self.bn(mlp_input)
        scale0_feat = self.reduce_conv0(feats[0])
        scale1_feat = self.reduce_conv1(feats[1])
        scale0_se = self.scale0_mlp(mlp_input)[..., None, None]
        scale1_se = self.scale1_mlp(mlp_input)[..., None, None]
        scale0_feat = self.scale0_se(scale0_feat, scale0_se)
        scale1_feat = self.scale1_se(scale1_feat, scale1_se)
        scale0_feat = self.aspp(scale0_feat)
        # stage one (depth_head0 returns its input unchanged)
        depth_feat = self.depth_head0(scale0_feat)
        semantic0, semantic_feat = self.semantic_head0(scale0_feat)
        context_feat = self.context_conv0(scale0_feat)
        # combine information
        depth_feat = self.depth_fpn(depth_feat, scale1_feat)
        semantic_feat = self.semantic_fpn(semantic_feat, scale1_feat)
        context_feat = self.context_fpn(context_feat, scale1_feat)
        # stage two
        depth1 = self.depth_head1(depth_feat, return_feat=False)
        semantic1 = self.semantic_head1(semantic_feat, return_feat=False)
        context1 = self.context_conv1(context_feat)
        return depth1, semantic1, context1, semantic0


class TorchBSMBEVHeight(nn.Module):
    """Reference SGV3D (is_bsm) inference graph: two-scale necks, MSCThead,
    background suppression, stride-8 lift (bsm_lss_fpn.py:485-560);
    state_dict keys match reference checkpoints modulo the `model.` prefix."""

    def __init__(self, cfg):
        super().__init__()
        b = cfg.backbone
        self.cfg = cfg
        backbone = nn.Module()
        backbone.img_backbone = TorchResNet(
            cin=3, base=64, stages=4, strides=(1, 2, 2, 2), maxpool=True,
            depth=b.resnet_depth)
        neck_in = list(b.resnet_out_channels)
        backbone.img_neck_16 = TorchSECONDFPN(
            neck_in, (0.25, 0.5, 1, 2), b.img_neck_out_channels)
        backbone.img_neck_8 = TorchSECONDFPN(
            neck_in, (0.5, 1, 2, 4), b.img_neck_out_channels)
        backbone.height_net = TorchMSCThead(
            [sum(b.img_neck_out_channels)] * 2, list(b.height_net_mid_channels),
            b.num_height_bins, b.semantic_channels, b.output_channels)
        self.backbone = backbone
        self.head = TorchBEVHead(cfg.head)

    def forward(self, imgs, mats):
        cfg = self.cfg.backbone
        bsz = imgs.shape[0]
        d = cfg.num_height_bins
        feats = self.backbone.img_backbone(imgs)
        f16 = self.backbone.img_neck_16(feats)
        f8 = self.backbone.img_neck_8(feats)
        mlp_input = build_mlp_input(mats)
        out = self.backbone.height_net([f16, f8], mlp_input)
        height = out[0].softmax(1)                      # (BN, D, H8, W8)
        semantic = out[1].softmax(1)                    # (BN, S, H8, W8)
        tran_feat = torch.cat((out[2], semantic), dim=1)
        mask = semantic[:, 0, :, :].unsqueeze(1) > 0.45  # background
        tran_feat = tran_feat * (1 - mask.int())

        cell = torch_cell_index(cfg, mats)  # (B, D*fH*fW) at stride 8
        lifted = height.unsqueeze(1) * tran_feat.unsqueeze(2)
        c = tran_feat.shape[1]
        pts = lifted.permute(0, 2, 3, 4, 1).reshape(bsz, -1, c)
        grid = cfg.voxel_grid
        num_y, num_x = int(grid.voxel_num[1]), int(grid.voxel_num[0])
        bev = torch.zeros(bsz, num_y * num_x + 1, c)
        bev.scatter_add_(1, cell.unsqueeze(-1).expand_as(pts), pts)
        bev = bev[:, :num_y * num_x].reshape(bsz, num_y, num_x, c)
        bev = bev.permute(0, 3, 1, 2).contiguous()
        return self.head(bev)


# ---------------------------------------------------------------------------
# Geometry (torch transcription of lss_fpn.py:325-401)
# ---------------------------------------------------------------------------

def build_mlp_input(mats):
    """27-dim camera vector, reference layout (lss_fpn.py:215-241)."""
    intrin = torch.tensor(mats["intrin_mats"][:, 0, 0])  # (B, 4, 4)
    ida = torch.tensor(mats["ida_mats"][:, 0, 0])
    s2e = torch.tensor(mats["sensor2ego_mats"][:, 0, 0])
    bda = torch.tensor(mats["bda_mat"])
    cols = torch.stack([
        intrin[:, 0, 0], intrin[:, 1, 1], intrin[:, 0, 2], intrin[:, 1, 2],
        ida[:, 0, 0], ida[:, 0, 1], ida[:, 0, 3],
        ida[:, 1, 0], ida[:, 1, 1], ida[:, 1, 3],
        bda[:, 0, 0], bda[:, 0, 1], bda[:, 1, 0], bda[:, 1, 1], bda[:, 2, 2],
    ], dim=-1)
    return torch.cat([cols, s2e[:, :3, :].reshape(-1, 12)], dim=-1).float()


def torch_frustum(cfg):
    ogf_h, ogf_w = cfg.final_dim
    # BSM lifts at half the nominal stride (bsm_lss_fpn.py:343
    # `downsample_factor // 2`); effective_downsample covers both cases.
    ds = cfg.effective_downsample
    f_h, f_w = ogf_h // ds, ogf_w // ds
    d0, d1, nbins = cfg.d_bound
    nbins = int(nbins)
    t = (np.arange(nbins) / nbins) ** 1.5
    d_coords = torch.tensor(d0 + t * (d1 - d0), dtype=torch.float)
    d_coords = d_coords.view(-1, 1, 1).expand(-1, f_h, f_w)
    x = torch.linspace(0, ogf_w - 1, f_w).view(1, 1, f_w).expand(
        nbins, f_h, f_w)
    y = torch.linspace(0, ogf_h - 1, f_h).view(1, f_h, 1).expand(
        nbins, f_h, f_w)
    return torch.stack([x, y, d_coords, torch.ones_like(d_coords)], -1)


def torch_cell_index(cfg, mats):
    """(B, D*fH*fW) flat BEV cell per frustum point; trash = num_y*num_x."""
    s2e = torch.tensor(mats["sensor2ego_mats"][:, 0, 0]).float()
    s2v = torch.tensor(mats["sensor2virtual_mats"][:, 0, 0]).float()
    intrin = torch.tensor(mats["intrin_mats"][:, 0, 0]).float()
    ida = torch.tensor(mats["ida_mats"][:, 0, 0]).float()
    ref_h = torch.tensor(mats["reference_heights"][:, 0, 0]).float()
    bda = torch.tensor(mats["bda_mat"]).float()
    bsz = s2e.shape[0]

    points = torch_frustum(cfg)[None].expand(bsz, -1, -1, -1, -1)
    points = points.unsqueeze(-1)  # (B, D, fH, fW, 4, 1)
    ida_inv = torch.inverse(ida).view(bsz, 1, 1, 1, 4, 4)
    points = ida_inv @ points
    # height2localtion
    height = ref_h.view(bsz, 1, 1, 1) - points[..., 2, 0]
    pc = points.clone()
    pc[..., 2, 0] = 10.0
    pc = torch.cat([pc[..., :2, :] * pc[..., 2:3, :], pc[..., 2:, :]], dim=-2)
    combine_virtual = s2v @ torch.inverse(intrin)
    pv = combine_virtual.view(bsz, 1, 1, 1, 4, 4) @ pc
    ratio = (height / pv[..., 1, 0]).view(bsz, *height.shape[1:], 1, 1)
    pts = pv * ratio
    pts[..., 3, 0] = 1.0
    combine_ego = s2e @ torch.inverse(s2v)
    pts = combine_ego.view(bsz, 1, 1, 1, 4, 4) @ pts
    pts = (bda.view(bsz, 1, 1, 1, 4, 4) @ pts)[..., :3, 0]

    grid = cfg.voxel_grid
    vc = torch.tensor(np.asarray(grid.voxel_coord))
    vs = torch.tensor(np.asarray(grid.voxel_size))
    vox = ((pts - (vc - vs / 2.0)) / vs).int()  # trunc toward zero
    num_x, num_y, num_z = [int(v) for v in grid.voxel_num]
    x, y, z = vox[..., 0], vox[..., 1], vox[..., 2]
    valid = ((x >= 0) & (x < num_x) & (y >= 0) & (y < num_y)
             & (z >= 0) & (z < num_z))
    flat = torch.where(valid, y * num_x + x,
                       torch.tensor(num_y * num_x, dtype=torch.int32))
    return flat.reshape(bsz, -1).long()


# ---------------------------------------------------------------------------
# Decode oracle (numpy, dynamic shapes)
# ---------------------------------------------------------------------------

def numpy_decode(cfg, preds):
    """mmdet3d CenterPoint decode + circle NMS, straightforward numpy.

    Returns per-sample (boxes (M, 9), scores (M,), labels (M,)).
    """
    bsz = preds[0]["heatmap"].shape[0]
    results = [[] for _ in range(bsz)]
    offset = 0
    for ti, task in enumerate(cfg.tasks):
        p = {k: np.asarray(v.detach()) for k, v in preds[ti].items()}
        hm = 1.0 / (1.0 + np.exp(-p["heatmap"]))  # (B, nc, H, W)
        b, nc, h, w = hm.shape
        k = min(cfg.max_per_task, h * w * nc)
        radius = float(cfg.nms_min_radius[ti])
        for bi in range(b):
            # top-k over (pos, class) pairs ordered like jax top_k on the
            # (H*W*nc) flattening of the NHWC heatmap
            flat = hm[bi].transpose(1, 2, 0).reshape(-1)
            order = np.argsort(-flat, kind="stable")[:k]
            scores = flat[order]
            cls = order % nc
            pos = order // nc
            ys, xs = (pos // w).astype(np.float64), (pos % w).astype(
                np.float64)

            def gat(name):
                t = p[name][bi].transpose(1, 2, 0).reshape(h * w, -1)
                return t[pos]

            reg = gat("reg")
            height = gat("height")[:, 0]
            dim = np.exp(gat("dim"))
            rot = gat("rot")
            vel = gat("vel")
            osf = float(cfg.out_size_factor)
            x = (xs + reg[:, 0]) * osf * cfg.voxel_size[0] + \
                cfg.point_cloud_range[0]
            y = (ys + reg[:, 1]) * osf * cfg.voxel_size[1] + \
                cfg.point_cloud_range[1]
            yaw = np.arctan2(rot[:, 0], rot[:, 1])
            pcr = cfg.post_center_range
            valid = (scores > cfg.score_threshold) \
                & (x >= pcr[0]) & (y >= pcr[1]) & (height >= pcr[2]) \
                & (x <= pcr[3]) & (y <= pcr[4]) & (height <= pcr[5])
            # greedy circle NMS over valid candidates in score order
            keep = []
            for i in range(k):
                if not valid[i]:
                    continue
                ok = True
                for j in keep:
                    if (x[i] - x[j]) ** 2 + (y[i] - y[j]) ** 2 < radius ** 2:
                        ok = False
                        break
                if ok:
                    keep.append(i)
            keep = keep[:cfg.post_max_size]
            for i in keep:
                box = np.array([
                    x[i], y[i], height[i] - dim[i, 2] * 0.5,
                    dim[i, 0], dim[i, 1], dim[i, 2], yaw[i],
                    vel[i, 0], vel[i, 1]])
                results[bi].append((box, scores[i], cls[i] + offset))
        offset += task.num_classes
    out = []
    for bi in range(bsz):
        if results[bi]:
            boxes = np.stack([r[0] for r in results[bi]])
            scores = np.array([r[1] for r in results[bi]])
            labels = np.array([r[2] for r in results[bi]], np.int64)
        else:
            boxes = np.zeros((0, 9))
            scores = np.zeros((0,))
            labels = np.zeros((0,), np.int64)
        out.append((boxes, scores, labels))
    return out


def randomize_params(model, seed=7, scale=0.2):
    """Random weights + nontrivial BN running stats for a strong oracle."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for name, p in model.named_parameters():
            if "conv_offset" in name:
                # keep offsets sub-pixel so sampling stays informative
                p.copy_(torch.randn(p.shape, generator=g) * 0.02)
            elif p.ndim > 1:
                p.copy_(torch.randn(p.shape, generator=g) * scale
                        / math.sqrt(max(1, p.shape[-1] * p.shape[-2]
                                        if p.ndim == 4 else p.shape[-1])))
            else:
                p.copy_(torch.randn(p.shape, generator=g) * 0.1)
        for m in model.modules():
            if isinstance(m, (nn.BatchNorm2d, nn.BatchNorm1d)):
                m.running_mean.copy_(
                    torch.randn(m.running_mean.shape, generator=g) * 0.3)
                m.running_var.copy_(
                    torch.rand(m.running_var.shape, generator=g) + 0.5)


def he_randomize_params(model, seed=7, gain=1.3, bn_seed=11):
    """Width-normalized random weights for PRODUCTION-scale parity runs.

    `randomize_params`'s scale/k rule is calibrated for the tiny test widths;
    at production widths (cin up to 2048) its per-conv variance gain is
    cin*scale^2 >> 1 and activations overflow through an r101 stack. Here
    conv/linear std = gain/sqrt(fan_in) (He-style) and BN running_var stays
    near 1, so eval-mode magnitudes remain finite and non-degenerate at any
    width/depth.
    """
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for name, p in model.named_parameters():
            if "conv_offset" in name:
                # sub-pixel offsets keep DCN sampling informative
                p.copy_(torch.randn(p.shape, generator=g) * 0.02)
            elif p.ndim == 4:
                fan_in = p.shape[1] * p.shape[2] * p.shape[3]
                p.copy_(torch.randn(p.shape, generator=g)
                        * gain / math.sqrt(fan_in))
            elif p.ndim == 2:
                p.copy_(torch.randn(p.shape, generator=g)
                        * gain / math.sqrt(p.shape[1]))
            else:
                p.copy_(torch.randn(p.shape, generator=g) * 0.1)
        gb = torch.Generator().manual_seed(bn_seed)
        for m in model.modules():
            if isinstance(m, (nn.BatchNorm2d, nn.BatchNorm1d)):
                m.running_mean.copy_(
                    torch.randn(m.running_mean.shape, generator=gb) * 0.3)
                m.running_var.copy_(
                    torch.rand(m.running_var.shape, generator=gb) * 0.5 + 0.75)
                m.weight.copy_(
                    torch.randn(m.weight.shape, generator=gb) * 0.2 + 1.0)
                m.bias.copy_(torch.randn(m.bias.shape, generator=gb) * 0.1)
