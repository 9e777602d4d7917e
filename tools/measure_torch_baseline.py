"""Measure the CPU PyTorch baseline: BEVHeight-r101 inference images/sec.

Rebuilds the reference's inference compute graph in pure torch (no mmcv /
torchvision in this image): ResNet-101 -> SECONDFPN -> HeightNet (ASPP; plain
conv in place of DCN, which slightly favours the baseline) -> materialised
height x context outer product -> scatter-add voxel pooling -> BEV ResNet-18
trunk + SECONDFPN + 6-task CenterPoint heads. Mirrors
/root/reference/layers/backbones/lss_fpn.py and layers/heads/bev_height_head.py.

Writes BENCH_BASELINE.json used by bench.py's vs_baseline.
"""
from __future__ import annotations

import json
import os
import time

import torch
import torch.nn as nn
import torch.nn.functional as F

torch.set_num_threads(os.cpu_count() or 1)
torch.set_grad_enabled(False)


def conv_bn_relu(cin, cout, k=3, s=1, p=None, bias=True):
    if p is None:
        p = k // 2
    return nn.Sequential(nn.Conv2d(cin, cout, k, s, p, bias=bias),
                         nn.BatchNorm2d(cout), nn.ReLU(inplace=True))


class Bottleneck(nn.Module):
    def __init__(self, cin, planes, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.down = None
        if stride != 1 or cin != planes * 4:
            self.down = nn.Sequential(
                nn.Conv2d(cin, planes * 4, 1, stride, bias=False),
                nn.BatchNorm2d(planes * 4))

    def forward(self, x):
        idt = x if self.down is None else self.down(x)
        out = F.relu(self.bn1(self.conv1(x)))
        out = F.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        return F.relu(out + idt)


class BasicBlock(nn.Module):
    def __init__(self, cin, planes, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, planes, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.down = None
        if stride != 1 or cin != planes:
            self.down = nn.Sequential(nn.Conv2d(cin, planes, 1, stride, bias=False),
                                      nn.BatchNorm2d(planes))

    def forward(self, x):
        idt = x if self.down is None else self.down(x)
        out = F.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return F.relu(out + idt)


def resnet(depth, cin=3, base=64, stages=4, strides=(1, 2, 2, 2), maxpool=True):
    blocks_per = {18: [2, 2, 2, 2], 50: [3, 4, 6, 3], 101: [3, 4, 23, 3]}[depth]
    block = BasicBlock if depth == 18 else Bottleneck
    expansion = 1 if depth == 18 else 4
    stem = [nn.Conv2d(cin, base, 7, 2, 3, bias=False), nn.BatchNorm2d(base),
            nn.ReLU(inplace=True)]
    if maxpool:
        stem.append(nn.MaxPool2d(3, 2, 1))
    layers = []
    c = base
    for i in range(stages):
        planes = base * 2 ** i
        stage = []
        for b in range(blocks_per[i]):
            stage.append(block(c, planes, strides[i] if b == 0 else 1))
            c = planes * expansion
        layers.append(nn.Sequential(*stage))
    return nn.Sequential(*stem), nn.ModuleList(layers)


class SECONDFPN(nn.Module):
    def __init__(self, cins, strides, couts):
        super().__init__()
        self.blocks = nn.ModuleList()
        for cin, s, cout in zip(cins, strides, couts):
            if s >= 1:
                up = nn.ConvTranspose2d(cin, cout, int(s), int(s))
            else:
                k = int(round(1 / s))
                up = nn.Conv2d(cin, cout, k, k)
            self.blocks.append(nn.Sequential(up, nn.BatchNorm2d(cout),
                                             nn.ReLU(inplace=True)))

    def forward(self, feats):
        return torch.cat([b(f) for b, f in zip(self.blocks, feats)], 1)


class ASPP(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.b1 = conv_bn_relu(c, c, 1, bias=False)
        self.b2 = nn.Sequential(nn.Conv2d(c, c, 3, 1, 6, 6, bias=False),
                                nn.BatchNorm2d(c), nn.ReLU(inplace=True))
        self.b3 = nn.Sequential(nn.Conv2d(c, c, 3, 1, 12, 12, bias=False),
                                nn.BatchNorm2d(c), nn.ReLU(inplace=True))
        self.b4 = nn.Sequential(nn.Conv2d(c, c, 3, 1, 18, 18, bias=False),
                                nn.BatchNorm2d(c), nn.ReLU(inplace=True))
        self.gap = nn.Sequential(nn.AdaptiveAvgPool2d(1),
                                 nn.Conv2d(c, c, 1, bias=False),
                                 nn.BatchNorm2d(c), nn.ReLU(inplace=True))
        self.proj = conv_bn_relu(c * 5, c, 1, bias=False)

    def forward(self, x):
        g = self.gap(x).expand(-1, -1, x.shape[2], x.shape[3])
        return self.proj(torch.cat(
            [self.b1(x), self.b2(x), self.b3(x), self.b4(x), g], 1))


class BEVHeightR101(nn.Module):
    D, CTX = 90, 80

    def __init__(self):
        super().__init__()
        self.stem, self.stages = resnet(101)
        self.neck = SECONDFPN([256, 512, 1024, 2048], [0.25, 0.5, 1, 2],
                              [128] * 4)
        mid = 512
        self.reduce = conv_bn_relu(512, mid)
        self.ctx_mlp = nn.Sequential(nn.Linear(27, mid), nn.ReLU(), nn.Linear(mid, mid))
        self.ctx_se = nn.Sequential(nn.Conv2d(mid, mid, 1), nn.ReLU(),
                                    nn.Conv2d(mid, mid, 1))
        self.ctx_conv = nn.Conv2d(mid, self.CTX, 1)
        self.h_mlp = nn.Sequential(nn.Linear(27, mid), nn.ReLU(), nn.Linear(mid, mid))
        self.h_se = nn.Sequential(nn.Conv2d(mid, mid, 1), nn.ReLU(),
                                  nn.Conv2d(mid, mid, 1))
        self.h_blocks = nn.Sequential(BasicBlock(mid, mid), BasicBlock(mid, mid),
                                      BasicBlock(mid, mid))
        self.aspp = ASPP(mid)
        self.dcn_standin = nn.Conv2d(mid, mid, 3, 1, 1, groups=4)
        self.h_layer = nn.Conv2d(mid, self.D, 1)
        # BEV head
        self.bev_stem, self.bev_stages = resnet(
            18, cin=80, base=160, stages=3, strides=(1, 2, 2), maxpool=False)
        self.bev_neck = SECONDFPN([80, 160, 320, 640], [1, 2, 4, 8], [64] * 4)
        self.shared = conv_bn_relu(256, 64)
        heads = []
        for ncls in [1, 2, 2, 1, 2, 2]:
            for cout in [2, 1, 3, 2, 2, ncls]:
                heads.append(nn.Sequential(conv_bn_relu(64, 64),
                                           nn.Conv2d(64, cout, 3, 1, 1)))
        self.task_heads = nn.ModuleList(heads)

    def forward(self, x, cell_idx):
        b = x.shape[0]
        f = self.stem(x)
        feats = []
        for st in self.stages:
            f = st(f)
            feats.append(f)
        feat = self.neck(feats)
        feat = self.reduce(feat)
        cam = torch.randn(b, 27)
        ctx = feat * torch.sigmoid(self.ctx_se(
            self.ctx_mlp(cam)[:, :, None, None]))
        ctx = self.ctx_conv(ctx)
        h = feat * torch.sigmoid(self.h_se(self.h_mlp(cam)[:, :, None, None]))
        h = self.h_layer(self.dcn_standin(self.aspp(self.h_blocks(h))))
        h = h.softmax(1)
        # Lift: materialised outer product (B, CTX, D, fH, fW) as the reference
        lifted = h.unsqueeze(1) * ctx.unsqueeze(2)
        feats_pts = lifted.permute(0, 2, 3, 4, 1).reshape(b, -1, self.CTX)
        bev = torch.zeros(b, 128 * 128, self.CTX)
        bev.scatter_add_(1, cell_idx.unsqueeze(-1).expand_as(feats_pts), feats_pts)
        bev = bev.view(b, 128, 128, self.CTX).permute(0, 3, 1, 2).contiguous()
        f = self.bev_stem(bev)
        bev_feats = [bev]
        for st in self.bev_stages:
            f = st(f)
            bev_feats.append(f)
        x = self.shared(self.bev_neck(bev_feats))
        return [head(x) for head in self.task_heads]


def main():
    model = BEVHeightR101().eval()
    x = torch.randn(1, 3, 864, 1536)
    n_pts = 90 * 54 * 96
    cell = torch.randint(0, 128 * 128, (1, n_pts))
    iters = int(os.environ.get("BASELINE_ITERS", "3"))
    # warmup
    t0 = time.perf_counter()
    model(x, cell)
    warm = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        model(x, cell)
    dt = time.perf_counter() - t0
    ips = iters / dt
    out = {
        "torch_cpu_images_per_sec": round(ips, 4),
        "warmup_s": round(warm, 2),
        "iters": iters,
        "threads": torch.get_num_threads(),
        "torch_version": torch.__version__,
        "note": "BEVHeight-r101 864x1536 inference graph, pure-torch rebuild "
                "(DCN replaced by plain grouped conv, favours baseline)",
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                        "BENCH_BASELINE.json")
    with open(os.path.abspath(path), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
