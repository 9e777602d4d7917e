from sgv3d_tpu.nn.resnet import ResNet
from sgv3d_tpu.nn.second_fpn import SECONDFPN
from sgv3d_tpu.nn.blocks import (
    ASPP, BasicBlock, Mlp, SABlock, SELayer, TaskFPN, TaskHead)
from sgv3d_tpu.nn.height_net import HeightNet
from sgv3d_tpu.nn.msct_head import MSCThead
from sgv3d_tpu.nn.lss_fpn import LSSFPN, BSMLSSFPN

__all__ = [
    "ResNet", "SECONDFPN", "ASPP", "BasicBlock", "Mlp", "SABlock", "SELayer",
    "TaskFPN", "TaskHead", "HeightNet", "MSCThead", "LSSFPN", "BSMLSSFPN",
]
