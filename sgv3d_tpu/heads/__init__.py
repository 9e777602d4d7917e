from sgv3d_tpu.heads.bev_head import BEVHeightHead
from sgv3d_tpu.heads.targets import get_targets
from sgv3d_tpu.heads.losses import head_loss

__all__ = ["BEVHeightHead", "get_targets", "head_loss"]
