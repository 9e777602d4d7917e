from sgv3d_tpu.losses.focal import binary_focal_loss_with_logits, multiclass_focal_loss
from sgv3d_tpu.losses.dice import dice_loss

__all__ = ["binary_focal_loss_with_logits", "multiclass_focal_loss", "dice_loss"]
