from sgv3d_tpu.losses.constants import (BINARY_MODE, MULTICLASS_MODE,
                                        MULTILABEL_MODE)
from sgv3d_tpu.losses.dice import dice_loss, dice_loss_modes
from sgv3d_tpu.losses.focal import (binary_focal_loss_with_logits, focal_loss,
                                    multiclass_focal_loss,
                                    multilabel_focal_loss)
from sgv3d_tpu.losses.functional import (label_smoothed_nll_loss,
                                         soft_dice_score, soft_jaccard_score,
                                         soft_tversky_score,
                                         softmax_focal_loss_with_logits,
                                         wing_loss)

__all__ = [
    "BINARY_MODE", "MULTICLASS_MODE", "MULTILABEL_MODE",
    "binary_focal_loss_with_logits", "focal_loss", "multiclass_focal_loss",
    "multilabel_focal_loss", "dice_loss", "dice_loss_modes",
    "soft_dice_score", "soft_jaccard_score", "soft_tversky_score",
    "wing_loss", "label_smoothed_nll_loss", "softmax_focal_loss_with_logits",
]
