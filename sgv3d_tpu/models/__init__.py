from sgv3d_tpu.models.bev_height import (
    BEVHeight, embed_loss, semantic_loss, train_loss)

__all__ = ["BEVHeight", "embed_loss", "semantic_loss", "train_loss"]
