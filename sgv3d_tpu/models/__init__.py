from sgv3d_tpu.models.bev_height import BEVHeight, train_loss, semantic_loss

__all__ = ["BEVHeight", "train_loss", "semantic_loss"]
