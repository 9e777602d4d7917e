"""BEVHeight / SGV3D model composition.

Composes the image->BEV backbone (LSSFPN or BSMLSSFPN, chosen by
`cfg.backbone.is_bsm` like the reference dispatch at
/root/reference/models/bev_height.py:23-27) with the CenterPoint-style BEV
head, and provides the functional training losses (detection + semantic aux,
/root/reference/exps/sgv3d/...r50...py:258-338).
"""
from __future__ import annotations

from typing import Any, Mapping

import flax.linen as nn
import jax
import jax.numpy as jnp

from sgv3d_tpu.config import ExpConfig
from sgv3d_tpu.heads.bev_head import BEVHeightHead
from sgv3d_tpu.heads.losses import head_loss
from sgv3d_tpu.heads.targets import get_targets
from sgv3d_tpu.losses.focal import multiclass_focal_loss
from sgv3d_tpu.nn.lss_fpn import BSMLSSFPN, LSSFPN
from sgv3d_tpu.ops.resize import resize_bilinear


def normalize_images(imgs: jnp.ndarray, cfg: ExpConfig) -> jnp.ndarray:
    """On-device imnormalize for raw uint8 images; fp32 passes through.

    Replicates `data.transforms.imnormalize` exactly (channel reversal, then
    (x - mean) / std in fp32) so the host can ship uint8 pixels — 4x less
    host->device traffic, and the normalization runs on the chip instead of
    the 1-core host. fp32 inputs are assumed already normalized (the host
    path), keeping both entry conventions valid.
    """
    if imgs.dtype != jnp.uint8:
        return imgs
    x = jnp.flip(imgs.astype(jnp.float32), axis=-1)
    mean = jnp.asarray(cfg.img_mean, jnp.float32)
    std = jnp.asarray(cfg.img_std, jnp.float32)
    return (x - mean) / std


class BEVHeight(nn.Module):
    cfg: ExpConfig
    dtype: jnp.dtype | None = None  # backbone compute dtype (bf16 on TPU)
    # BEV-head compute dtype. None = fp32, mirroring the reference's
    # @autocast(False) head guard; bf16 is an opt-in serving approximation
    # (api.BEVHeightPredictor(bf16_head=True)).
    head_dtype: jnp.dtype | None = None
    # Optional spatial sharding of the BEV map over a mesh axis (SP for the
    # big 1408^2 grids): a NamedSharding like P(None, "bev") applied between
    # the lift and the BEV head. XLA then partitions every head conv
    # spatially and inserts the halo exchanges over ICI automatically.
    bev_sharding: Any = None
    # Serving fast path: fused Pallas identity-bottleneck runs in the image
    # backbone (ops/pallas_bottleneck.py). Inference + bf16 only — a no-op
    # for training or fp32 parity eval.
    fused_convs: bool = False

    @nn.compact
    def __call__(self, sweep_imgs, mats: Mapping[str, Any], train: bool = False,
                 cells=None, pix_keep=None):
        """Returns (task_preds, aux) where aux is the backbone's auxiliary
        output pair (assist features for LSSFPN, semantic logits for BSM).

        `sweep_imgs` may be normalized fp32 or raw uint8 (normalized
        on-device, see `normalize_images`). `cells`: optional precomputed
        `nn.lss_fpn.compute_lift_cells` (static-rig fast path); `pix_keep`:
        optional static pixel-culling indices paired with culled `cells`
        (`ops.voxel_pooling.cull_static_cells`)."""
        sweep_imgs = normalize_images(sweep_imgs, self.cfg)
        backbone_cls = BSMLSSFPN if self.cfg.backbone.is_bsm else LSSFPN
        backbone = backbone_cls(self.cfg.backbone, dtype=self.dtype,
                                fused_convs=self.fused_convs, name="backbone")
        head = BEVHeightHead(self.cfg.head, dtype=self.head_dtype,
                             name="head")
        bev, aux = backbone(sweep_imgs, mats, train, cells, pix_keep)
        if self.bev_sharding is not None:
            bev = jax.lax.with_sharding_constraint(bev, self.bev_sharding)
        preds = head(bev, train)
        return preds, aux


def downsample_semantic_labels(gt_semantic: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Max-pool class-id labels down to the prediction stride.

    gt_semantic: (B, N, H, W) integer class ids -> (B*N, H/f, W/f) int32.
    Matches /root/reference/exps/sgv3d/...r50...py:258-275.
    """
    b, n, h, w = gt_semantic.shape
    x = gt_semantic.reshape(b * n, h // factor, factor, w // factor, factor)
    return jnp.max(x, axis=(2, 4)).astype(jnp.int32)


def semantic_loss(cfg: ExpConfig, aux_preds, gt_semantic: jnp.ndarray) -> jnp.ndarray:
    """Two-scale semantic focal loss (BSM path).

    aux_preds: (semantic0 (BN, H16, W16, S), semantic1 (BN, H8, W8, S)).
    gt_semantic: (B, N, H, W) class ids at input resolution.
    """
    semantic0, semantic1 = aux_preds
    up0 = resize_bilinear(semantic0.astype(jnp.float32), scale=2,
                          align_corners=False)
    factor = cfg.backbone.downsample_factor // 2
    labels = downsample_semantic_labels(gt_semantic, factor)
    loss0 = multiclass_focal_loss(up0, labels)
    loss1 = multiclass_focal_loss(semantic1.astype(jnp.float32), labels)
    return (loss0 + loss1) / 2.0


def embed_loss(aux_preds, gt_embeds: jnp.ndarray) -> jnp.ndarray:
    """Embedding-distillation aux for the non-BSM BEVHeight variant: MSE of
    the assist features against (SAM) embedding maps, x1000
    (/root/reference/exps/bevheight/dair-v2x/...r50...py:247-256; a latent
    path in the reference — its dataset never produces the embeds — exposed
    here as a working hook).

    aux_preds: (assist, assist) with assist (B*N, h16, w16, 256);
    gt_embeds: (B, N, h16, w16, 256).
    """
    assist = aux_preds[0].astype(jnp.float32)
    b, n = gt_embeds.shape[:2]
    target = gt_embeds.reshape(b * n, *gt_embeds.shape[2:]).astype(jnp.float32)
    return jnp.mean((assist - target) ** 2) * 1000.0


def train_loss(cfg: ExpConfig, preds, aux, gt_boxes, gt_labels,
               gt_semantic=None, gt_embeds=None):
    """Total training loss.

    Args:
      preds: task-head outputs.
      aux: backbone aux outputs (semantic logits for BSM; assist features
        otherwise).
      gt_boxes: (B, K, 9); gt_labels: (B, K) with -1 padding.
      gt_semantic: optional (B, N, H, W) class-id masks (BSM semantic aux).
      gt_embeds: optional (B, N, h16, w16, C) embedding maps (non-BSM
        distillation aux).

    Returns: (loss, metrics dict).
    """
    targets = get_targets(cfg.head, gt_boxes, gt_labels)
    det_loss, metrics = head_loss(cfg.head, targets, preds)
    metrics["detection_loss"] = det_loss
    total = det_loss
    if cfg.is_train_height and cfg.backbone.is_bsm and gt_semantic is not None:
        sem = semantic_loss(cfg, aux, gt_semantic)
        metrics["semantic_loss"] = sem
        total = total + cfg.semantic_loss_weight * sem
    if (cfg.is_train_height and not cfg.backbone.is_bsm
            and gt_embeds is not None):
        emb = embed_loss(aux, gt_embeds)
        metrics["depth_loss"] = emb
        total = total + emb
    metrics["total_loss"] = total
    return total, metrics
