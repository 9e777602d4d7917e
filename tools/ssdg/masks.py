"""Pluggable foreground-mask predictors for the SSDG pipeline.

The reference uses a box-prompted SAM ViT-H predictor
(/root/reference/scripts/data_preprocess/recombine_strategy.py:150,
recombine_utils.py:600-626). SAM weights/deps are an external offline step;
masks are cached to `training/mask_image/*.npy` (x40 encoding) so generated
datasets interchange between SAM-produced and fallback-produced runs.

Predictor interface: predictor(img_bgr, boxes_xyxy (N, 4), class_ids (N,))
-> (H, W, 1) uint8 semantic-id mask (0 = background).
"""
from __future__ import annotations

import numpy as np


class BoxMaskPredictor:
    """Fallback: fills an inset of each 2D box with the class id. Keeps the
    whole pipeline runnable without SAM; mask quality is the only difference."""

    def __init__(self, inset: float = 0.08):
        self.inset = inset

    def __call__(self, img, boxes, class_ids):
        h, w = img.shape[:2]
        mask = np.zeros((h, w, 1), np.float64)
        for box, cid in zip(np.asarray(boxes).reshape(-1, 4), class_ids):
            x0, y0, x1, y1 = box
            dx, dy = (x1 - x0) * self.inset, (y1 - y0) * self.inset
            x0, x1 = int(max(0, x0 + dx)), int(min(w - 1, x1 - dx))
            y0, y1 = int(max(0, y0 + dy)), int(min(h - 1, y1 - dy))
            if x1 <= x0 or y1 <= y0:
                continue
            region = mask[y0:y1, x0:x1, 0]
            region[region == 0] = cid
        return np.clip(mask, 0, 6).astype(np.uint8)


class SamMaskPredictor:
    """Box-prompted SAM, matching get_sam_mask semantics (first-written-wins
    overlap resolution, ids clipped to [0, 6])."""

    def __init__(self, checkpoint: str, model_type: str = "vit_h",
                 device: str = "cpu"):
        from segment_anything import SamPredictor, sam_model_registry
        sam = sam_model_registry[model_type](checkpoint=checkpoint)
        self.predictor = SamPredictor(sam.to(device))
        self.device = device

    def __call__(self, img, boxes, class_ids):
        import torch
        h, w = img.shape[:2]
        mask_image = np.zeros((h, w, 1), np.float64)
        boxes = np.asarray(boxes).reshape(-1, 4)
        if boxes.shape[0] == 0:
            return mask_image.astype(np.uint8)
        rgb = np.ascontiguousarray(img[:, :, ::-1].astype(np.uint8))
        self.predictor.set_image(rgb)
        tboxes = self.predictor.transform.apply_boxes_torch(
            torch.tensor(boxes), rgb.shape[:2]).to(self.device)
        masks, _, _ = self.predictor.predict_torch(
            point_coords=None, point_labels=None, boxes=tboxes,
            multimask_output=False)
        for i in range(masks.shape[0]):
            m = masks[i].cpu().numpy().reshape(h, w, 1).astype(np.uint8)
            mask_image += (m * class_ids[i]) * (mask_image == 0)
        return np.clip(mask_image, 0, 6).astype(np.uint8)


def make_predictor(sam_checkpoint: str | None = None, device: str = "cpu"):
    if sam_checkpoint:
        return SamMaskPredictor(sam_checkpoint, device=device)
    return BoxMaskPredictor()
