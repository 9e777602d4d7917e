"""SSDG strategy driver: the staged pipeline that generates recombined
training frames (new ids from 100000) and the train_ssdg split.

Parity target: /root/reference/scripts/data_preprocess/recombine_strategy.py
  stages 1-2: per labeled frame, generate/cache per-class foreground masks
  stage  4  : select background frames (<5 focus objects, top-50 per unique
              focal length / scene)
  stages 5-6: for each background, composite objects from 3 source frames of
              the same camera height (+-0.3 m); write train_ssdg.txt.
"""
from __future__ import annotations

import json
import os
import random
import shutil

import numpy as np

from ssdg import utils
from ssdg.masks import make_predictor

CLS_FOCUS = ("car", "van", "truck", "bus", "pedestrian", "cyclist",
             "motorcyclist", "tricyclist")


def read_split(split_txt, token2sample):
    out = []
    for line in open(split_txt):
        fid = line.rstrip("\n")
        out.append(fid if fid.isdigit() else token2sample[fid])
    return out


def write_split(split_list, split_txt):
    with open(split_txt, "w") as f:
        for s in split_list:
            f.write(s + "\n")


def mask_exists(root, frame_id):
    return os.path.exists(
        os.path.join(root, "training", "mask_image", frame_id + ".npy"))


def generate_frame_masks(predictor, src_root, dest_root, frame_ids):
    """Stages 1-2: per-frame multi-class mask caches + kitti copies."""
    for frame_id in frame_ids:
        if mask_exists(dest_root, frame_id):
            continue
        sample = utils.load_sample(src_root, "training", frame_id)
        sample = utils.update_bbox_info(sample)
        cached = os.path.join(src_root, "training/mask_image",
                              frame_id + ".npy")
        if os.path.exists(cached):
            mask = (np.load(cached) / 40).astype(np.uint8)
            sample["mask_image"] = mask[:, :, 0][:, :, None]
        else:
            boxes = [a["bbox"] for a in sample["annos_ego"]]
            labels = [utils.CLASS2ID[a["name"].lower()]
                      for a in sample["annos_ego"]]
            sample["mask_image"] = predictor(
                sample["img"], np.array(boxes).reshape(-1, 4), labels)
        utils.save_kitti_format(dest_root, sample, "training/image_2")


def get_background_ids(src_root, frame_ids, cls_focus, cnt_threshold):
    """Stage 4: frames with few focus-class objects, grouped per focal len."""
    P2_cache, background_count, background_ids = {}, {}, []
    for frame_id in frame_ids:
        label_path = os.path.join(src_root, "training/label_2",
                                  frame_id + ".txt")
        calib_path = os.path.join(src_root, "training/calib",
                                  frame_id + ".txt")
        annos = utils.load_annos(label_path)
        Tr, P2 = utils.load_calib_v2(calib_path)
        height, _ = utils.parse_height_from_Tr(Tr)
        obj_cnt = sum(1 for a in annos if a["name"].lower() in cls_focus)
        fx = P2[0, 0]
        if obj_cnt < cnt_threshold or fx not in P2_cache:
            background_ids.append((frame_id, height))
            background_count.setdefault(fx, []).append(
                (frame_id, obj_cnt, height))
            P2_cache.setdefault(fx, height)
    return background_ids, background_count, P2_cache


def split_frame_ids(src_root, frame_ids, P2_cache):
    """Group source frames by camera height (+-0.3 m buckets)."""
    buckets = {h: [] for h in P2_cache.values()}
    for frame_id in frame_ids:
        Tr, _ = utils.load_calib_v2(
            os.path.join(src_root, "training/calib", frame_id + ".txt"))
        height, _ = utils.parse_height_from_Tr(Tr)
        for h_key in buckets:
            if abs(height - h_key) < 0.30:
                buckets[h_key].append(frame_id)
    return buckets


def combination_process(predictor, train_frame_ids, src_root, dest_root,
                        P2_cache, background_ids, num_frames, count,
                        is_pred, rng, top_background=50):
    buckets = split_frame_ids(src_root, train_frame_ids, P2_cache)
    combine_frame_ids = []
    for back_id, back_height in background_ids:
        pool = buckets.get(back_height, [])
        if len(pool) < num_frames:
            count += 1
            continue
        sample_batch = min(
            max(1, int(len(train_frame_ids) / max(1, len(background_ids)))),
            len(pool))
        for _ in range(sample_batch):
            fid = f"{count:06d}"
            if not mask_exists(dest_root, fid):
                train_ids = rng.sample(pool, num_frames)
                combined = utils.frame_combine(
                    predictor, src_root, train_ids, back_id, count,
                    sample_ratio=1.0, is_pred=is_pred, rng=rng)
                combine_frame_ids.append(combined["frame_id"])
                utils.save_kitti_format(dest_root, combined,
                                        "training/image_2")
            count += 1
    return combine_frame_ids, count


def run_ssdg(src_root: str, dest_root: str, sam_checkpoint: str | None = None,
             pred_root: str | None = None, num_frames: int = 3,
             background_threshold: int = 5, top_background: int = 50,
             seed: int = 0):
    """Full pipeline. `pred_root` switches stages 5-6 to pseudo-labeled
    (teacher) frames — the reference's is_pred path reading score>=0.7 labels."""
    rng = random.Random(seed)
    predictor = make_predictor(sam_checkpoint)
    sets = os.path.join(src_root, "ImageSets")
    with open(os.path.join(src_root, "map_token2id.json")) as f:
        token2sample = json.load(f)
    train_ids = read_split(os.path.join(sets, "train_dair.txt"), token2sample)
    val_ids = read_split(os.path.join(sets, "val_dair.txt"), token2sample)
    unlabeled_path = os.path.join(sets, "unlabeled_data.txt")
    raw_ids = (list(set(read_split(unlabeled_path, token2sample)))
               if os.path.exists(unlabeled_path) else [])

    print(f"stage 1-2: masks for {len(train_ids)} train "
          f"+ {len(val_ids)} val frames")
    generate_frame_masks(predictor, src_root, dest_root, train_ids)
    generate_frame_masks(predictor, src_root, dest_root, val_ids)

    combine_frame_ids, count = [], 100000
    if raw_ids:
        print(f"stage 4: selecting backgrounds from {len(raw_ids)} raw frames")
        _, background_count, P2_cache = get_background_ids(
            src_root, raw_ids, CLS_FOCUS, background_threshold)
        background_ids = []
        for fx, entries in background_count.items():
            for frame_id, _, height in sorted(
                    entries, key=lambda x: x[1])[:top_background]:
                background_ids.append((frame_id, height))
        print(f"stage 5-6: compositing over {len(background_ids)} backgrounds")
        source_ids = raw_ids if pred_root else train_ids
        combine_frame_ids, count = combination_process(
            predictor, source_ids, pred_root or src_root, dest_root, P2_cache,
            background_ids, num_frames, count, is_pred=bool(pred_root), rng=rng)

    os.makedirs(os.path.join(dest_root, "ImageSets"), exist_ok=True)
    if combine_frame_ids:
        write_split(combine_frame_ids + train_ids,
                    os.path.join(dest_root, "ImageSets", "train_ssdg.txt"))
    for name in ("train_dair.txt", "val_dair.txt"):
        src = os.path.join(sets, name)
        dst = os.path.join(dest_root, "ImageSets", name)
        if os.path.exists(src) and not os.path.exists(dst):
            shutil.copyfile(src, dst)
    src_map = os.path.join(src_root, "map_token2id.json")
    dst_map = os.path.join(dest_root, "map_token2id.json")
    if not os.path.exists(dst_map):
        shutil.copyfile(src_map, dst_map)
    src_eval = os.path.join(src_root, "training/label_eval")
    dst_eval = os.path.join(dest_root, "training/label_eval")
    if os.path.exists(src_eval) and not os.path.exists(dst_eval):
        shutil.copytree(src_eval, dst_eval)
    print(f"generated {len(combine_frame_ids)} recombined frames")
    return combine_frame_ids
