"""CopyPasteMapper: per-sample augmentation orchestration (host side).

Counterpart of ``DiverGen/divergen/data/custom_build_copypaste_mapper.py:669-958``
(CopyPasteMapper: base mapper → copy-method select both/self_copy/syn_copy/
"p:<f>" :884-890 → InstPool syn-copy / self-copy source picks → paste) —
split at the host/device boundary: this class only assembles decode-level
inputs (base sample + RGBA patch stack); blending/occlusion runs on-device
(ops/copy_paste.py). Self-copy (the X-Paste SCP transform,
``transforms/custom_copypaste.py:29-514``) is realized through the same
device compositor: source instances are cut to RGBA patches using their
box-frame masks and pasted like pool instances — one kernel for both paths
instead of the reference's two numpy paths.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

from .dataset_mapper import DatasetMapper, read_image
from .inst_pool import InstPool
from .transforms import apply_augmentations


class CopyPasteMapper:
    def __init__(self, mapper: DatasetMapper, cfg, inst_pool: Optional[InstPool] = None):
        self.mapper = mapper
        self.cfg = cfg
        self.use_pool = bool(cfg.INPUT.INST_POOL)
        self.copy_method = cfg.INPUT.COPY_METHOD  # both|self_copy|syn_copy|p:<f>
        self.self_copy_prob = 0.5
        if self.copy_method.startswith("p:"):
            self.self_copy_prob = float(self.copy_method[2:])
        self.max_pastes = cfg.DATALOADER.MAX_PASTES
        self.sample_type = cfg.INPUT.INST_POOL_SAMPLE_STRATEGY
        self.rm_bg_prob = cfg.INPUT.RM_BG_PROB
        self.pool = inst_pool
        if self.use_pool and inst_pool is None:
            self.pool = InstPool(
                cfg.INPUT.INST_POOL_PATH,
                image_root=cfg.INPUT.INST_POOL_ROOT,
                train_size=(cfg.INPUT.TRAIN_SIZE, cfg.INPUT.TRAIN_SIZE),
                max_samples=cfg.INPUT.PASTE_MAX_INST,
                patch_size=cfg.DATALOADER.PATCH_SIZE,
                apply_freq=tuple(cfg.INPUT.INST_POOL_FREQ),
                cat_freq_path=cfg.MODEL.ROI_BOX_HEAD.CAT_FREQ_PATH or None,
                mean_std2_path=cfg.INPUT.AREA_PRIOR_PATH or None,
                random_scale=cfg.INPUT.RANDOM_SCALE,
                random_scale_min=cfg.INPUT.RANDOM_SCALE_MIN,
                random_scale_max=cfg.INPUT.RANDOM_SCALE_MAX,
            )
        self.dataset: Optional[List[dict]] = None
        self.color_jitter = None
        if cfg.INPUT.USE_COLOR_JITTER:
            import json

            from .color_jitter import PhotoMetricDistortion

            cid_to_freq = {}
            if cfg.MODEL.ROI_BOX_HEAD.CAT_FREQ_PATH:
                with open(cfg.MODEL.ROI_BOX_HEAD.CAT_FREQ_PATH) as f:
                    cid_to_freq = {c["id"] - 1: c["frequency"] for c in json.load(f)}
            self.color_jitter = PhotoMetricDistortion(
                cid_to_freq, tuple(cfg.INPUT.COLOR_JITTER_FREQ)
            )
        if cfg.INPUT.USE_INSTABOOST:
            # instaboostfast is not in this image; the reference gates it the
            # same way (custom_build_copypaste_mapper.py:596-666)
            raise NotImplementedError("instaboost requires the instaboostfast package")

    def set_dataset(self, dataset: Sequence[dict]) -> None:
        """Raw records for self-copy source sampling (mapper.set_dataset,
        train_net.py:239)."""
        self.dataset = list(dataset)

    # -- self-copy: cut instances out of another real image --------------
    def _self_copy_patches(self, rng: np.random.Generator, max_pastes: int, ps: int) -> Dict[str, np.ndarray]:
        out = _empty_patches(max_pastes, ps)
        if not self.dataset:
            return out
        src_rec = self.dataset[int(rng.integers(0, len(self.dataset)))]
        try:
            src = self.mapper(src_rec, rng)
        except FileNotFoundError:
            return out
        valid_idx = np.where(src["gt"]["valid"])[0]
        if len(valid_idx) == 0:
            return out
        n_sel = int(rng.integers(1, min(len(valid_idx), max_pastes) + 1))
        chosen = rng.choice(valid_idx, n_sel, replace=False)
        import cv2

        canvas = self.cfg.INPUT.TRAIN_SIZE
        slot = 0
        for i in chosen:
            box = src["gt"]["boxes"][i]
            x1, y1, x2, y2 = [int(round(v)) for v in box]
            x1, y1 = max(x1, 0), max(y1, 0)
            x2, y2 = min(x2, src["image"].shape[1]), min(y2, src["image"].shape[0])
            if x2 - x1 < 2 or y2 - y1 < 2:
                continue
            crop = src["image"][y1:y2, x1:x2]
            mask = cv2.resize(src["gt"]["masks"][i], (x2 - x1, y2 - y1))
            rgba = np.concatenate([crop, mask[..., None]], -1)
            out["patches"][slot] = cv2.resize(rgba, (ps, ps))
            # paste back at a jittered location, same size (SCP keeps scale
            # up to the blank-ratio rescale, custom_copypaste.py:356-375)
            th, tw = y2 - y1, x2 - x1
            cx, cy = rng.integers(0, canvas), rng.integers(0, canvas)
            out["patch_boxes"][slot] = [cx - tw / 2, cy - th / 2, cx + tw / 2, cy + th / 2]
            out["patch_classes"][slot] = src["gt"]["classes"][i]
            out["patch_valid"][slot] = True
            out["patch_flip"][slot] = rng.random() < 0.5
            slot += 1
            if slot >= max_pastes:
                break
        return out

    def __call__(self, record: dict, rng: Optional[np.random.Generator] = None) -> dict:
        rng = rng or np.random.default_rng()
        sample = self.mapper(record, rng)
        if self.color_jitter is not None:
            sample = self.color_jitter(sample, rng)
        ps = self.pool.patch_size if self.pool else self.cfg.DATALOADER.PATCH_SIZE
        mp = self.max_pastes

        method = self.copy_method
        if method == "both" or method.startswith("p:"):
            method = "self_copy" if rng.random() < self.self_copy_prob else "syn_copy"

        if method == "syn_copy" and self.pool is not None:
            patches = self.pool.make_paste_sample(rng, mp, sample_type=self.sample_type)
            if self.cfg.INPUT.SEPARATE_SYN:
                # synthetic instances get their own class ids (+num_classes,
                # BSGAL custom_build_copypaste_mapper.py:505-508)
                n_base = self.cfg.MODEL.ROI_HEADS.NUM_CLASSES // 2
                patches["patch_classes"] = patches["patch_classes"] + n_base
        elif method == "self_copy" and self.dataset:
            patches = self._self_copy_patches(rng, mp, ps)
        else:
            patches = _empty_patches(mp, ps)
        sample.update(patches)
        return sample


def _empty_patches(max_pastes: int, ps: int) -> Dict[str, np.ndarray]:
    return {
        "patches": np.zeros((max_pastes, ps, ps, 4), np.float32),
        "patch_boxes": np.zeros((max_pastes, 4), np.float32),
        "patch_classes": np.zeros((max_pastes,), np.int32),
        "patch_valid": np.zeros((max_pastes,), bool),
        "patch_flip": np.zeros((max_pastes,), bool),
    }
