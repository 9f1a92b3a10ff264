"""Debug dump helpers for CenterNet heatmaps and training images.

Counterpart of ``DiverGen/divergen/modeling/debug.py`` (image/heatmap dump
utilities) and the mapper's VIS_RESULT hook (custom_build_copypaste_mapper.py
:938-953).
"""
from __future__ import annotations

import os
from typing import Dict, Optional, Sequence

import numpy as np


def save_heatmap(path: str, hm: np.ndarray, image: Optional[np.ndarray] = None) -> None:
    """(H, W) heatmap in [0,1] → colorized jpg, optionally blended on image."""
    import cv2

    hm8 = np.clip(np.asarray(hm, np.float32) * 255, 0, 255).astype(np.uint8)
    color = cv2.applyColorMap(hm8, cv2.COLORMAP_JET)
    if image is not None:
        img = cv2.cvtColor(np.asarray(image, np.uint8), cv2.COLOR_RGB2BGR)
        color = cv2.resize(color, (img.shape[1], img.shape[0]))
        color = (0.5 * img + 0.5 * color).astype(np.uint8)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    cv2.imwrite(path, color)


def dump_train_sample(out_dir: str, idx: int, sample: Dict) -> None:
    """VIS_RESULT hook: composited train image with boxes drawn."""
    from ..utils.visualizer import draw_instance_predictions, save_visualization

    gt = sample["gt"]
    valid = np.asarray(gt["valid"])
    vis = draw_instance_predictions(
        np.asarray(sample["image"], np.uint8),
        np.asarray(gt["boxes"])[valid],
        classes=np.asarray(gt["classes"])[valid],
    )
    os.makedirs(out_dir, exist_ok=True)
    save_visualization(os.path.join(out_dir, f"train_{idx:06d}.jpg"), vis)
