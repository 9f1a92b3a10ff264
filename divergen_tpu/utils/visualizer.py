"""Instance-prediction visualizer (cv2).

Counterpart of detectron2 ``utils/visualizer.py`` as used by the demo
(``DiverGen/divergen/predictor.py:17-253`` VisualizationDemo) and the
train-image dump hooks (``INPUT.VIS_RESULT`` → show_train/*.jpg,
custom_build_copypaste_mapper.py:938-953).
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np


def _color(i: int) -> tuple:
    rng = np.random.RandomState(i * 7919 + 13)
    c = rng.randint(60, 255, 3)
    return int(c[0]), int(c[1]), int(c[2])


def draw_instance_predictions(
    image: np.ndarray,  # (H, W, 3) RGB uint8
    boxes: np.ndarray,  # (N, 4) xyxy
    scores: Optional[np.ndarray] = None,
    classes: Optional[np.ndarray] = None,
    masks: Optional[np.ndarray] = None,  # (N, H, W) bool
    class_names: Optional[Sequence[str]] = None,
    score_thresh: float = 0.0,
) -> np.ndarray:
    import cv2

    out = image.copy()
    n = len(boxes)
    for i in range(n):
        if scores is not None and scores[i] < score_thresh:
            continue
        cid = int(classes[i]) if classes is not None else 0
        color = _color(cid)
        x1, y1, x2, y2 = [int(round(v)) for v in boxes[i]]
        cv2.rectangle(out, (x1, y1), (x2, y2), color, 2)
        if masks is not None:
            m = masks[i].astype(bool)
            overlay = out.copy()
            overlay[m] = (0.5 * np.asarray(color) + 0.5 * overlay[m]).astype(np.uint8)
            out = overlay
        label = class_names[cid] if class_names and cid < len(class_names) else str(cid)
        if scores is not None:
            label = f"{label} {scores[i]:.0%}"
        cv2.putText(out, label, (x1, max(y1 - 4, 10)), cv2.FONT_HERSHEY_SIMPLEX, 0.5, color, 1)
    return out


def save_visualization(path: str, image_rgb: np.ndarray) -> None:
    import cv2

    cv2.imwrite(path, cv2.cvtColor(image_rgb, cv2.COLOR_RGB2BGR))
