"""Debug dump helpers: CenterNet heatmaps, positives, regression targets,
stage-2 predictions.

Counterpart of ``DiverGen/divergen/modeling/debug.py`` (debug_train :75-141,
debug_test :143-218, debug_second_stage :220-333, color/blend helpers
:11-73) and the mapper's VIS_RESULT hook (custom_build_copypaste_mapper.py
:938-953). Differences by design: the reference pops cv2.imshow windows;
this writes jpgs (TPU hosts are headless), and it consumes the TPU build's
flattened-level arrays (geometry from ``centernet.level_geometry``: grids
(M, 2), strides (M,), level_ids (M,)) instead of per-level NCHW tensors.
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import numpy as np

_COLORS = (np.random.RandomState(42).rand(1300, 3) * 180 + 50).astype(np.uint8)


def _color_heatmap(hm: np.ndarray) -> np.ndarray:
    """(H, W) or (H, W, C) heatmap in [0,1] → BGR colormap (channel max)."""
    import cv2

    if hm.ndim == 3:
        hm = hm.max(axis=-1)
    hm8 = np.clip(np.asarray(hm, np.float32) * 255, 0, 255).astype(np.uint8)
    return cv2.applyColorMap(hm8, cv2.COLORMAP_JET)


def _blend(image: np.ndarray, color_maps: Sequence[np.ndarray], a: float = 0.7
           ) -> np.ndarray:
    """Blend per-level colormaps onto the image (debug.py:27-33)."""
    import cv2

    out = np.asarray(image, np.float32).copy()
    for cm in color_maps:
        cm = cv2.resize(cm, (out.shape[1], out.shape[0])).astype(np.float32)
        out = np.maximum(out * (1 - a) + cm * a, out * 0.5)
    return np.clip(out, 0, 255).astype(np.uint8)


def save_heatmap(path: str, hm: np.ndarray, image: Optional[np.ndarray] = None) -> None:
    """(H, W) heatmap in [0,1] → colorized jpg, optionally blended on image."""
    import cv2

    color = _color_heatmap(np.asarray(hm))
    if image is not None:
        img = cv2.cvtColor(np.asarray(image, np.uint8), cv2.COLOR_RGB2BGR)
        color = cv2.resize(color, (img.shape[1], img.shape[0]))
        color = (0.5 * img + 0.5 * color).astype(np.uint8)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    cv2.imwrite(path, color)


def _unflatten_levels(flat: np.ndarray, geom) -> List[np.ndarray]:
    """(M, ...) flattened-over-levels → list of (Hl, Wl, ...) per level."""
    level_ids = np.asarray(geom["level_ids"])
    shapes = [tuple(s) for s in np.asarray(geom["shapes"])]
    out = []
    ofs = 0
    for li, (h, w) in enumerate(shapes):
        n = h * w
        out.append(np.asarray(flat[ofs : ofs + n]).reshape((h, w) + flat.shape[1:]))
        ofs += n
        assert (level_ids[ofs - n : ofs] == li).all()
    return out


def debug_train(
    out_dir: str,
    images: np.ndarray,  # (B, H, W, 3) float 0..255
    gt: Dict,  # padded gt pytree (boxes/valid)
    heatmaps: np.ndarray,  # (B, M) or (B, M, C) rendered GT heatmaps
    reg_targets: np.ndarray,  # (B, M, 4) stride-normalized ltrb
    pos_count: np.ndarray,  # (B, M)
    geom: Dict,  # centernet.level_geometry output (host-fetched)
    prefix: str = "train",
) -> List[str]:
    """GT heatmap / positive-location / regression-target dump
    (debug.py:75-141): per image writes ``{prefix}_{i}_hm{l}.jpg`` per level
    and a ``{prefix}_{i}_blend.jpg`` with gt boxes (red), positive centers
    (yellow markers) and decoded regression targets (blue)."""
    import cv2

    os.makedirs(out_dir, exist_ok=True)
    grids = np.asarray(geom["grids"])
    strides = np.asarray(geom["strides"])
    written = []
    b = len(images)
    for i in range(b):
        image = cv2.cvtColor(np.asarray(images[i], np.uint8), cv2.COLOR_RGB2BGR)
        hm_levels = _unflatten_levels(np.asarray(heatmaps[i]), geom)
        color_maps = []
        for li, hm in enumerate(hm_levels):
            cm = _color_heatmap(hm)
            p = os.path.join(out_dir, f"{prefix}_{i}_hm{li}.jpg")
            cv2.imwrite(p, cm)
            written.append(p)
            color_maps.append(cm)
        blend = _blend(image, color_maps)
        boxes = np.asarray(gt["boxes"][i])[np.asarray(gt["valid"][i])]
        for x1, y1, x2, y2 in boxes:
            cv2.rectangle(blend, (int(x1), int(y1)), (int(x2), int(y2)),
                          (0, 0, 255), 3, cv2.LINE_AA)
        pos = np.where(np.asarray(pos_count[i]) > 0)[0]
        lvl = np.asarray(geom["level_ids"])
        for j in pos:
            x, y = grids[j]
            cv2.drawMarker(blend, (int(x), int(y)), (0, 255, 255),
                           markerSize=(int(lvl[j]) + 1) * 16)
        reg = np.asarray(reg_targets[i])
        reg_ok = np.where(reg.max(axis=1) > 0)[0]
        for j in reg_ok:
            ltrb = reg[j] * strides[j]
            x, y = grids[j]
            cv2.rectangle(
                blend,
                (int(x - ltrb[0]), int(y - ltrb[1])),
                (int(x + ltrb[2]), int(y + ltrb[3])),
                (255, 0, 0), 1, cv2.LINE_AA,
            )
            cv2.circle(blend, (int(x), int(y)), 2, (255, 0, 0), -1)
        p = os.path.join(out_dir, f"{prefix}_{i}_blend.jpg")
        cv2.imwrite(p, blend)
        written.append(p)
    return written


def debug_test(
    out_dir: str,
    images: np.ndarray,  # (B, H, W, 3)
    logits: Optional[np.ndarray],  # (B, M, C) sigmoid heatmap predictions
    agn_hm: Optional[np.ndarray],  # (B, M) class-agnostic heatmap
    preds: Optional[Dict],  # padded detections (boxes/scores/classes/valid)
    geom: Dict,
    vis_thresh: float = 0.3,
    class_names: Optional[Sequence[str]] = None,
    mult_agn: bool = False,
    prefix: str = "test",
) -> List[str]:
    """Prediction-time dump (debug.py:143-218): per-level predicted heatmaps,
    class-agnostic maps, and a ``{prefix}_{i}_preds.jpg`` with scored boxes
    (+ class names when provided)."""
    import cv2

    os.makedirs(out_dir, exist_ok=True)
    written = []
    for i in range(len(images)):
        image = cv2.cvtColor(np.asarray(images[i], np.uint8), cv2.COLOR_RGB2BGR)
        color_maps = []
        if logits is not None:
            hm = np.asarray(logits[i])
            if mult_agn and agn_hm is not None:
                hm = hm * np.asarray(agn_hm[i])[:, None]
            for li, lvl_hm in enumerate(_unflatten_levels(hm, geom)):
                cm = _color_heatmap(lvl_hm)
                p = os.path.join(out_dir, f"{prefix}_{i}_predhm{li}.jpg")
                cv2.imwrite(p, cm)
                written.append(p)
                color_maps.append(cm)
        if agn_hm is not None:
            for li, lvl_hm in enumerate(_unflatten_levels(np.asarray(agn_hm[i]), geom)):
                p = os.path.join(out_dir, f"{prefix}_{i}_agnhm{li}.jpg")
                cv2.imwrite(p, (np.clip(lvl_hm, 0, 1) * 255).astype(np.uint8))
                written.append(p)
        if color_maps:
            p = os.path.join(out_dir, f"{prefix}_{i}_blend.jpg")
            cv2.imwrite(p, _blend(image, color_maps))
            written.append(p)
        if preds is not None:
            pred_img = image.copy()
            valid = np.asarray(preds["valid"][i])
            boxes = np.asarray(preds["boxes"][i])
            scores = np.asarray(preds["scores"][i])
            classes = (
                np.asarray(preds["classes"][i])
                if "classes" in preds
                else np.zeros(len(boxes), np.int32)
            )
            for j in np.where(valid & (scores > vis_thresh))[0]:
                x1, y1, x2, y2 = boxes[j].astype(np.int32)
                cat = int(classes[j])
                cl = tuple(int(c) for c in _COLORS[cat % len(_COLORS)])
                cv2.rectangle(pred_img, (x1, y1), (x2, y2), cl, 2, cv2.LINE_AA)
                txt = (
                    f"{class_names[cat] if class_names and cat < len(class_names) else cat}"
                    f"{scores[j]:.2f}"
                )
                font = cv2.FONT_HERSHEY_SIMPLEX
                ts = cv2.getTextSize(txt, font, 0.5, 2)[0]
                cv2.rectangle(pred_img, (x1, y1 - ts[1] - 2), (x1 + ts[0], y1 - 2), cl, -1)
                cv2.putText(pred_img, txt, (x1, y1 - 2), font, 0.5, (0, 0, 0), 1,
                            cv2.LINE_AA)
            p = os.path.join(out_dir, f"{prefix}_{i}_preds.jpg")
            cv2.imwrite(p, pred_img)
            written.append(p)
    return written


def debug_second_stage(
    out_dir: str,
    images: np.ndarray,
    instances: Dict,  # padded detections w/ optional mask_logits (B, N, h, w)
    vis_thresh: float = 0.3,
    class_names: Optional[Sequence[str]] = None,
    prefix: str = "stage2",
) -> List[str]:
    """ROI-head output dump (debug.py:220-333): boxes + pasted masks."""
    import cv2

    os.makedirs(out_dir, exist_ok=True)
    written = []
    for i in range(len(images)):
        img = cv2.cvtColor(np.asarray(images[i], np.uint8), cv2.COLOR_RGB2BGR)
        valid = np.asarray(instances["valid"][i])
        boxes = np.asarray(instances["boxes"][i])
        scores = np.asarray(instances["scores"][i])
        classes = (
            np.asarray(instances["classes"][i])
            if "classes" in instances
            else np.zeros(len(boxes), np.int32)
        )
        masks = instances.get("mask_logits")
        for j in np.where(valid & (scores > vis_thresh))[0]:
            x1, y1, x2, y2 = boxes[j].astype(np.int32)
            cat = int(classes[j])
            cl = tuple(int(c) for c in _COLORS[cat % len(_COLORS)])
            cv2.rectangle(img, (x1, y1), (x2, y2), cl, 2, cv2.LINE_AA)
            if masks is not None and x2 > x1 and y2 > y1:
                prob = 1.0 / (1.0 + np.exp(-np.asarray(masks[i][j], np.float32)))
                m = cv2.resize(prob, (x2 - x1, y2 - y1)) >= 0.5
                roi = img[y1:y2, x1:x2]
                roi[m] = (0.5 * roi[m] + 0.5 * np.array(cl)).astype(np.uint8)
            if class_names:
                txt = f"{class_names[cat] if cat < len(class_names) else cat}{scores[j]:.2f}"
                cv2.putText(img, txt, (x1, max(y1 - 2, 10)),
                            cv2.FONT_HERSHEY_SIMPLEX, 0.5, cl, 1, cv2.LINE_AA)
        p = os.path.join(out_dir, f"{prefix}_{i}.jpg")
        cv2.imwrite(p, img)
        written.append(p)
    return written


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
