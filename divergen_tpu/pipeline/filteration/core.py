"""Filtration stage core: batched CLIP inference + artifact IO.

Counterparts (SURVEY.md §2.1):
- ``DiverGen/filteration/get_image_feature.py:22-118`` (ImageSimilarity:
  CLIP ViT-L/14 embeddings for LVIS crops and masked gen images)
- ``get_image_similarity_from_feature.py:63-108`` (cosine batch similarity,
  total.json / total.csv pivot)
- ``get_clip_score.py:132-158`` (masked image × "a photo of a single {c}"
  text score, mask-area fraction)
- ``filter_image_by_similarity.py:183-210`` (avg ≥ threshold keep list)

TPU redesign: per-image torch loops become one jitted tower call on a padded
batch; rank-sharded file loops keep the reference's ``i % world_size``
semantics via jax.process_index(). Features are stored as ``.npy`` (not
torch ``.pt``).
"""
from __future__ import annotations

import csv
import json
import os
from glob import glob
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


# ---------------- host image prep ----------------
def clip_preprocess_np(img: np.ndarray, size: int = 224) -> np.ndarray:
    """CLIP preprocess: resize shortest edge (bicubic) + center crop; returns
    float RGB 0..255 (size,size,3)."""
    import cv2

    h, w = img.shape[:2]
    scale = size / min(h, w)
    nh, nw = max(size, int(round(h * scale))), max(size, int(round(w * scale)))
    img = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_CUBIC)
    top, left = (nh - size) // 2, (nw - size) // 2
    return img[top : top + size, left : left + size].astype(np.float32)


def load_masked_image(
    path: str, mask_path: Optional[str] = None, background: str = "zero", size: int = 224
) -> Tuple[np.ndarray, float]:
    """Gen image with background suppressed (get_image_feature.py:289-293
    zeroing; get_clip_score.py:132-146 whitening). Returns (img, mask_frac)."""
    import cv2

    img = cv2.cvtColor(cv2.imread(path), cv2.COLOR_BGR2RGB)
    frac = 1.0
    if mask_path and os.path.exists(mask_path):
        mask = cv2.imread(mask_path, cv2.IMREAD_GRAYSCALE)
        if mask.shape[:2] != img.shape[:2]:
            mask = cv2.resize(mask, (img.shape[1], img.shape[0]), interpolation=cv2.INTER_NEAREST)
        on = mask > 127
        frac = float(on.mean())
        fill = 255 if background == "white" else 0
        img = np.where(on[..., None], img, fill).astype(np.uint8)
    return clip_preprocess_np(img, size), frac


# ---------------- device towers ----------------
class ClipEncoder:
    """Jitted CLIP towers with fixed batch size (pad + mask)."""

    def __init__(self, model_name: str = "ViT-L/14", batch: int = 64,
                 params=None, rng_seed: int = 0, image_size: int = 224):
        import jax
        import jax.numpy as jnp

        from ...modeling.text.clip import build_clip, normalize, preprocess_images

        self.batch = batch
        self.vision, self.text = build_clip(model_name, image_size=image_size)
        self._jnp = jnp
        self._jax = jax
        if params is None:
            rng = jax.random.PRNGKey(rng_seed)
            dummy_img = jnp.zeros((1, image_size, image_size, 3))
            dummy_tok = jnp.zeros((1, 77), jnp.int32)
            params = {
                "vision": self.vision.init(rng, dummy_img),
                "text": self.text.init(rng, dummy_tok),
            }
        self.params = params

        def embed_images(p, imgs):
            return normalize(self.vision.apply(p, preprocess_images(imgs)))

        def embed_texts(p, toks):
            return normalize(self.text.apply(p, toks))

        self._embed_images = jax.jit(embed_images)
        self._embed_texts = jax.jit(embed_texts)

    def encode_images(self, images: np.ndarray) -> np.ndarray:
        """(N,H,W,3) RGB 0..255 → (N,D) normalized, padded batching."""
        jnp = self._jnp
        out = []
        for ofs in range(0, len(images), self.batch):
            chunk = images[ofs : ofs + self.batch]
            pad = self.batch - len(chunk)
            if pad:
                chunk = np.concatenate([chunk, np.zeros((pad,) + chunk.shape[1:], chunk.dtype)])
            emb = self._embed_images(self.params["vision"], jnp.asarray(chunk))
            out.append(np.asarray(emb)[: len(images) - ofs])
        return np.concatenate(out) if out else np.zeros((0, 1))

    def encode_texts(self, tokens: np.ndarray) -> np.ndarray:
        jnp = self._jnp
        return np.asarray(self._embed_texts(self.params["text"], jnp.asarray(tokens)))


class DinoEncoder:
    """Jitted DINOv2 image tower — the reference's ``method='dinov2'``
    alternative (get_image_feature.py:34-53). Same ``encode_images``
    interface as ClipEncoder; embeddings are L2-normalized for the shared
    cosine-similarity path."""

    def __init__(self, model_name: str = "vitg14", batch: int = 64,
                 params=None, rng_seed: int = 0, image_size: int = 224):
        import jax
        import jax.numpy as jnp

        from ...modeling.backbone.dinov2 import DinoV2, dinov2_preprocess

        self.batch = batch
        self.model = DinoV2.from_name(model_name)
        self._jnp = jnp
        if params is None:
            dummy = jnp.zeros((1, image_size, image_size, 3))
            params = jax.jit(self.model.init)(jax.random.PRNGKey(rng_seed), dummy)
        self.params = params

        def embed(p, imgs):
            feats = self.model.apply(p, dinov2_preprocess(imgs))
            return feats / jnp.maximum(
                jnp.linalg.norm(feats, axis=-1, keepdims=True), 1e-8
            )

        self._embed_images = jax.jit(embed)

    def encode_images(self, images: np.ndarray) -> np.ndarray:
        jnp = self._jnp
        out = []
        for ofs in range(0, len(images), self.batch):
            chunk = images[ofs : ofs + self.batch]
            pad = self.batch - len(chunk)
            if pad:
                chunk = np.concatenate([chunk, np.zeros((pad,) + chunk.shape[1:], chunk.dtype)])
            emb = self._embed_images(self.params, jnp.asarray(chunk))
            out.append(np.asarray(emb)[: len(images) - ofs])
        return np.concatenate(out) if out else np.zeros((0, 1))


def cosine_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Normalized-feature similarity (get_similarity_from_features_batch)."""
    return a @ b.T


# ---------------- artifact IO (bit-comparable formats) ----------------
def dict_to_csv(total: Dict[str, Dict[str, float]], out_path: str) -> None:
    """total.csv pivot (get_image_similarity_from_feature.py:83-108)."""
    cols = list(total[next(iter(total))].keys()) if total else []
    with open(out_path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["lvis"] + cols + ["avg"])
        avgs = []
        for k, inner in total.items():
            vals = [inner[c] for c in cols]
            avg = sum(vals) / len(vals) if vals else 0
            avgs.append(avg)
            w.writerow([k] + vals + [avg])
        w.writerow(["avg"] + [sum(avgs) / len(avgs) if avgs else 0])


def filename_pivot(total: Dict[str, Dict[str, float]]) -> Dict[str, Dict[str, float]]:
    """{lvis: {gen: sim}} → {gen: {lvis: sim}} (filter step :163-168)."""
    out: Dict[str, Dict[str, float]] = {}
    for lvis_f, inner in total.items():
        for gen_f, sim in inner.items():
            out.setdefault(gen_f, {})[lvis_f] = sim
    return out


def filename_dict_to_csv(fd: Dict[str, Dict[str, float]], out_path: str) -> None:
    with open(out_path, "w", newline="") as f:
        w = csv.writer(f)
        cols = list(fd[next(iter(fd))].keys()) if fd else []
        w.writerow(["gen"] + cols + ["avg"])
        for k, inner in fd.items():
            vals = [inner.get(c, 0.0) for c in cols]
            avg = sum(vals) / len(vals) if vals else 0
            w.writerow([k] + vals + [avg])


def threshold_filter(fd: Dict[str, Dict[str, float]], threshold: float) -> Dict[str, float]:
    """gen files whose avg similarity ≥ threshold (:183-210)."""
    out = {}
    for gen_f, inner in fd.items():
        vals = list(inner.values())
        avg = sum(vals) / len(vals) if vals else 0
        if avg >= threshold:
            out[gen_f] = avg
    return out


def shard_indices(n: int, rank: Optional[int] = None, world: Optional[int] = None):
    """The reference's ``i % world_size == rank`` work split."""
    if rank is None:
        try:
            import jax

            rank, world = jax.process_index(), jax.process_count()
        except Exception:
            rank, world = 0, 1
    return [i for i in range(n) if i % world == rank]
