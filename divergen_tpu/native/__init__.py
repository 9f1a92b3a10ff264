"""Native (C++) kernels, compiled lazily and loaded through ctypes.

The framework's L0 native layer (SURVEY.md §2.4): greedy COCO matching and
RLE mask-IoU, the two host-side hot loops of evaluation — the same pieces
the reference accelerates with its vendored ``cocoeval.cpp`` torch
extension. Build happens once per machine (g++ -O3 -shared) into
``~/.cache/divergen_tpu``; every entry point falls back to numpy if the
toolchain is unavailable.
"""
from __future__ import annotations

import ctypes
import hashlib
import logging
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_SRC = os.path.join(os.path.dirname(__file__), "cocoeval.cpp")
_SRC2 = os.path.join(os.path.dirname(__file__), "mask_codec.cpp")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> Optional[str]:
    h = hashlib.sha1()
    for path in (_SRC, _SRC2):
        with open(path, "rb") as f:
            h.update(f.read())
    tag = h.hexdigest()[:12]
    cache = os.path.join(os.path.expanduser("~"), ".cache", "divergen_tpu")
    os.makedirs(cache, exist_ok=True)
    so = os.path.join(cache, f"libcocoeval_{tag}.so")
    if os.path.exists(so):
        return so
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, _SRC2, "-o", so + ".tmp"]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(so + ".tmp", so)
        return so
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        logger.warning("native build failed (%s); using numpy fallbacks", e)
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is None and not _tried:
        _tried = True
        so = _build()
        if so:
            lib = ctypes.CDLL(so)
            i64 = ctypes.c_int64
            lib.greedy_match.argtypes = [
                ctypes.c_void_p, i64, i64, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p, i64, ctypes.c_void_p, ctypes.c_void_p,
            ]
            lib.rle_iou.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, i64,
                ctypes.c_void_p, ctypes.c_void_p, i64,
                ctypes.c_void_p, ctypes.c_void_p,
            ]
            lib.rle_from_string.restype = i64
            lib.rle_from_string.argtypes = [
                ctypes.c_char_p, i64, ctypes.c_void_p,
            ]
            lib.paste_mask_rle.restype = i64
            lib.paste_mask_rle.argtypes = [
                ctypes.c_void_p, i64, i64, ctypes.c_void_p, i64, i64,
                ctypes.c_float, ctypes.c_void_p, i64,
            ]
            lib.rle_counts_to_string.restype = i64
            lib.rle_counts_to_string.argtypes = [
                ctypes.c_void_p, i64, ctypes.c_char_p, i64,
            ]
            lib.rle_string_to_counts.restype = i64
            lib.rle_string_to_counts.argtypes = [
                ctypes.c_char_p, i64, ctypes.c_void_p, i64,
            ]
            _lib = lib
    return _lib


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.c_void_p)


def greedy_match(
    ious: np.ndarray, g_ignore: np.ndarray, iscrowd: np.ndarray, thrs: np.ndarray
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """(T,D) matched gt-index+1 and ignore flags; None → caller falls back."""
    lib = get_lib()
    if lib is None:
        return None
    D, G = ious.shape
    T = len(thrs)
    ious = np.ascontiguousarray(ious, np.float64)
    gi = np.ascontiguousarray(g_ignore, np.uint8)
    ic = np.ascontiguousarray(iscrowd, np.uint8)
    th = np.ascontiguousarray(thrs, np.float64)
    matched = np.zeros((T, D), np.int64)
    dt_ig = np.zeros((T, D), np.uint8)
    lib.greedy_match(_ptr(ious), D, G, _ptr(gi), _ptr(ic), _ptr(th), T, _ptr(matched), _ptr(dt_ig))
    return matched, dt_ig.astype(bool)


def _runs_of(rle: dict) -> np.ndarray:
    counts = rle["counts"]
    if isinstance(counts, str):
        counts = counts.encode()
    if isinstance(counts, bytes):
        lib = get_lib()
        if lib is not None:
            buf = np.zeros(len(counts) + 1, np.uint32)
            n = lib.rle_from_string(counts, len(counts), _ptr(buf))
            return buf[:n]
        from ..utils.mask_codec import _string_to_counts

        return np.asarray(_string_to_counts(counts), np.uint32)
    return np.asarray(counts, np.uint32)


def rle_iou_matrix(dets: List[dict], gts: List[dict], iscrowd: np.ndarray) -> Optional[np.ndarray]:
    """Pairwise IoU on compressed RLEs without decoding; None → fallback."""
    lib = get_lib()
    if lib is None or not dets or not gts:
        return None
    d_runs = [_runs_of(r) for r in dets]
    g_runs = [_runs_of(r) for r in gts]
    d_flat = np.concatenate(d_runs) if d_runs else np.zeros(0, np.uint32)
    g_flat = np.concatenate(g_runs) if g_runs else np.zeros(0, np.uint32)
    d_off = np.zeros(len(d_runs) + 1, np.int64)
    np.cumsum([len(r) for r in d_runs], out=d_off[1:])
    g_off = np.zeros(len(g_runs) + 1, np.int64)
    np.cumsum([len(r) for r in g_runs], out=g_off[1:])
    out = np.zeros((len(dets), len(gts)), np.float64)
    ic = np.ascontiguousarray(iscrowd, np.uint8)
    lib.rle_iou(
        _ptr(np.ascontiguousarray(d_flat)), _ptr(d_off), len(dets),
        _ptr(np.ascontiguousarray(g_flat)), _ptr(g_off), len(gts),
        _ptr(ic), _ptr(out),
    )
    return out


def paste_mask_rle(prob: np.ndarray, box: np.ndarray, h: int, w: int,
                   thresh: float = 0.5) -> Optional[dict]:
    """Fused paste + compressed-RLE encode of one detection mask.

    Equivalent to ``rle_encode(paste_mask_np(prob, box, h, w))`` but never
    materializes the (h, w) canvas (native/mask_codec.cpp). Returns a
    pycocotools-style {"size", "counts": str} dict, or None when the native
    lib is unavailable (caller falls back to the numpy path)."""
    lib = get_lib()
    if lib is None:
        return None
    prob = np.ascontiguousarray(prob, np.float32)
    box = np.ascontiguousarray(box, np.float32)
    # runs per pasted column are bounded by the crop's row count (each
    # threshold crossing of the upsampled profile), so ~2*mh+4 per column
    cap = int(w) * (2 * int(prob.shape[0]) + 4) + 16
    counts = np.zeros(cap, np.int64)
    m = lib.paste_mask_rle(_ptr(prob), prob.shape[0], prob.shape[1], _ptr(box),
                           h, w, ctypes.c_float(thresh), _ptr(counts), cap)
    if m < 0:  # capacity exceeded (degenerate mask) — let caller fall back
        return None
    scap = int(m) * 12 + 16
    s = ctypes.create_string_buffer(scap)
    n = lib.rle_counts_to_string(_ptr(counts), m, s, scap)
    if n < 0:
        return None
    return {"size": [int(h), int(w)], "counts": s.raw[: int(n)].decode()}
