"""Batched padded image tensor with per-image true sizes.

Counterpart of detectron2 ``structures/image_list.py:11`` (``ImageList``).
The reference pads a python list of CHW tensors to a common stride-aligned
size at every step; here batches are *born* padded — the host loader emits
``(B, H, W, C)`` NHWC at a fixed train size, and ``image_sizes`` carries the
true (unpadded) ``(h, w)`` per image for coordinate clipping and postprocess.
NHWC (channels-last) is the TPU-preferred conv layout.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import Array
from flax import struct


@struct.dataclass
class ImageList:
    tensor: Array  # (B, H, W, C) padded images
    image_sizes: Array  # (B, 2) int32 true (h, w)

    def __len__(self) -> int:
        return self.tensor.shape[0]

    @property
    def padded_size(self) -> Tuple[int, int]:
        return self.tensor.shape[1], self.tensor.shape[2]

    def padding_mask(self) -> Array:
        """(B, H, W) bool — True on real pixels, False on padding."""
        b, h, w = self.tensor.shape[:3]
        ys = jax.lax.broadcasted_iota(jnp.int32, (b, h, w), 1)
        xs = jax.lax.broadcasted_iota(jnp.int32, (b, h, w), 2)
        return (ys < self.image_sizes[:, 0, None, None]) & (
            xs < self.image_sizes[:, 1, None, None]
        )

    @staticmethod
    def from_tensors(
        tensor: Array, image_sizes: Array, size_divisibility: int = 0
    ) -> "ImageList":
        """Pad H/W up to a multiple of ``size_divisibility`` (ref :74-115)."""
        if size_divisibility > 1:
            b, h, w, c = tensor.shape
            s = size_divisibility
            nh = -(-h // s) * s
            nw = -(-w // s) * s
            tensor = jnp.pad(tensor, ((0, 0), (0, nh - h), (0, nw - w), (0, 0)))
        return ImageList(tensor=tensor, image_sizes=image_sizes)
