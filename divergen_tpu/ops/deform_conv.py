"""Deformable convolution v1/v2 — XLA gather formulation.

TPU-native answer to the reference's CUDA kernels (SURVEY.md §2.4:
``detectron2/layers/csrc/deformable/deform_conv_cuda*.cu`` behind
``detectron2/layers/deform_conv.py:61-254``; used by the DLA/CenterNet
backbone variants, not by the Swin/ResNet LVIS config).

Formulation: for every output position and kernel tap, bilinear-sample the
input at ``base + dilation*tap + offset`` (deformable im2col), then one
matmul with the (K*K*Cin, Cout) kernel — the gather feeds the MXU a dense
contraction, which is how a TPU wants this op.

v2 ("modulated") multiplies each sampled tap by a sigmoid mask.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import Array


def _bilinear_hwc(img: Array, y: Array, x: Array) -> Array:
    """img (H, W, C); y/x (...,) → (..., C); zeros outside."""
    h, w, _ = img.shape
    inb = (y > -1.0) & (y < h) & (x > -1.0) & (x < w)
    y = jnp.clip(y, 0.0, h - 1.0)
    x = jnp.clip(x, 0.0, w - 1.0)
    y0 = jnp.floor(y).astype(jnp.int32)
    x0 = jnp.floor(x).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    ly = (y - y0)[..., None]
    lx = (x - x0)[..., None]
    out = (
        img[y0, x0] * (1 - ly) * (1 - lx)
        + img[y0, x1] * (1 - ly) * lx
        + img[y1, x0] * ly * (1 - lx)
        + img[y1, x1] * ly * lx
    )
    return out * inb[..., None]


def deform_conv2d(
    x: Array,  # (B, H, W, Cin) NHWC
    offset: Array,  # (B, Ho, Wo, 2*K*K)  (dy, dx interleaved per tap)
    kernel: Array,  # (K, K, Cin, Cout)
    mask: Optional[Array] = None,  # (B, Ho, Wo, K*K) v2 modulation (pre-sigmoid no)
    stride: int = 1,
    padding: int = 1,
    dilation: int = 1,
    bias: Optional[Array] = None,
) -> Array:
    """Deformable conv forward. ``mask=None`` → v1; with mask → v2
    (values used as-is — apply sigmoid at the call site, matching
    torchvision ``deform_conv2d`` semantics)."""
    b, h, w, cin = x.shape
    k = kernel.shape[0]
    ho = (h + 2 * padding - dilation * (k - 1) - 1) // stride + 1
    wo = (w + 2 * padding - dilation * (k - 1) - 1) // stride + 1
    assert offset.shape[1:3] == (ho, wo), (offset.shape, ho, wo)

    # base sampling grid: output position * stride - padding + tap*dilation
    oy = jnp.arange(ho) * stride - padding
    ox = jnp.arange(wo) * stride - padding
    ty = jnp.arange(k) * dilation
    tx = jnp.arange(k) * dilation
    # (Ho, Wo, K, K)
    gy = oy[:, None, None, None] + ty[None, None, :, None]
    gx = ox[None, :, None, None] + tx[None, None, None, :]

    off = offset.reshape(b, ho, wo, k, k, 2)
    dy = off[..., 0]
    dx = off[..., 1]

    def per_image(img, dyi, dxi, mi):
        sy = gy[None].squeeze(0) + dyi  # (Ho, Wo, K, K)
        sx = gx[None].squeeze(0) + dxi
        samp = _bilinear_hwc(img, sy, sx)  # (Ho, Wo, K, K, Cin)
        if mi is not None:
            samp = samp * mi[..., None]
        cols = samp.reshape(ho, wo, k * k * cin)
        return cols @ kernel.reshape(k * k * cin, -1)

    if mask is not None:
        m = mask.reshape(b, ho, wo, k, k)
        out = jax.vmap(per_image)(x, dy, dx, m)
    else:
        out = jax.vmap(lambda img, a, c: per_image(img, a, c, None))(x, dy, dx)
    if bias is not None:
        out = out + bias
    return out
