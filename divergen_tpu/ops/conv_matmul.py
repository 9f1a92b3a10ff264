"""3x3 conv as one im2col GEMM — MXU-shaped alternative to the native conv.

The SDXL UNet's resblock convs run at ~46% MFU under XLA's conv lowering
(STATUS.md trace, 31 ms of the 109 ms step). A 3x3 SAME conv is exactly a
(B·H·W, 9·Cin) @ (9·Cin, Cout) GEMM on the 9 shifted views; the contraction
depth 9·Cin (2880 at Cin=320) tiles the 128-deep MXU far better than the
conv lowering's per-tap accumulation. Param layout matches ``nn.Conv``
(kernel (3, 3, Cin, Cout) + bias), so checkpoints and converters are
unchanged; the UNet exposes it behind ``conv_matmul=True`` for the perf
sweep to A/B on hardware.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp
from jax import Array


def conv3x3_im2col(x: Array, kernel: Array, bias: Array | None = None) -> Array:
    """SAME-padded 3x3 conv via one im2col GEMM. x (B,H,W,Cin); kernel
    HWIO (3,3,Cin,Cout). Numerically identical contraction order per tap
    group; f32 accumulation."""
    b, h, w, cin = x.shape
    cout = kernel.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    taps = [
        xp[:, dy : dy + h, dx : dx + w, :]
        for dy in range(3)
        for dx in range(3)
    ]
    patches = jnp.concatenate(taps, axis=-1).reshape(-1, 9 * cin)
    wmat = kernel.reshape(9 * cin, cout)
    y = jnp.dot(patches, wmat, preferred_element_type=jnp.float32)
    y = y.reshape(b, h, w, cout).astype(x.dtype)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def conv3x3_tapsum(x: Array, kernel: Array, bias: Array | None = None) -> Array:
    """SAME-padded 3x3 conv as 9 accumulated (B·H·W, Cin)@(Cin, Cout) GEMMs
    — same MXU shape benefits as the im2col form WITHOUT materializing the
    9x patch buffer (the im2col concat costs 9x the activation HBM traffic
    when XLA fails to fuse it into the dot). Third A/B candidate for the
    hardware conv sweep."""
    b, h, w, cin = x.shape
    cout = kernel.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = None
    for dy in range(3):
        for dx in range(3):
            tap = xp[:, dy : dy + h, dx : dx + w, :].reshape(-1, cin)
            part = jnp.dot(tap, kernel[dy, dx], preferred_element_type=jnp.float32)
            acc = part if acc is None else acc + part
    y = acc.reshape(b, h, w, cout).astype(x.dtype)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


class Conv3x3MM(nn.Module):
    """Drop-in for ``nn.Conv(features, (3,3), padding=1)`` with identical
    param names/shapes; forward runs the im2col GEMM (``mode='im2col'``)
    or the 9-GEMM tap accumulation (``mode='tapsum'``)."""

    features: int
    dtype: Any = jnp.float32
    mode: str = "im2col"

    @nn.compact
    def __call__(self, x: Array) -> Array:
        cin = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, cin, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        fn = conv3x3_tapsum if self.mode == "tapsum" else conv3x3_im2col
        return fn(x.astype(self.dtype), kernel.astype(self.dtype), bias)
