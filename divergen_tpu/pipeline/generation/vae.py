"""SD/SDXL VAE (encoder + decoder), flax NHWC.

Latents → pixels for the generation stage (the diffusers AutoencoderKL the
reference's pipelines carry implicitly). Standard architecture: 4 scales,
(128, 256, 512, 512) channels, 2 res blocks each, one mid attention;
scaling_factor 0.13025 for SDXL / 0.18215 for SD1.x.
"""
from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import Array

from .unet import GroupNorm32, _attention


class VAEResBlock(nn.Module):
    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = nn.silu(GroupNorm32(dtype=self.dtype, name="norm1")(x))
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv1")(h)
        h = nn.silu(GroupNorm32(dtype=self.dtype, name="norm2")(h))
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="shortcut")(x)
        return x + h


class VAEAttention(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        y = GroupNorm32(dtype=self.dtype, name="norm")(x).reshape(b, h * w, c)
        q = nn.Dense(c, dtype=self.dtype, name="q")(y)
        k = nn.Dense(c, dtype=self.dtype, name="k")(y)
        v = nn.Dense(c, dtype=self.dtype, name="v")(y)
        o = _attention(q, k, v, heads=1)
        o = nn.Dense(c, dtype=self.dtype, name="proj_out")(o)
        return x + o.reshape(b, h, w, c)


class VAEDecoder(nn.Module):
    channels: Tuple[int, ...] = (128, 256, 512, 512)
    latent_channels: int = 4
    scaling_factor: float = 0.13025  # SDXL; SD1.x = 0.18215
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, latents: Array) -> Array:
        z = latents.astype(self.dtype) / self.scaling_factor
        ch = self.channels[-1]
        x = nn.Conv(self.latent_channels, (1, 1), dtype=self.dtype, name="post_quant_conv")(z)
        x = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(x)
        x = VAEResBlock(ch, self.dtype, name="mid_res0")(x)
        x = VAEAttention(self.dtype, name="mid_attn")(x)
        x = VAEResBlock(ch, self.dtype, name="mid_res1")(x)
        for lvl, ch in enumerate(reversed(self.channels)):
            for i in range(3):
                x = VAEResBlock(ch, self.dtype, name=f"up{lvl}_res{i}")(x)
            if lvl < len(self.channels) - 1:
                b, h, w, c = x.shape
                x = jax.image.resize(x, (b, 2 * h, 2 * w, c), "nearest")
                x = nn.Conv(c, (3, 3), padding=1, dtype=self.dtype, name=f"up{lvl}_conv")(x)
        x = nn.silu(GroupNorm32(dtype=self.dtype, name="norm_out")(x))
        x = nn.Conv(3, (3, 3), padding=1, dtype=jnp.float32, name="conv_out")(x)
        return x  # (-1, 1) range


class VAEEncoder(nn.Module):
    channels: Tuple[int, ...] = (128, 256, 512, 512)
    latent_channels: int = 4
    scaling_factor: float = 0.13025
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images: Array, rng: Array | None = None) -> Array:
        """images in (-1, 1); returns scaled latents (mode if rng None)."""
        x = nn.Conv(self.channels[0], (3, 3), padding=1, dtype=self.dtype, name="conv_in")(
            images.astype(self.dtype)
        )
        for lvl, ch in enumerate(self.channels):
            for i in range(2):
                x = VAEResBlock(ch, self.dtype, name=f"down{lvl}_res{i}")(x)
            if lvl < len(self.channels) - 1:
                x = nn.Conv(ch, (3, 3), strides=(2, 2), padding=1, dtype=self.dtype,
                            name=f"down{lvl}_conv")(x)
        ch = self.channels[-1]
        x = VAEResBlock(ch, self.dtype, name="mid_res0")(x)
        x = VAEAttention(self.dtype, name="mid_attn")(x)
        x = VAEResBlock(ch, self.dtype, name="mid_res1")(x)
        x = nn.silu(GroupNorm32(dtype=self.dtype, name="norm_out")(x))
        x = nn.Conv(2 * self.latent_channels, (3, 3), padding=1, dtype=jnp.float32, name="conv_out")(x)
        x = nn.Conv(2 * self.latent_channels, (1, 1), dtype=jnp.float32, name="quant_conv")(x)
        mean, logvar = jnp.split(x, 2, axis=-1)
        if rng is not None:
            mean = mean + jnp.exp(0.5 * jnp.clip(logvar, -30, 20)) * jax.random.normal(
                rng, mean.shape
            )
        return mean * self.scaling_factor
