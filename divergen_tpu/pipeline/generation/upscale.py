"""Stage-III x4 upscaler: latent-diffusion super-resolution pipeline.

Counterpart of the reference's optional third generation stage
(``DiverGen/generation/txt2img_diffusers_stages_from_txt.py:180-198,313-325``:
``stabilityai/stable-diffusion-x4-upscaler`` applied per image after stage
II). Architecture facts follow the public SD-x4-upscaler config: the UNet
denoises a 4-channel latent *concatenated with the 3-channel low-res RGB
image* (7 input channels), conditioned on text and on a noise-level
timestep that controls how much noise is added to the conditioning image
(``low_res_noise_level``). The same ``UNetSDXL`` module family provides the
network (different channel widths, no "text_time" add-embedding), and the
whole (steps × CFG) loop is one ``lax.scan`` like the base pipeline.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from .scheduler import (
    SchedulerConfig,
    add_noise,
    euler_init_noise_scale,
    euler_scale_input,
    euler_sigmas,
    euler_step,
    make_scheduler,
)
from .unet import UNetSDXL
from .vae import VAEDecoder


def upscaler_unet(dtype: Any = jnp.float32, tiny: bool = False) -> UNetSDXL:
    """SD-x4-upscaler UNet geometry: 7 in-channels (4 latent + 3 low-res
    RGB), 4 out, blocks (256, 512, 512, 1024) w/ attention on the inner
    levels, context dim 1024 (OpenCLIP-H text states)."""
    if tiny:
        return UNetSDXL(
            in_channels=7, out_channels=4, block_channels=(16, 32),
            transformer_depths=(0, 1), context_dim=32, head_dim=8,
            layers_per_block=1, num_class_embeds=1000, dtype=dtype,
        )
    return UNetSDXL(
        in_channels=7,
        out_channels=4,
        block_channels=(256, 512, 512, 1024),
        transformer_depths=(0, 1, 1, 1),
        context_dim=1024,
        head_dim=64,
        layers_per_block=2,
        num_class_embeds=1000,  # noise-level class conditioning
        dtype=dtype,
    )


class UpscalePipeline:
    """x4 latent-SR: (B, h, w, 3) RGB 0..255 → (B, 4h, 4w, 3)."""

    def __init__(
        self,
        unet: UNetSDXL,
        unet_params,
        vae: Optional[VAEDecoder] = None,
        vae_params=None,
        scheduler: Optional[SchedulerConfig] = None,
        steps: int = 25,
        guidance_scale: float = 7.5,
        low_res_noise_level: int = 100,
        low_res_scheduler: Optional[SchedulerConfig] = None,
    ):
        self.unet = unet
        self.unet_params = unet_params
        self.vae = vae
        self.vae_params = vae_params
        self.sched = scheduler or make_scheduler("scaled_linear")
        self.steps = steps
        self.guidance = guidance_scale
        # noise_level=100 matches the reference stage-III invocation
        # (txt2img_diffusers_stages_from_txt.py:313-325 passes the pipeline
        # default; the x4-upscaler pipeline default is 20, the reference
        # explicitly uses 100 via DATA.md recipe) and is fed to the UNet as
        # class conditioning AND to the low-res add_noise below.
        self.noise_level = int(low_res_noise_level)
        # diffusers low_res_scheduler for the x4 upscaler: DDPM scaled_linear
        # beta_start=1e-4, beta_end=2e-2
        self.low_res_sched = low_res_scheduler or make_scheduler(
            "scaled_linear", start=1e-4, end=2e-2
        )
        ts, sigmas = euler_sigmas(self.sched, steps)
        self._ts = jnp.asarray(ts, jnp.float32)
        self._sigmas = jnp.asarray(sigmas, jnp.float32)
        self._denoise = jax.jit(self._denoise_fn)

    def _denoise_fn(self, unet_params, latents, low_res, context, uncond_context):
        g = self.guidance
        sigmas = self._sigmas
        ts = self._ts
        b = latents.shape[0]
        ctx = jnp.concatenate([uncond_context, context], axis=0)
        low2 = jnp.concatenate([low_res, low_res], axis=0)
        nl2 = jnp.full((2 * b,), self.noise_level, jnp.int32)

        def body(lat, i):
            x = euler_scale_input(lat, sigmas[i])
            t = jnp.broadcast_to(ts[i], (b,))
            x2 = jnp.concatenate([x, x], axis=0)
            t2 = jnp.concatenate([t, t], axis=0)
            inp = jnp.concatenate([x2, low2], axis=-1)  # latent ‖ low-res RGB
            eps2 = self.unet.apply(unet_params, inp, t2, ctx, class_labels=nl2)
            eps_u, eps_c = jnp.split(eps2, 2, axis=0)
            eps = eps_u + g * (eps_c - eps_u)
            return euler_step(lat, eps.astype(lat.dtype), sigmas[i], sigmas[i + 1]), None

        latents, _ = jax.lax.scan(body, latents, jnp.arange(self.steps))
        return latents

    def upscale(
        self,
        rng: Array,
        images: Array,  # (B, h, w, 3) RGB 0..255
        context: Array,  # (B, L, D) cond text states
        uncond_context: Array,
        decode: bool = True,
    ):
        b, h, w, _ = images.shape
        k_lat, k_noise = jax.random.split(rng)
        # conditioning image in [-1, 1], noised with the low-res DDPM
        # scheduler's add_noise at t = noise_level (diffusers
        # StableDiffusionUpscalePipeline semantics); the same noise_level is
        # fed to the UNet as class conditioning in the denoise loop
        low = images.astype(jnp.float32) / 127.5 - 1.0
        low = add_noise(
            self.low_res_sched, low,
            jax.random.normal(k_noise, low.shape, jnp.float32),
            self.noise_level,
        )
        lat_shape = (b, h, w, 4)  # latent resolution == low-res pixels (x4 VAE)
        latents = (
            jax.random.normal(k_lat, lat_shape, jnp.float32)
            * euler_init_noise_scale(np.asarray(self._sigmas))
        )
        latents = self._denoise(self.unet_params, latents, low, context, uncond_context)
        if decode and self.vae is not None:
            img = self.vae.apply(self.vae_params, latents)  # 8x VAE... see note
            return jnp.clip((img + 1.0) * 127.5, 0, 255)
        return latents
