"""Text→image pipeline: one jitted CFG denoising scan + VAE decode.

Counterpart of the reference's diffusers-driven stage loop
(``DiverGen/generation/txt2img_diffusers_stages_from_txt.py:240-327``:
encode_prompt → stage denoise loops → save). TPU redesign: the whole
(steps × CFG) loop is ONE ``lax.scan`` inside jit — no per-step Python,
no host sync until the final decode; batch across prompts*images to fill
the MXU; shard the batch across chips with a data mesh when available.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from .scheduler import (
    SchedulerConfig,
    dpmpp_2m_step,
    dpmpp_init_noise_scale,
    dpmpp_timesteps_sigmas,
    euler_init_noise_scale,
    euler_scale_input,
    euler_sigmas,
    euler_step,
    make_scheduler,
)
from .unet import UNetSDXL
from .vae import VAEDecoder


class SDXLPipeline:
    """unet + vae + text embedding providers, compiled once per shape."""

    def __init__(
        self,
        unet: UNetSDXL,
        unet_params,
        vae: Optional[VAEDecoder] = None,
        vae_params=None,
        scheduler: Optional[SchedulerConfig] = None,
        steps: int = 50,
        guidance_scale: float = 7.5,
        encoder_reuse: bool = False,
        int8: bool = False,
        mesh=None,  # jax.sharding.Mesh with a "data" axis → batch sharded
        sampler: str = "euler",  # euler (SDXL DiffusionPipeline default) | dpmpp_2m
    ):
        # int8: W8A8 dynamic quantization of the transformer matmuls
        # (ops/quant.py; v5e int8 MXU = 2x bf16 peak). ``unet`` must be
        # built with quant=True and ``unet_params`` may be plain float —
        # they're quantized once per denoise call, outside the step scan.
        self.int8 = int8
        self.unet = unet
        self.unet_params = unet_params
        self.vae = vae
        self.vae_params = vae_params
        self.sched = scheduler or make_scheduler("scaled_linear")
        self.steps = steps
        self.guidance = guidance_scale
        # Faster-Diffusion encoder reuse (arXiv:2312.09608, PAPERS.md):
        # even steps run the full UNet and cache the down-path features;
        # odd steps re-run only mid+up on the cache with the new timestep.
        # ~35% of the UNet is skipped on reuse steps; opt-in because the
        # outputs approximate (closely) the exact 50-step trajectory.
        self.encoder_reuse = encoder_reuse
        # multi-chip generation: batch dim sharded over the mesh's "data"
        # axis, params replicated; GSPMD partitions the whole denoise scan
        # (no collectives needed — generation is embarrassingly parallel
        # over images, the mesh just scales batch throughput per host)
        self.mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            self._batch_sharding = NamedSharding(mesh, P("data"))
            self._replicated = NamedSharding(mesh, P())
            self.unet_params = jax.device_put(self.unet_params, self._replicated)
            if self.vae_params is not None:
                self.vae_params = jax.device_put(self.vae_params, self._replicated)
        if sampler not in ("euler", "dpmpp_2m"):
            raise ValueError(f"unknown sampler {sampler!r}")
        self.sampler = sampler
        if sampler == "dpmpp_2m":
            # DPM-Solver++ 2M: the standard quality-neutral 25–30-step
            # setting (~2x fewer UNet evals than Euler-50 at equal quality)
            ts, sigmas = dpmpp_timesteps_sigmas(self.sched, steps)
            self._init_scale = dpmpp_init_noise_scale(sigmas)
        else:
            ts, sigmas = euler_sigmas(self.sched, steps)
            self._init_scale = euler_init_noise_scale(sigmas)
        self._ts = jnp.asarray(ts, jnp.float32)
        self._sigmas = jnp.asarray(sigmas, jnp.float32)
        self._denoise = jax.jit(self._denoise_fn)

    def _zero_encoder_cache(self, unet_params, x2, t2, ctx, pl, tid):
        """Scan-carry template for the Faster-Diffusion down-path cache:
        shapes via ``jax.eval_shape`` (zero compute) — the old full UNet
        forward here only supplied the carry STRUCTURE; its eps was
        discarded and step 0 recomputed the same pass inside the scan."""
        import jax

        shapes = jax.eval_shape(
            lambda p: self.unet.apply(
                p, x2, t2, ctx, pl, tid, return_encoder=True
            )[1],
            unet_params,
        )
        return jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)

    def _denoise_fn(self, unet_params, latents, context, uncond_context,
                    pooled, uncond_pooled, time_ids):
        g = self.guidance
        sigmas = self._sigmas
        ts = self._ts

        if self.int8:
            # quantize the transformer weights ONCE per generate call —
            # the elementwise pass over the UNet weights amortizes over
            # every step of the scan below
            from ...ops.quant import quantize_param_tree
            from .unet import transformer_quant_select

            unet_params = quantize_param_tree(
                unet_params, select=transformer_quant_select
            )

        ctx = jnp.concatenate([uncond_context, context], axis=0)
        pl = (
            jnp.concatenate([uncond_pooled, pooled], axis=0)
            if pooled is not None
            else None
        )
        tid = jnp.concatenate([time_ids, time_ids], axis=0) if time_ids is not None else None

        def unet_in(lat, i):
            sigma = sigmas[i]
            x = euler_scale_input(lat, sigma)
            t = jnp.broadcast_to(ts[i], (lat.shape[0],))
            return jnp.concatenate([x, x], axis=0), jnp.concatenate([t, t], axis=0)

        def cfg_step(lat, i, eps2):
            eps_u, eps_c = jnp.split(eps2, 2, axis=0)
            eps = eps_u + g * (eps_c - eps_u)
            return euler_step(lat, eps.astype(lat.dtype), sigmas[i], sigmas[i + 1])

        if self.sampler == "dpmpp_2m":
            # multistep: carry the previous step's x0 prediction

            if self.encoder_reuse:
                # Faster-Diffusion cache (arXiv:2312.09608) under the 2M
                # solver: full UNet on even steps, mid+up-only on odd steps
                # over the cached down-path — same alternation as the Euler
                # path; the multistep x0 history is carried alongside
                x2_0, t2_0 = unet_in(latents, 0)
                cache0 = self._zero_encoder_cache(
                    unet_params, x2_0, t2_0, ctx, pl, tid
                )

                def body(carry, i):
                    lat, x0_prev, cache = carry
                    x2, t2 = unet_in(lat, i)

                    def full(x2, t2, cache):
                        return self.unet.apply(
                            unet_params, x2, t2, ctx, pl, tid,
                            return_encoder=True,
                        )

                    def reuse(x2, t2, cache):
                        eps2 = self.unet.apply(
                            unet_params, x2, t2, ctx, pl, tid,
                            cached_encoder=cache,
                        )
                        return eps2, cache

                    eps2, cache = jax.lax.cond(
                        i % 2 == 0, full, reuse, x2, t2, cache
                    )
                    eps_u, eps_c = jnp.split(eps2, 2, axis=0)
                    eps = (eps_u + g * (eps_c - eps_u)).astype(lat.dtype)
                    x0 = lat - sigmas[i] * eps
                    lat = dpmpp_2m_step(lat, x0, x0_prev, i, sigmas, self.steps)
                    return (lat, x0, cache), None

                (latents, _, _), _ = jax.lax.scan(
                    body, (latents, jnp.zeros_like(latents), cache0),
                    jnp.arange(self.steps),
                )
                return latents

            def body(carry, i):
                lat, x0_prev = carry
                x2, t2 = unet_in(lat, i)
                eps2 = self.unet.apply(unet_params, x2, t2, ctx, pl, tid)
                eps_u, eps_c = jnp.split(eps2, 2, axis=0)
                eps = (eps_u + g * (eps_c - eps_u)).astype(lat.dtype)
                x0 = lat - sigmas[i] * eps
                lat = dpmpp_2m_step(lat, x0, x0_prev, i, sigmas, self.steps)
                return (lat, x0), None

            (latents, _), _ = jax.lax.scan(
                body, (latents, jnp.zeros_like(latents)), jnp.arange(self.steps)
            )
            return latents

        if not self.encoder_reuse:

            def body(lat, i):
                x2, t2 = unet_in(lat, i)
                eps2 = self.unet.apply(unet_params, x2, t2, ctx, pl, tid)
                return cfg_step(lat, i, eps2), None

            latents, _ = jax.lax.scan(body, latents, jnp.arange(self.steps))
            return latents

        # encoder-reuse path: carry the cached down-path features
        x2_0, t2_0 = unet_in(latents, 0)
        cache0 = self._zero_encoder_cache(unet_params, x2_0, t2_0, ctx, pl, tid)

        def body(carry, i):
            lat, cache = carry

            def full(lat, cache):
                x2, t2 = unet_in(lat, i)
                eps2, cache = self.unet.apply(
                    unet_params, x2, t2, ctx, pl, tid, return_encoder=True
                )
                return cfg_step(lat, i, eps2), cache

            def reuse(lat, cache):
                x2, t2 = unet_in(lat, i)
                eps2 = self.unet.apply(
                    unet_params, x2, t2, ctx, pl, tid, cached_encoder=cache
                )
                return cfg_step(lat, i, eps2), cache

            lat, cache = jax.lax.cond(i % 2 == 0, full, reuse, lat, cache)
            return (lat, cache), None

        (latents, _), _ = jax.lax.scan(body, (latents, cache0), jnp.arange(self.steps))
        return latents

    def generate(
        self,
        rng: Array,
        context: Array,  # (B, L, D) cond text states
        uncond_context: Array,
        pooled: Optional[Array] = None,
        uncond_pooled: Optional[Array] = None,
        height: int = 1024,
        width: int = 1024,
        decode: bool = True,
    ):
        b = context.shape[0]
        lat_shape = (b, height // 8, width // 8, self.unet.in_channels)
        latents = jax.random.normal(rng, lat_shape, jnp.float32) * self._init_scale
        if self.mesh is not None:
            latents = jax.device_put(latents, self._batch_sharding)
            context = jax.device_put(context, self._batch_sharding)
            uncond_context = jax.device_put(uncond_context, self._batch_sharding)
            if pooled is not None:
                pooled = jax.device_put(pooled, self._batch_sharding)
                uncond_pooled = jax.device_put(uncond_pooled, self._batch_sharding)
        time_ids = None
        if pooled is not None:
            # SDXL micro-conditioning: (orig_h, orig_w, crop_y, crop_x, tgt_h, tgt_w)
            time_ids = jnp.tile(
                jnp.asarray([height, width, 0, 0, height, width], jnp.float32)[None], (b, 1)
            )
        latents = self._denoise(
            self.unet_params, latents, context, uncond_context,
            pooled, uncond_pooled, time_ids,
        )
        if decode and self.vae is not None:
            # decode per image under one jit: at 1024² the decoder's
            # full-res activations are ~GB-scale per image, so a whole-batch
            # decode OOMs HBM at B≥4 while buying nothing (convs at 1024²
            # saturate the MXU at batch 1)
            if latents.shape[0] > 1 and self.mesh is None:
                img = jax.lax.map(
                    lambda l: self.vae.apply(self.vae_params, l[None])[0], latents
                )
            else:
                img = self.vae.apply(self.vae_params, latents)
            return jnp.clip((img + 1.0) * 127.5, 0, 255)
        return latents


def images_to_uint8(images: Array) -> np.ndarray:
    return np.asarray(images).astype(np.uint8)
