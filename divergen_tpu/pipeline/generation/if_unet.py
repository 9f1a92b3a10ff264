"""DeepFloyd-IF cascade UNets (stage I 64² txt2img, stage II 64→256), flax NHWC.

The reference's actual generator loads ``IF-I-XL-v1.0`` / ``IF-II-L-v1.0``
through diffusers (``DiverGen/generation/txt2img_diffusers_stages_from_txt.py:
136-198``; the TPU rebuild's headline generator is SDXL per BASELINE.json,
but the IF cascade architecture is part of the reference surface). This is
the Imagen-style pixel-space UNet the diffusers ``UNet2DConditionModel``
builds for the IF configs:

* ``ResnetDownsampleBlock2D`` / ``SimpleCrossAttnDownBlock2D`` towers —
  resnets with ``resnet_time_scale_shift="scale_shift"`` (FiLM from the
  time embedding), GELU activations, and downsampling INSIDE a resnet
  (``ResnetBlock2D(down=True)``), not a strided conv;
* ``AttnAddedKVProcessor`` attention: queries from the group-normed
  spatial tokens, keys/values the concat of projected T5 encoder states
  and the spatial self K/V — one fused attention per resnet;
* ``addition_embed_type="text"``: attention-pooled raw T5 states added to
  the time embedding (``TextTimeEmbedding``);
* 2·C output channels: ε plus the learned-range variance interpolant
  consumed by ``scheduler.ddpm_learned_range_step``;
* stage II: 6 input channels (noisy 256² latents ⊕ bilinear-upscaled 64²
  stage-I output), ``class_embed_type="timestep"`` noise-level
  conditioning, and image noising of the conditioning frame.

Widths are constructor parameters; the ``if_i_xl`` / ``if_ii_l``
classmethods default to the public release sizings (4.3B / 1.2B class).
All shapes static; attention runs as batched MXU einsums (sequence ≤ 4096
tokens — the 64²/32² levels — fits VMEM-tiled XLA attention; the SDXL
path's Pallas kernels stay the perf-critical ones).
"""
from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import Array

from .scheduler import (
    SchedulerConfig,
    add_noise,
    ddpm_learned_range_step,
    ddpm_timesteps,
    make_scheduler,
)
from .unet import timestep_embedding


class AttentionPooling(nn.Module):
    """diffusers ``AttentionPooling`` (UnCLIP/Imagen): a class token =
    mean(x) + learned positional embedding attends over [cls; x]."""

    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:  # (B, L, D) -> (B, D)
        d = x.shape[-1]
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(d**-0.5),
            (1, d),
        )
        cls = x.mean(axis=1, keepdims=True) + pos[None].astype(x.dtype)
        tokens = jnp.concatenate([cls, x], axis=1)  # (B, L+1, D)
        dh = d // self.num_heads
        q = nn.Dense(d, dtype=self.dtype, name="q_proj")(cls)
        k = nn.Dense(d, dtype=self.dtype, name="k_proj")(tokens)
        v = nn.Dense(d, dtype=self.dtype, name="v_proj")(tokens)

        def split(t):
            return t.reshape(t.shape[0], t.shape[1], self.num_heads, dh)

        q, k, v = split(q), split(k), split(v)
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                       preferred_element_type=jnp.float32) / math.sqrt(dh)
        p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", p, v)
        return out.reshape(out.shape[0], 1, d)[:, 0]


class TextTimeEmbedding(nn.Module):
    """diffusers ``TextTimeEmbedding``: LN → attention pool → proj → LN."""

    time_embed_dim: int
    num_heads: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, ctx: Array) -> Array:  # (B, L, D) -> (B, T)
        h = nn.LayerNorm(dtype=self.dtype, name="norm1")(ctx)
        h = AttentionPooling(self.num_heads, dtype=self.dtype, name="pool")(h)
        h = nn.Dense(self.time_embed_dim, dtype=self.dtype, name="proj")(h)
        return nn.LayerNorm(dtype=self.dtype, name="norm2")(h)


def _gn(x: Array, name: str, groups: int = 32) -> Array:
    return nn.GroupNorm(num_groups=min(groups, x.shape[-1]),
                        epsilon=1e-5, name=name)(x)


class IFResBlock(nn.Module):
    """``ResnetBlock2D`` with ``time_embedding_norm="scale_shift"``:
    GN→GELU→conv, FiLM(scale,shift from temb), GN→GELU→conv, 1×1 skip.
    ``down``/``up`` resample both branches inside the block (avg-pool /
    nearest ×2), matching the Resnet(Down|Up)sampleBlock2D samplers."""

    out_channels: int
    down: bool = False
    up: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, temb: Array) -> Array:
        cin = x.shape[-1]
        h = jax.nn.gelu(_gn(x, "norm1"))
        if self.down:
            x = nn.avg_pool(x, (2, 2), strides=(2, 2))
            h = nn.avg_pool(h, (2, 2), strides=(2, 2))
        elif self.up:
            b, hh, ww, c = x.shape
            x = jax.image.resize(x, (b, hh * 2, ww * 2, c), "nearest")
            h = jax.image.resize(h, (b, hh * 2, ww * 2, c), "nearest")
        h = nn.Conv(self.out_channels, (3, 3), dtype=self.dtype, name="conv1")(h)
        e = nn.Dense(2 * self.out_channels, dtype=self.dtype,
                     name="time_emb_proj")(jax.nn.gelu(temb))
        scale, shift = jnp.split(e[:, None, None, :], 2, axis=-1)
        h = _gn(h, "norm2") * (1.0 + scale) + shift
        h = jax.nn.gelu(h)
        h = nn.Conv(self.out_channels, (3, 3), dtype=self.dtype, name="conv2")(h)
        if cin != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name="conv_shortcut")(x)
        return x + h


class AddedKVAttention(nn.Module):
    """``Attention`` + ``AttnAddedKVProcessor``: q from group-normed spatial
    tokens; K/V = [projected encoder states ; spatial self K/V]; residual."""

    head_dim: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, ctx: Array) -> Array:  # x (B,H,W,C)
        b, hh, ww, c = x.shape
        heads = max(c // self.head_dim, 1)
        tokens = x.reshape(b, hh * ww, c)
        n = _gn(tokens, "group_norm")
        q = nn.Dense(c, dtype=self.dtype, name="to_q")(n)
        k_self = nn.Dense(c, dtype=self.dtype, name="to_k")(n)
        v_self = nn.Dense(c, dtype=self.dtype, name="to_v")(n)
        k_ctx = nn.Dense(c, dtype=self.dtype, name="add_k_proj")(ctx)
        v_ctx = nn.Dense(c, dtype=self.dtype, name="add_v_proj")(ctx)
        k = jnp.concatenate([k_ctx, k_self], axis=1)
        v = jnp.concatenate([v_ctx, v_self], axis=1)

        def split(t):
            return t.reshape(t.shape[0], t.shape[1], heads, c // heads)

        qh, kh, vh = split(q), split(k), split(v)
        s = jnp.einsum("bqhd,bkhd->bhqk", qh, kh,
                       preferred_element_type=jnp.float32)
        s = s / math.sqrt(c // heads)
        p = jax.nn.softmax(s, axis=-1).astype(vh.dtype)
        o = jnp.einsum("bhqk,bkhd->bqhd", p, vh).reshape(b, hh * ww, c)
        o = nn.Dense(c, dtype=self.dtype, name="to_out")(o)
        return x + o.reshape(b, hh, ww, c)


class IFUNet(nn.Module):
    """IF-config ``UNet2DConditionModel``. ``channels[i]`` per level;
    level 0 has no attention (``ResnetDownsampleBlock2D``), deeper levels
    pair every resnet with an added-KV attention — stage II keeps the two
    shallowest levels attention-free (``attn_start``)."""

    channels: Sequence[int] = (704, 1408, 2816, 2816)
    layers_per_block: int = 3
    in_channels: int = 3
    out_channels: int = 6  # ε ⊕ learned-range variance
    encoder_dim: int = 4096  # raw T5-XXL states
    context_dim: Optional[int] = None  # encoder_hid_proj target (None: raw)
    head_dim: int = 64
    pool_heads: int = 64
    attn_start: int = 1  # first level with cross-attention
    noise_level_cond: bool = False  # stage II class_embed_type="timestep"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        sample: Array,  # (B, H, W, in_channels), pixel space in [-1, 1]
        t: Array,  # (B,)
        ctx: Array,  # (B, L, encoder_dim) T5 states
        noise_level: Optional[Array] = None,  # (B,) stage II aug level
    ) -> Array:
        c0 = self.channels[0]
        tdim = 4 * c0
        emb = timestep_embedding(t, c0)
        emb = nn.Dense(tdim, dtype=self.dtype, name="time_emb_1")(emb)
        emb = nn.Dense(tdim, dtype=self.dtype, name="time_emb_2")(jax.nn.gelu(emb))
        if self.noise_level_cond:
            ne = timestep_embedding(noise_level, c0)
            ne = nn.Dense(tdim, dtype=self.dtype, name="class_emb_1")(ne)
            ne = nn.Dense(tdim, dtype=self.dtype, name="class_emb_2")(jax.nn.gelu(ne))
            emb = emb + ne
        # attention-pooled RAW T5 states (diffusers applies add_embedding
        # before encoder_hid_proj)
        emb = emb + TextTimeEmbedding(
            tdim, self.pool_heads, dtype=self.dtype, name="add_embedding"
        )(ctx.astype(self.dtype))
        if self.context_dim is not None:
            ctx = nn.Dense(self.context_dim, dtype=self.dtype,
                           name="encoder_hid_proj")(ctx)
        ctx = ctx.astype(self.dtype)

        x = nn.Conv(c0, (3, 3), dtype=self.dtype, name="conv_in")(sample.astype(self.dtype))
        skips = [x]
        n_levels = len(self.channels)
        for i, ch in enumerate(self.channels):
            cross = i >= self.attn_start
            for j in range(self.layers_per_block):
                x = IFResBlock(ch, dtype=self.dtype, name=f"down_{i}_res_{j}")(x, emb)
                if cross:
                    x = AddedKVAttention(self.head_dim, dtype=self.dtype,
                                         name=f"down_{i}_attn_{j}")(x, ctx)
                skips.append(x)
            if i < n_levels - 1:
                x = IFResBlock(ch, down=True, dtype=self.dtype,
                               name=f"down_{i}_downsample")(x, emb)
                skips.append(x)

        x = IFResBlock(self.channels[-1], dtype=self.dtype, name="mid_res_0")(x, emb)
        x = AddedKVAttention(self.head_dim, dtype=self.dtype, name="mid_attn")(x, ctx)
        x = IFResBlock(self.channels[-1], dtype=self.dtype, name="mid_res_1")(x, emb)

        for i in reversed(range(n_levels)):
            ch = self.channels[i]
            cross = i >= self.attn_start
            for j in range(self.layers_per_block + 1):
                x = jnp.concatenate([x, skips.pop()], axis=-1)
                x = IFResBlock(ch, dtype=self.dtype, name=f"up_{i}_res_{j}")(x, emb)
                if cross:
                    x = AddedKVAttention(self.head_dim, dtype=self.dtype,
                                         name=f"up_{i}_attn_{j}")(x, ctx)
            if i > 0:
                x = IFResBlock(ch, up=True, dtype=self.dtype,
                               name=f"up_{i}_upsample")(x, emb)
        assert not skips

        x = jax.nn.gelu(_gn(x, "conv_norm_out"))
        return nn.Conv(self.out_channels, (3, 3), dtype=jnp.float32,
                       name="conv_out")(x)

    # -- public release sizings ------------------------------------------
    @classmethod
    def if_i_xl(cls, dtype=jnp.bfloat16) -> "IFUNet":
        """Stage I XL class (~4.3B): 704/1408/2816/2816 × 3 layers."""
        return cls(dtype=dtype)

    @classmethod
    def if_ii_l(cls, dtype=jnp.bfloat16) -> "IFUNet":
        """Stage II L class (~1.2B): 320/640/1280/1280, attention only at
        the two deepest levels (sequence ≤ 4096 at 256² input), 6-channel
        input (latents ⊕ upscaled stage-I frame), noise-level conditioning."""
        return cls(channels=(320, 640, 1280, 1280), layers_per_block=3,
                   in_channels=6, attn_start=2, noise_level_cond=True,
                   dtype=dtype)


class IFStageIPipeline:
    """Stage I: 64² pixel-space CFG denoise, DDPM ancestral sampling with
    the learned-range variance + dynamic thresholding (the diffusers
    IFPipeline loop, reference call site txt2img_diffusers_stages_from_txt.py:
    255-259)."""

    def __init__(self, unet: IFUNet, unet_params, steps: int = 100,
                 guidance_scale: float = 7.0,
                 scheduler: Optional[SchedulerConfig] = None):
        self.unet = unet
        self.unet_params = unet_params
        self.steps = steps
        self.guidance = guidance_scale
        self.sched = scheduler or make_scheduler("cosine")
        ts = ddpm_timesteps(self.sched, steps)
        self._ts = jnp.asarray(ts, jnp.int32)
        ratio = self.sched.num_train_timesteps // steps
        self._prev = jnp.asarray(ts - ratio, jnp.int32)
        self._denoise = jax.jit(self._denoise_fn)

    def _cfg_eps(self, params, lat, t, ctx2, extra=None):
        b = lat.shape[0]
        x2 = jnp.concatenate([lat, lat], axis=0)
        t2 = jnp.broadcast_to(t, (2 * b,))
        kw = {}
        if extra is not None:
            kw["noise_level"] = jnp.concatenate([extra, extra], axis=0)
        out = self.unet.apply(params, x2, t2, ctx2, **kw)
        eps2, var2 = jnp.split(out, 2, axis=-1)
        eps_u, eps_c = jnp.split(eps2, 2, axis=0)
        eps = eps_u + self.guidance * (eps_c - eps_u)
        _, var = jnp.split(var2, 2, axis=0)  # variance from the cond branch
        return eps, var

    def _denoise_fn(self, params, lat, ctx2, rng):
        def body(carry, i):
            lat, rng = carry
            rng, sub = jax.random.split(rng)
            t, pt = self._ts[i], self._prev[i]
            eps, var = self._cfg_eps(params, lat, t, ctx2)
            noise = jax.random.normal(sub, lat.shape, lat.dtype)
            lat = ddpm_learned_range_step(self.sched, lat, eps, var, t, pt, noise)
            return (lat, rng), None

        (lat, _), _ = jax.lax.scan(body, (lat, rng), jnp.arange(self.steps))
        return lat

    def generate(self, rng: Array, context: Array, uncond_context: Array,
                 size: int = 64) -> Array:
        """→ (B, size, size, 3) images in [-1, 1]."""
        b = context.shape[0]
        rng, sub = jax.random.split(rng)
        lat = jax.random.normal(sub, (b, size, size, self.unet.in_channels),
                                jnp.float32)
        ctx2 = jnp.concatenate([uncond_context, context], axis=0)
        img = self._denoise(self.unet_params, lat, ctx2, rng)
        return jnp.clip(img, -1.0, 1.0)


class IFStageIIPipeline(IFStageIPipeline):
    """Stage II 64→256 super-resolution: the stage-I output is upscaled,
    noised to ``noise_level`` with the scheduler's forward process
    (IFSuperResolutionPipeline semantics), concatenated channel-wise, and
    denoised at 256² with noise-level conditioning."""

    def __init__(self, unet: IFUNet, unet_params, steps: int = 50,
                 guidance_scale: float = 4.0,
                 scheduler: Optional[SchedulerConfig] = None):
        super().__init__(unet, unet_params, steps, guidance_scale, scheduler)

    def _denoise_fn(self, params, lat, cond, ctx2, nl, rng):
        def body(carry, i):
            lat, rng = carry
            rng, sub = jax.random.split(rng)
            t, pt = self._ts[i], self._prev[i]
            x = jnp.concatenate([lat, cond], axis=-1)
            eps, var = self._cfg_eps(params, x, t, ctx2, extra=nl)
            eps = eps[..., : lat.shape[-1]]
            var = var[..., : lat.shape[-1]]
            noise = jax.random.normal(sub, lat.shape, lat.dtype)
            lat = ddpm_learned_range_step(self.sched, lat, eps, var, t, pt, noise)
            return (lat, rng), None

        (lat, _), _ = jax.lax.scan(body, (lat, rng), jnp.arange(self.steps))
        return lat

    def generate(self, rng: Array, image: Array, context: Array,
                 uncond_context: Array, noise_level: int = 250,
                 scale: int = 4) -> Array:
        """``image`` (B, h, w, 3) in [-1, 1] → (B, h·scale, w·scale, 3)."""
        b, h, w, _ = image.shape
        hs, ws = h * scale, w * scale
        up = jax.image.resize(image, (b, hs, ws, 3), "bilinear")
        rng, k1, k2 = jax.random.split(rng, 3)
        nl = jnp.full((b,), noise_level, jnp.int32)
        cond = add_noise(
            self.sched, up, jax.random.normal(k1, up.shape), noise_level
        )
        lat = jax.random.normal(k2, (b, hs, ws, 3), jnp.float32)
        ctx2 = jnp.concatenate([uncond_context, context], axis=0)
        img = self._denoise(self.unet_params, lat, cond, ctx2, nl, rng)
        return jnp.clip(img, -1.0, 1.0)
