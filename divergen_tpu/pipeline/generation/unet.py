"""SDXL-architecture diffusion UNet, flax NHWC.

The generation stage's denoiser (BASELINE.json: "SDXL generation stage
becomes a pmapped denoising loop with Pallas flash-attention/conv UNet
kernels"; reference drives DeepFloyd-IF via diffusers,
``DiverGen/generation/txt2img_diffusers_stages_from_txt.py:136-198`` — same
UNet+text-encoder+scheduler structure). Architecture facts follow the
public SDXL-base config: blocks (320, 640, 1280); down = [ResOnly,
CrossAttn(depth 2), CrossAttn(depth 10)]; mid CrossAttn(depth 10); context
dim 2048; "text_time" added conditioning (pooled 1280 + 6 fourier time-ids
→ 2816 → 1280). Everything is static-shape; attention runs through the
Pallas flash kernel on TPU (XLA einsum fallback elsewhere).
"""
from __future__ import annotations

import math
import os
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import Array


def timestep_embedding(t: Array, dim: int, max_period: float = 10000.0) -> Array:
    """Sinusoidal embedding, (B,) → (B, dim) (diffusers get_timestep_embedding
    semantics: half sin / half cos, flip_sin_to_cos=True for SDXL)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


class FusedLayerNorm(nn.Module):
    """nn.LayerNorm-compatible (same param names/shapes) over the fused
    Pallas kernel (ops/pallas/layer_norm.py).

    Round-2 measured this as a loss at B=1 (launch + fusion-barrier cost,
    119->131 ms/step); the round-4 B=4 trace showed XLA LN moments at ~18x
    the bandwidth bound (~94 ms of a 420 ms step), so it is wired back in
    behind ``TransformerBlock.fused_ln`` / ``UNetSDXL(fused_ln=True)`` —
    flip per measurement (SWEEP_r04.json)."""

    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        from ...ops.pallas.layer_norm import fused_layer_norm

        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones_init(), (c,))
        bias = self.param("bias", nn.initializers.zeros_init(), (c,))
        return fused_layer_norm(x.astype(self.dtype), scale, bias, self.epsilon)


class _ChannelMomentGN(nn.Module):
    """GroupNorm via per-CHANNEL spatial moments (param-compatible with
    nn.GroupNorm: declares the same scale/bias)."""

    groups: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        g = self.groups
        b, h, w, c = x.shape
        scale = self.param("scale", nn.initializers.ones_init(), (c,))
        bias = self.param("bias", nn.initializers.zeros_init(), (c,))
        xf = x.astype(jnp.float32)
        if os.environ.get("DIVERGEN_GN_DOT") == "1":
            # A/B toggle: spatial moments as ones-vector MXU contractions
            # instead of VPU reduces — probing whether the
            # 18-20x-over-bandwidth moment fusions in the r4 trace are the
            # reduce's layout re-materialization. Squares in f32: bf16
            # squares cancel catastrophically in E[x²]-E[x]² for channels
            # with mean >> std (measured 6%-of-std drift on a full UNet).
            # The contraction FLOPs are negligible either way.
            x2 = xf.reshape(b, h * w, c)
            ones = jnp.ones((h * w,), jnp.float32)
            s1 = jnp.einsum("bnc,n->bc", x2, ones,
                            preferred_element_type=jnp.float32) / (h * w)
            s2 = jnp.einsum("bnc,n->bc", x2 * x2, ones,
                            preferred_element_type=jnp.float32) / (h * w)
        else:
            # per-channel first and second moments over the spatial axes
            # (sublane-major reduction — vectorizes cleanly)
            s1 = jnp.mean(xf, axis=(1, 2))  # (B, C)
            s2 = jnp.mean(xf * xf, axis=(1, 2))
        # combine channels within each group (tiny (B, g, C/g) reduce)
        gm = jnp.mean(s1.reshape(b, g, c // g), axis=-1)  # (B, g)
        g2 = jnp.mean(s2.reshape(b, g, c // g), axis=-1)
        gv = g2 - gm * gm
        mean_c = jnp.repeat(gm, c // g, axis=-1)  # (B, C)
        # diffusers UNet/VAE GroupNorms all use eps=1e-6 (torch nn.GroupNorm
        # default is 1e-5 — a real parity deviation, same class as the
        # LayerNorm eps bugs round-2 parity caught)
        inv_c = jnp.repeat(jax.lax.rsqrt(gv + 1e-6), c // g, axis=-1)
        y = (xf - mean_c[:, None, None, :]) * inv_c[:, None, None, :]
        return (y * scale + bias).astype(self.dtype)


class GroupNorm32(nn.Module):
    """GroupNorm with TPU-friendly moment computation.

    flax/XLA's direct lowering reduces over (H, W, C/g) — the C/g=10-lane
    group axis crosses vector lanes, which vectorizes poorly (the denoise
    trace showed these convert+reduce fusions at ~10x the bandwidth bound).
    Instead: per-channel moments over (H, W), then a tiny per-group
    combine. Same math; param tree identical to the nn.GroupNorm wrapper
    (child scope ``GroupNorm_0`` with scale/bias), so checkpoints and the
    weight converter are unaffected.
    """

    groups: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        g = math.gcd(self.groups, x.shape[-1])  # tiny test configs <32 ch
        return _ChannelMomentGN(groups=g, dtype=self.dtype, name="GroupNorm_0")(x)


class _GNInner(nn.Module):
    @nn.compact
    def __call__(self, c: int):
        return (
            self.param("scale", nn.initializers.ones_init(), (c,)),
            self.param("bias", nn.initializers.zeros_init(), (c,)),
        )


class _GNParams(nn.Module):
    """Param-holder matching GroupNorm32's tree (<name>/GroupNorm_0/...)."""

    @nn.compact
    def __call__(self, c: int):
        return _GNInner(name="GroupNorm_0")(c)


class _ConvParams(nn.Module):
    """Param-holder matching nn.Conv(3x3)'s tree (<name>/{kernel,bias})."""

    features: int

    @nn.compact
    def __call__(self, cin: int):
        return (
            self.param("kernel", nn.initializers.lecun_normal(), (3, 3, cin, self.features)),
            self.param("bias", nn.initializers.zeros_init(), (self.features,)),
        )


class _LNParams(nn.Module):
    """Param-holder matching nn.LayerNorm's tree (<name>/{scale,bias})."""

    @nn.compact
    def __call__(self, c: int):
        return (
            self.param("scale", nn.initializers.ones_init(), (c,)),
            self.param("bias", nn.initializers.zeros_init(), (c,)),
        )


class _DenseParams(nn.Module):
    """Param-holder matching MaybeQuantDense(quant=False)'s tree
    (<name>/{kernel[,bias]})."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, cin: int):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (cin, self.features)
        )
        bias = (
            self.param("bias", nn.initializers.zeros_init(), (self.features,))
            if self.use_bias
            else None
        )
        return kernel, bias


def _gn_silu(x: Array, name: str, dtype: Any, fused: bool) -> Array:
    """GroupNorm32 + SiLU, either the XLA channel-moment path or the Pallas
    two-pass fused kernel (ops/pallas/group_norm.py — the r4 trace showed
    XLA's GN moment fusions at ~20x the bandwidth bound, ~52 ms of a 420 ms
    B=4 denoise step). Identical param tree either way."""
    if not fused:
        return nn.silu(GroupNorm32(dtype=dtype, name=name)(x))
    from ...ops.pallas.group_norm import fused_group_norm

    c = x.shape[-1]
    scale, bias = _GNParams(name=name)(c)
    return fused_group_norm(x, scale, bias, math.gcd(32, c), 1e-6, True)


class ResBlock(nn.Module):
    out_channels: int
    dtype: Any = jnp.float32
    # 3x3 convs as GEMMs (ops/conv_matmul): False = native conv lowering,
    # True/'im2col' = one im2col GEMM, 'tapsum' = 9 accumulated GEMMs,
    # 'fused' = Pallas fused GN+SiLU+conv (ops/pallas/fused_gn_conv,
    # forward-only — generation serving)
    conv_matmul: Any = False
    fused_gn: bool = False  # Pallas GN+SiLU (ops/pallas/group_norm.py)

    @nn.compact
    def __call__(self, x: Array, emb: Array) -> Array:
        if self.conv_matmul == "fused":
            return self._fused(x, emb)
        if self.conv_matmul:
            from ...ops.conv_matmul import Conv3x3MM

            mode = self.conv_matmul if isinstance(self.conv_matmul, str) else "im2col"
            conv = lambda name: Conv3x3MM(
                self.out_channels, dtype=self.dtype, mode=mode, name=name
            )
        else:
            conv = lambda name: nn.Conv(
                self.out_channels, (3, 3), padding=1, dtype=self.dtype, name=name
            )
        h = _gn_silu(x, "norm1", self.dtype, self.fused_gn)
        h = conv("conv1")(h)
        e = nn.Dense(self.out_channels, dtype=self.dtype, name="time_emb_proj")(nn.silu(emb))
        h = h + e[:, None, None, :]
        h = _gn_silu(h, "norm2", self.dtype, self.fused_gn)
        h = conv("conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="conv_shortcut")(x)
        return x + h

    def _fused(self, x: Array, emb: Array) -> Array:
        """Same param tree (norm{1,2}/GroupNorm_0/{scale,bias},
        conv{1,2}/{kernel,bias}), forward through the fused Pallas kernel —
        checkpoints/converters unchanged."""
        from ...ops.pallas.fused_gn_conv import fused_gn_silu_conv3x3

        co, cin = self.out_channels, x.shape[-1]
        s1, b1 = _GNParams(name="norm1")(cin)
        k1, cb1 = _ConvParams(co, name="conv1")(cin)
        h = fused_gn_silu_conv3x3(x, s1, b1, k1, cb1)
        e = nn.Dense(co, dtype=self.dtype, name="time_emb_proj")(nn.silu(emb))
        h = (h.astype(jnp.float32) + e[:, None, None, :].astype(jnp.float32)).astype(x.dtype)
        s2, b2 = _GNParams(name="norm2")(co)
        k2, cb2 = _ConvParams(co, name="conv2")(co)
        h = fused_gn_silu_conv3x3(h, s2, b2, k2, cb2)
        if cin != co:
            x = nn.Conv(co, (1, 1), dtype=self.dtype, name="conv_shortcut")(x)
        return x + h


def _attention(q: Array, k: Array, v: Array, heads: int) -> Array:
    """(B, Nq, C) x (B, Nk, C) multi-head attention; flash kernel on TPU."""
    b, nq, c = q.shape
    nk = k.shape[1]
    d = c // heads
    if nk <= 128:
        # cross-attention over 77 text tokens: the (Nq, 128-padded) score
        # matrix is tiny — plain XLA beats the flash kernel here (measured
        # ~12 ms/step on the full UNet, tools/profile_unet.py). Head-split
        # views only: XLA picks layouts, no explicit (BH, N, D) transpose.
        qh = q.reshape(b, nq, heads, d)
        kh = k.reshape(b, nk, heads, d)
        vh = v.reshape(b, nk, heads, d)
        s = jnp.einsum("bnhd,bmhd->bhnm", qh, kh,
                       preferred_element_type=jnp.float32) / math.sqrt(d)
        p = jax.nn.softmax(s, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", p.astype(vh.dtype), vh,
                         preferred_element_type=jnp.float32).astype(q.dtype)
        return out.reshape(b, nq, c)
    from ...ops.pallas.flash_attention import flash_attention

    q = q.reshape(b, nq, heads, d).transpose(0, 2, 1, 3).reshape(b * heads, nq, d)
    k = k.reshape(b, nk, heads, d).transpose(0, 2, 1, 3).reshape(b * heads, nk, d)
    v = v.reshape(b, nk, heads, d).transpose(0, 2, 1, 3).reshape(b * heads, nk, d)
    out = flash_attention(q, k, v)  # (B*H, Nq, D); pallas on TPU, XLA ref off
    return out.reshape(b, heads, nq, d).transpose(0, 2, 1, 3).reshape(b, nq, c)


class MaybeQuantDense(nn.Module):
    """Dense layer that runs the v5e int8 MXU path when built with
    ``quant=True`` (params carry ``kernel_q``/``kernel_scale`` produced by
    ``ops.quant.quantize_param_tree``); otherwise exact nn.Dense math."""

    features: int
    use_bias: bool = True
    dtype: Any = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_dim = x.shape[-1]
        if self.quant:
            from ...ops.quant import int8_matmul

            kq = self.param(
                "kernel_q", nn.initializers.zeros_init(), (in_dim, self.features),
                jnp.int8,
            )
            ks = self.param(
                "kernel_scale", nn.initializers.ones_init(), (self.features,),
                jnp.float32,
            )
            y = int8_matmul(x, kq, ks, out_dtype=self.dtype)
        else:
            kernel = self.param(
                "kernel", nn.initializers.lecun_normal(), (in_dim, self.features)
            )
            y = x.astype(self.dtype) @ kernel.astype(self.dtype)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros_init(), (self.features,))
            y = y + bias.astype(y.dtype)
        return y


def transformer_quant_select(path: Tuple[str, ...]) -> bool:
    """Param-tree paths of the MaybeQuantDense modules (the big transformer
    matmuls; time/class embeddings and convs stay bf16)."""
    name = path[-1]
    return name.startswith(("attn1_", "attn2_", "ff_")) or name in (
        "proj_in", "proj_out",
    )


class TransformerBlock(nn.Module):
    """self-attn → cross-attn → GEGLU FF (diffusers BasicTransformerBlock)."""

    channels: int
    heads: int
    dtype: Any = jnp.float32
    quant: bool = False
    fused_ln: bool = False  # Pallas LN (ops/pallas/layer_norm.py)
    # Pallas LN fused INTO the consuming GEMM (ops/pallas/ln_matmul):
    # True/'all' = all three LN sites; 'geglu' = only norm3->GEGLU.
    # Default set by the end-to-end A/B in SWEEP_r05.json (ln_gemm /
    # ln_gemm_geglu entries); the LN-moment cost it attacks is the
    # trace_breakdown_B4_ms_of_420 entry in SWEEP_r04.json.
    ln_gemm: Any = False

    @nn.compact
    def __call__(self, x: Array, context: Array) -> Array:
        c = self.channels

        def dense(feat, name, use_bias=True):
            return MaybeQuantDense(feat, use_bias=use_bias, dtype=self.dtype,
                                   quant=self.quant, name=name)

        def ln_dense(t, feat, ln_name, dense_name, use_bias=True, geglu=False):
            # LayerNorm folded into its consuming GEMM (ops/pallas/
            # ln_matmul.py): every LN in this block feeds exactly one GEMM,
            # and XLA's separate LN lowerings cost ~94 ms/step at B=4
            # (18x the HBM bound — layout re-materialization around the
            # moments; SWEEP_r04.json). Param tree identical to
            # norm(ln_name) + dense(feat, dense_name).
            from ...ops.pallas.ln_matmul import fused_ln_matmul

            s_, b_ = _LNParams(name=ln_name)(c)
            kern, dbias = _DenseParams(feat, use_bias=use_bias,
                                       name=dense_name)(c)
            bt, nt, _ = t.shape
            out = fused_ln_matmul(
                t.reshape(bt * nt, c),
                kern.astype(self.dtype),
                s_, b_, 1e-5,
                None if dbias is None else dbias,
                geglu=geglu,
            )
            return out.reshape(bt, nt, -1)

        def norm(name):
            # the r4 B=4 trace shows XLA's LN moment fusions at ~0.47 ms
            # each on (8,1024,1280) — ~18x the bandwidth bound, ~94 ms of
            # the 420 ms step — hence the Pallas option (same param names)
            if self.fused_ln:
                return FusedLayerNorm(dtype=self.dtype, name=name)
            # LN on the flattened (B*N, C) view: on (B, N, C) XLA tiles the
            # per-row moments as (B, N) with sublane=B=2, serializing the
            # lane reduction (trace: 118 us per LN, 44 GB/s); the 2D view
            # gets full 8-sublane tiling (20 us, 515 GB/s). Free bitcast.
            ln = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=name)
            return lambda t: ln(t.reshape(-1, t.shape[-1])).reshape(t.shape)

        lng = self.ln_gemm if not self.quant else False
        # per-site granularity ('all' r5 A/B regressed vs 'geglu'; 'qkv'
        # isolates whether norm1->QKV or norm2->cross-q is the regressor:
        # cross-q's C-wide output is the worst LN-replication ratio)
        use_lng = lng in (True, "all", "qkv")  # norm1 -> fused QKV site
        use_lng_xq = lng in (True, "all")  # norm2 -> cross-attention q site
        use_lng_ff = lng in (True, "all", "geglu", "qkv")  # GEGLU site
        # one fused (C, 3C) projection instead of three (C, C) GEMMs, feeding
        # the packed transpose-free flash kernel: the (B, N, 3, H, d) view is
        # free and the kernel slices q/k/v via BlockSpec index maps
        from ...ops.pallas.flash_attention import flash_attention_packed

        if use_lng:
            qkv = ln_dense(x, 3 * c, "norm1", "attn1_qkv", use_bias=False)
        else:
            qkv = dense(3 * c, "attn1_qkv", use_bias=False)(norm("norm1")(x))
        # escape hatch for hardware triage: DIVERGEN_PACKED_ATTN=0 routes
        # the fused projection through the proven (BH, N, D) flash kernel
        # instead of the packed BlockSpec path (same math, adds transposes)
        import os as _os

        if _os.environ.get("DIVERGEN_PACKED_ATTN", "1") == "0":
            q1, k1, v1 = jnp.split(qkv, 3, axis=-1)
            x = x + dense(c, "attn1_out")(_attention(q1, k1, v1, self.heads))
        else:
            # softmax_mode trims full-score-tile VPU ops in the VPU-bound
            # packed kernel — see _packed_kernel2 docstring. Default
            # "rawmax" (algebraically identical to "exact", scaling
            # commuted out of the running max): B=4 denoise step 382.37 →
            # 379.57 ms end-to-end, micro −3.7% at the 4096-token level
            # (SWEEP_r05 attn entries); "bf16exp" measured a wash.
            sm = _os.environ.get("DIVERGEN_ATTN_SOFTMAX", "rawmax")
            x = x + dense(c, "attn1_out")(
                flash_attention_packed(qkv, self.heads, softmax_mode=sm)
            )
        if use_lng_xq:
            q = ln_dense(x, c, "norm2", "attn2_q", use_bias=False)
        else:
            q = dense(c, "attn2_q", use_bias=False)(norm("norm2")(x))
        kv = dense(2 * c, "attn2_kv", use_bias=False)(context)
        k, v = jnp.split(kv, 2, axis=-1)
        x = x + dense(c, "attn2_out")(_attention(q, k, v, self.heads))
        if use_lng_ff:
            h = ln_dense(x, 8 * c, "norm3", "ff_geglu", geglu=True)
        else:
            g = dense(8 * c, "ff_geglu")(norm("norm3")(x))
            a, b = jnp.split(g, 2, axis=-1)
            h = a * nn.gelu(b, approximate=False)
        return x + dense(c, "ff_out")(h)


class SpatialTransformer(nn.Module):
    channels: int
    heads: int
    depth: int
    dtype: Any = jnp.float32
    quant: bool = False
    fused_ln: bool = False
    fused_gn: bool = False
    ln_gemm: Any = False

    @nn.compact
    def __call__(self, x: Array, context: Array) -> Array:
        b, h, w, c = x.shape
        res = x
        if self.fused_gn:
            from ...ops.pallas.group_norm import fused_group_norm

            s_, b_ = _GNParams(name="norm")(c)
            x = fused_group_norm(x, s_, b_, math.gcd(32, c), 1e-6, False)
        else:
            x = GroupNorm32(dtype=self.dtype, name="norm")(x)
        x = MaybeQuantDense(self.channels, dtype=self.dtype, quant=self.quant,
                            name="proj_in")(x)
        x = x.reshape(b, h * w, self.channels)
        for i in range(self.depth):
            x = TransformerBlock(self.channels, self.heads, self.dtype,
                                 quant=self.quant, fused_ln=self.fused_ln,
                                 ln_gemm=self.ln_gemm,
                                 name=f"block{i}")(x, context)
        x = x.reshape(b, h, w, self.channels)
        x = MaybeQuantDense(self.channels, dtype=self.dtype, quant=self.quant,
                            name="proj_out")(x)
        return x + res


class Downsample(nn.Module):
    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return nn.Conv(self.channels, (3, 3), strides=(2, 2), padding=1, dtype=self.dtype, name="conv")(x)


class Upsample(nn.Module):
    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, 2 * h, 2 * w, c), "nearest")
        return nn.Conv(self.channels, (3, 3), padding=1, dtype=self.dtype, name="conv")(x)


class UNetSDXL(nn.Module):
    """SDXL-base UNet. Inputs NHWC latents (B, H/8, W/8, 4)."""

    in_channels: int = 4
    out_channels: int = 4
    block_channels: Tuple[int, ...] = (320, 640, 1280)
    layers_per_block: int = 2
    transformer_depths: Tuple[int, ...] = (0, 2, 10)  # per level
    context_dim: int = 2048
    head_dim: int = 64
    addition_time_embed_dim: int = 256
    pooled_proj_dim: int = 2816  # 1280 pooled + 6*256 time ids
    num_class_embeds: Optional[int] = None  # SD-x4-upscaler: 1000 noise levels
    quant: bool = False  # int8 transformer matmuls (ops/quant.py)
    conv_matmul: Any = False  # resblock 3x3 convs as GEMMs: True/'im2col'|'tapsum'
    fused_ln: bool = False  # Pallas LayerNorm in transformer blocks
    fused_gn: bool = False  # Pallas GroupNorm(+SiLU) in res/transformer blocks
    # fold transformer LNs into their consuming GEMMs. Default "geglu"
    # (norm3→GEGLU only): measured end-to-end winner on v5e — B=4 denoise
    # step 419.09 → 381.78 ms (SWEEP_r05 ln_gemm_geglu); "all" three LN
    # sites regresses to 404.59 ms (the QKV sites' k-replication cost
    # exceeds their LN saving at these shapes).
    ln_gemm: Any = "geglu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        latents: Array,  # (B, h, w, 4)
        timesteps: Array,  # (B,)
        context: Array,  # (B, L, context_dim) text hidden states
        pooled_text: Optional[Array] = None,  # (B, 1280)
        time_ids: Optional[Array] = None,  # (B, 6)
        class_labels: Optional[Array] = None,  # (B,) int, e.g. noise level
        cached_encoder: Optional[Tuple[Array, Tuple[Array, ...]]] = None,
        return_encoder: bool = False,
    ):
        """``cached_encoder``/``return_encoder`` implement Faster-Diffusion
        style encoder reuse (arXiv:2312.09608, PAPERS.md): at non-key
        denoise steps the down-path features change little, so the decoder
        re-runs on cached ``(x_after_down, skips)`` with the new time
        embedding while the whole encoder is skipped. Opt-in — the default
        path is the exact SDXL UNet."""
        ch0 = self.block_channels[0]
        temb_dim = 4 * ch0  # 1280
        t_emb = timestep_embedding(timesteps, ch0)
        emb = nn.Dense(temb_dim, dtype=self.dtype, name="time_embed_1")(t_emb.astype(self.dtype))
        emb = nn.Dense(temb_dim, dtype=self.dtype, name="time_embed_2")(nn.silu(emb))

        if pooled_text is not None and time_ids is not None:
            ids_emb = timestep_embedding(time_ids.reshape(-1), self.addition_time_embed_dim)
            ids_emb = ids_emb.reshape(latents.shape[0], -1)
            add = jnp.concatenate([pooled_text, ids_emb.astype(pooled_text.dtype)], axis=-1)
            add = nn.Dense(temb_dim, dtype=self.dtype, name="add_embed_1")(add.astype(self.dtype))
            add = nn.Dense(temb_dim, dtype=self.dtype, name="add_embed_2")(nn.silu(add))
            emb = emb + add

        if self.num_class_embeds is not None and class_labels is not None:
            # diffusers UNet2DConditionModel num_class_embeds path: a learned
            # per-class embedding added to the time embedding (the x4
            # upscaler conditions on the low-res noise level this way)
            cemb = nn.Embed(
                self.num_class_embeds, temb_dim, dtype=self.dtype, name="class_embed"
            )(class_labels.astype(jnp.int32))
            emb = emb + cemb

        context = context.astype(self.dtype)
        if cached_encoder is None:
            x = nn.Conv(ch0, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(
                latents.astype(self.dtype)
            )
            skips = [x]
            # down
            for lvl, ch in enumerate(self.block_channels):
                for i in range(self.layers_per_block):
                    x = ResBlock(ch, self.dtype, self.conv_matmul,
                                 fused_gn=self.fused_gn, name=f"down{lvl}_res{i}")(x, emb)
                    if self.transformer_depths[lvl]:
                        x = SpatialTransformer(
                            ch, ch // self.head_dim, self.transformer_depths[lvl],
                            self.dtype, quant=self.quant, fused_ln=self.fused_ln,
                            fused_gn=self.fused_gn, ln_gemm=self.ln_gemm,
                            name=f"down{lvl}_attn{i}",
                        )(x, context)
                    skips.append(x)
                if lvl < len(self.block_channels) - 1:
                    x = Downsample(ch, self.dtype, name=f"down{lvl}_ds")(x)
                    skips.append(x)
        else:
            x, cached_skips = cached_encoder
            x = x.astype(self.dtype)
            skips = [s.astype(self.dtype) for s in cached_skips]
        encoder_state = (x, tuple(skips))
        # mid
        ch = self.block_channels[-1]
        x = ResBlock(ch, self.dtype, self.conv_matmul,
                     fused_gn=self.fused_gn, name="mid_res0")(x, emb)
        x = SpatialTransformer(
            ch, ch // self.head_dim, self.transformer_depths[-1], self.dtype,
            quant=self.quant, fused_ln=self.fused_ln, fused_gn=self.fused_gn,
            ln_gemm=self.ln_gemm, name="mid_attn",
        )(x, context)
        x = ResBlock(ch, self.dtype, self.conv_matmul,
                     fused_gn=self.fused_gn, name="mid_res1")(x, emb)
        # up
        for lvl in reversed(range(len(self.block_channels))):
            ch = self.block_channels[lvl]
            for i in range(self.layers_per_block + 1):
                x = jnp.concatenate([x, skips.pop()], axis=-1)
                x = ResBlock(ch, self.dtype, self.conv_matmul,
                             fused_gn=self.fused_gn, name=f"up{lvl}_res{i}")(x, emb)
                if self.transformer_depths[lvl]:
                    x = SpatialTransformer(
                        ch, ch // self.head_dim, self.transformer_depths[lvl],
                        self.dtype, quant=self.quant, fused_ln=self.fused_ln,
                        fused_gn=self.fused_gn, ln_gemm=self.ln_gemm,
                        name=f"up{lvl}_attn{i}",
                    )(x, context)
            if lvl > 0:
                x = Upsample(ch, self.dtype, name=f"up{lvl}_us")(x)
        x = _gn_silu(x, "norm_out", self.dtype, self.fused_gn)
        x = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=jnp.float32, name="conv_out")(x)
        if return_encoder:
            return x, encoder_state
        return x

    @classmethod
    def tiny(cls, **kw) -> "UNetSDXL":
        """Small config for tests."""
        return cls(
            block_channels=(32, 64),
            transformer_depths=(0, 1),
            context_dim=64,
            head_dim=16,
            layers_per_block=1,
            **kw,
        )
