"""Shared NN building blocks (flax.linen, NHWC).

Replaces detectron2 ``layers/wrappers.py`` + ``layers/batch_norm.py``:
Conv2d+norm fusion, FrozenBatchNorm (affine-only — exactly what detectron2's
FrozenBN degenerates to once weights are loaded and stats are constants),
GroupNorm, LayerNorm, DropPath. NHWC is the TPU conv layout; all matmul-ish
ops run in bf16 under mixed precision with f32 params (policy applied by the
trainer via dtype arguments).
"""
from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import Array


class FrozenBatchNorm(nn.Module):
    """Affine-only BN: y = x * scale + bias with frozen statistics.

    detectron2 ``FrozenBatchNorm2d`` (layers/batch_norm.py) folds running
    stats into (scale, bias) at load; training never updates them. Here the
    folded form IS the parameterization, so pretrained torch weights convert
    by ``scale = gamma / sqrt(var + eps)``, ``bias = beta - mean * scale``.
    """

    features: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return x * scale + bias


def get_norm(norm: str, features: int) -> Optional[Callable]:
    """Mirror of detectron2 ``get_norm`` (layers/batch_norm.py:143)."""
    if norm in ("", "none", None):
        return None
    if norm == "GN":
        # the reference uses 32 groups (25 when channels % 32 != 0,
        # centernet_head.py:74-76)
        groups = 32 if features % 32 == 0 else 25
        return nn.GroupNorm(num_groups=groups, epsilon=1e-5)
    if norm == "FrozenBN":
        return FrozenBatchNorm(features)
    if norm == "LN":
        return nn.LayerNorm(epsilon=1e-6)
    if norm == "SyncBN" or norm == "BN":
        # Plain BN is hostile to pjit (cross-replica stats); the reference
        # only ever trains FrozenBN/GN configs, so BN maps to GN here.
        import math as _math

        return nn.GroupNorm(num_groups=_math.gcd(32, features), epsilon=1e-5)
    raise ValueError(f"Unknown norm: {norm}")


class ConvNorm(nn.Module):
    """Conv2d + optional norm + optional activation (layers/wrappers.py Conv2d)."""

    features: int
    kernel_size: int = 3
    strides: int = 1
    norm: str = ""
    activation: Optional[Callable] = None
    use_bias: Optional[bool] = None
    bias_init: float = 0.0
    kernel_std: Optional[float] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        use_bias = self.use_bias if self.use_bias is not None else self.norm in ("", "GN")
        kinit = (
            nn.initializers.normal(self.kernel_std)
            if self.kernel_std is not None
            else nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal")
        )
        x = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(self.strides, self.strides),
            padding="SAME" if self.strides == 1 else [(self.kernel_size // 2,) * 2] * 2,
            use_bias=use_bias,
            kernel_init=kinit,
            bias_init=nn.initializers.constant(self.bias_init),
            dtype=self.dtype,
            name="conv",
        )(x)
        norm = get_norm(self.norm, self.features)
        if norm is not None:
            x = norm(x)
        if self.activation is not None:
            x = self.activation(x)
        return x


class Scale(nn.Module):
    """Per-level learnable scalar (centernet_head.py:13-19)."""

    init_value: float = 1.0

    @nn.compact
    def __call__(self, x: Array) -> Array:
        s = self.param("scale", nn.initializers.constant(self.init_value), ())
        return x * s


class DropPath(nn.Module):
    """Stochastic depth (timm DropPath used by Swin/ConvNeXt/ViT)."""

    rate: float = 0.0
    deterministic: Optional[bool] = None

    @nn.compact
    def __call__(self, x: Array, deterministic: Optional[bool] = None) -> Array:
        det = nn.merge_param("deterministic", self.deterministic, deterministic)
        if det or self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0)


class MLP(nn.Module):
    """Transformer MLP block (fc → act → fc)."""

    hidden: int
    out: int
    act: Callable = nn.gelu
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        x = self.act(x)
        x = nn.Dense(self.out, dtype=self.dtype, name="fc2")(x)
        return x
