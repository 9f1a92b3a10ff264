"""ConvNeXt backbone, NHWC flax.

Counterpart of ``DiverGen/divergen/modeling/backbone/convnext.py`` (ConvNeXt
+ FPN builder, Δ-DiverGen). Standard ConvNeXt: 4x4 patchify stem, per-stage
downsample (LN + 2x2/2 conv), blocks = depthwise 7x7 → LN → MLP(4x) with
GELU + per-channel layer-scale gamma. Emits ``c2..c5`` stage features for
the shared FPN.
"""
from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import Array

SIZES = {
    "tiny": ((3, 3, 9, 3), (96, 192, 384, 768)),
    "small": ((3, 3, 27, 3), (96, 192, 384, 768)),
    "base": ((3, 3, 27, 3), (128, 256, 512, 1024)),
    "large": ((3, 3, 27, 3), (192, 384, 768, 1536)),
    "xlarge": ((3, 3, 27, 3), (256, 512, 1024, 2048)),
}


class ConvNeXtBlock(nn.Module):
    dim: int
    layer_scale_init: float = 1e-6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        y = nn.Conv(
            self.dim, (7, 7), padding=3, feature_group_count=self.dim,
            dtype=self.dtype, name="dwconv",
        )(x)
        y = nn.LayerNorm(dtype=self.dtype, name="norm")(y)
        y = nn.Dense(4 * self.dim, dtype=self.dtype, name="pwconv1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, dtype=self.dtype, name="pwconv2")(y)
        gamma = self.param("gamma", nn.initializers.constant(self.layer_scale_init), (self.dim,))
        return x + gamma.astype(y.dtype) * y


class ConvNeXt(nn.Module):
    depths: Tuple[int, ...] = (3, 3, 9, 3)
    dims: Tuple[int, ...] = (96, 192, 384, 768)
    out_features: Sequence[str] = ("c2", "c3", "c4", "c5")
    dtype: Any = jnp.float32

    @classmethod
    def from_size(cls, size: str, dtype=jnp.float32, **kw) -> "ConvNeXt":
        depths, dims = SIZES[size]
        return cls(depths=depths, dims=dims, dtype=dtype, **kw)

    @nn.compact
    def __call__(self, x: Array) -> Dict[str, Array]:
        outs: Dict[str, Array] = {}
        x = nn.Conv(self.dims[0], (4, 4), strides=(4, 4), dtype=self.dtype, name="stem")(
            x.astype(self.dtype)
        )
        x = nn.LayerNorm(dtype=self.dtype, name="stem_norm")(x)
        for stage in range(4):
            if stage > 0:
                x = nn.LayerNorm(dtype=self.dtype, name=f"down{stage}_norm")(x)
                x = nn.Conv(
                    self.dims[stage], (2, 2), strides=(2, 2), dtype=self.dtype,
                    name=f"down{stage}_conv",
                )(x)
            for i in range(self.depths[stage]):
                x = ConvNeXtBlock(self.dims[stage], dtype=self.dtype, name=f"stage{stage}_block{i}")(x)
            name = f"c{stage + 2}"
            if name in self.out_features:
                outs[name] = nn.LayerNorm(dtype=self.dtype, name=f"{name}_norm")(x)
        return outs
