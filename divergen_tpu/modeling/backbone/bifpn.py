"""BiFPN (bidirectional feature pyramid), NHWC flax.

Counterpart of CenterNet2's vendored ``centernet/modeling/backbone/bifpn.py``
(EfficientDet-style weighted bidirectional fusion, used by the CenterNet2
DLA-BiFPN configs). Fast-normalized fusion: out = Σ wᵢ·xᵢ / (Σ wᵢ + ε) with
learnable non-negative weights, separable convs between fusions.
"""
from __future__ import annotations

from typing import Any, Dict, List, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import Array


class SeparableConv(nn.Module):
    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = nn.Conv(
            x.shape[-1], (3, 3), padding=1, feature_group_count=x.shape[-1],
            use_bias=False, dtype=self.dtype, name="depthwise",
        )(x)
        x = nn.Conv(self.channels, (1, 1), dtype=self.dtype, name="pointwise")(x)
        return nn.swish(nn.BatchNorm(use_running_average=True, dtype=self.dtype, name="bn")(x))


class _Fuse(nn.Module):
    n_inputs: int
    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs: List[Array]) -> Array:
        w = self.param("fuse_weights", nn.initializers.ones, (self.n_inputs,))
        w = nn.relu(w)
        norm = jnp.sum(w) + 1e-4
        out = sum(w[i] * xs[i] for i in range(self.n_inputs)) / norm
        return SeparableConv(self.channels, self.dtype, name="conv")(out)


def _resize_to(x: Array, ref: Array) -> Array:
    b, h, w, c = ref.shape
    if x.shape[1] == h and x.shape[2] == w:
        return x
    if x.shape[1] > h:  # downsample
        return nn.max_pool(x, (2, 2), strides=(2, 2))
    return jax.image.resize(x, (x.shape[0], h, w, x.shape[3]), "nearest")


class BiFPNLayer(nn.Module):
    channels: int
    num_levels: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: List[Array]) -> List[Array]:
        L = self.num_levels
        # top-down
        td = [None] * L
        td[L - 1] = feats[L - 1]
        for i in range(L - 2, -1, -1):
            td[i] = _Fuse(2, self.channels, self.dtype, name=f"td{i}")(
                [feats[i], _resize_to(td[i + 1], feats[i])]
            )
        # bottom-up
        out = [None] * L
        out[0] = td[0]
        for i in range(1, L):
            xs = [feats[i], td[i], _resize_to(out[i - 1], feats[i])]
            n = 3 if i < L - 1 else 2  # top level has no separate td input
            out[i] = _Fuse(n, self.channels, self.dtype, name=f"bu{i}")(xs[:n])
        return out


class BiFPN(nn.Module):
    """Takes bottom-up features (fine→coarse), emits p3..p7."""

    in_features: Sequence[str] = ("res3", "res4", "res5")
    out_channels: int = 160
    num_layers: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, bottom_up: Dict[str, Array]) -> Dict[str, Array]:
        feats = [
            nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name=f"lateral_{f}")(bottom_up[f])
            for f in self.in_features
        ]
        # extend to 5 levels with stride-2 pools (p6, p7)
        while len(feats) < 5:
            feats.append(nn.max_pool(feats[-1], (2, 2), strides=(2, 2)))
        for li in range(self.num_layers):
            feats = BiFPNLayer(self.out_channels, 5, self.dtype, name=f"layer{li}")(feats)
        base = int(self.in_features[0][-1]) if self.in_features[0][-1].isdigit() else 3
        return {f"p{base + i}": x for i, x in enumerate(feats)}
