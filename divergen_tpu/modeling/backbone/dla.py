"""DLA-34 (deep layer aggregation) backbone, NHWC flax.

Counterpart of CenterNet2's vendored ``centernet/modeling/backbone/dla.py``
/ ``dlafpn.py`` (DLA-34 with hierarchical tree aggregation, used by the
CenterNet2 realtime configs). Basic residual blocks; Tree nodes aggregate
children through 1x1 root convs.
"""
from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
from jax import Array

from ..layers import ConvNorm


class BasicBlock(nn.Module):
    channels: int
    stride: int = 1
    norm: str = "BN"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, residual: Array | None = None) -> Array:
        if residual is None:
            residual = x
        out = ConvNorm(self.channels, 3, self.stride, self.norm, nn.relu, dtype=self.dtype, name="conv1")(x)
        out = ConvNorm(self.channels, 3, 1, self.norm, None, dtype=self.dtype, name="conv2")(out)
        if residual.shape != out.shape:
            residual = ConvNorm(self.channels, 1, self.stride, self.norm, None, dtype=self.dtype, name="project")(residual)
        return nn.relu(out + residual)


class Root(nn.Module):
    channels: int
    norm: str = "BN"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs: Sequence[Array]) -> Array:
        x = jnp.concatenate(xs, axis=-1)
        x = ConvNorm(self.channels, 1, 1, self.norm, None, dtype=self.dtype, name="conv")(x)
        return nn.relu(x)


class Tree(nn.Module):
    levels: int
    channels: int
    stride: int = 1
    norm: str = "BN"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, residual: Array | None = None) -> Array:
        if self.levels == 1:
            b1 = BasicBlock(self.channels, self.stride, self.norm, self.dtype, name="tree1")(x, residual)
            b2 = BasicBlock(self.channels, 1, self.norm, self.dtype, name="tree2")(b1)
            return Root(self.channels, self.norm, self.dtype, name="root")([b2, b1])
        t1 = Tree(self.levels - 1, self.channels, self.stride, self.norm, self.dtype, name="tree1")(x)
        t2 = Tree(self.levels - 1, self.channels, 1, self.norm, self.dtype, name="tree2")(t1)
        return t2


class DLA34(nn.Module):
    """DLA-34: channels (16, 32, 64, 128, 256, 512), levels (1,1,1,2,2,1).
    Emits dla3..dla5 (strides 8/16/32) for the FPN builders."""

    norm: str = "BN"
    out_features: Sequence[str] = ("dla3", "dla4", "dla5")
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Dict[str, Array]:
        chans = (16, 32, 64, 128, 256, 512)
        x = ConvNorm(chans[0], 7, 1, self.norm, nn.relu, dtype=self.dtype, name="base")(x)
        x = ConvNorm(chans[0], 3, 1, self.norm, nn.relu, dtype=self.dtype, name="level0")(x)
        x = ConvNorm(chans[1], 3, 2, self.norm, nn.relu, dtype=self.dtype, name="level1")(x)
        outs: Dict[str, Array] = {}
        for i, (ch, lv) in enumerate(zip(chans[2:], (1, 2, 2, 1))):
            x = Tree(lv, ch, stride=2, norm=self.norm, dtype=self.dtype, name=f"level{i + 2}")(x)
            name = f"dla{i + 2}"
            if name in self.out_features:
                outs[name] = x
        return outs
