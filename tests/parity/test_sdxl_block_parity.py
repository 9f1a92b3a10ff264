"""SDXL transformer-block numerics vs a torch replica of the diffusers
BasicTransformerBlock (no diffusers package in the image).

Validates the fused attn1_qkv / attn2_kv projection concat the weight
converter builds from the separate torch to_q/to_k/to_v matrices
(utils/torch_weights.convert_sdxl_unet _lin_cat) and the LN/GEGLU/attention
semantics of pipeline/generation/unet.TransformerBlock."""
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))
import ref_loader  # noqa: E402


@pytest.fixture(scope="module", autouse=True)
def _install():
    ref_loader.install()


def test_transformer_block_fused_projection_parity():
    import torch
    import torch.nn as nn

    import jax.numpy as jnp

    from divergen_tpu.pipeline.generation.unet import TransformerBlock
    from divergen_tpu.utils.torch_weights import _t_linear

    torch.manual_seed(5)
    c, heads, ctx_dim, n, nc = 32, 4, 24, 64, 7

    class RefBlock(nn.Module):
        """diffusers BasicTransformerBlock: LN→self-attn→LN→cross-attn→
        LN→GEGLU FF, all residual."""

        def __init__(self):
            super().__init__()
            self.norm1 = nn.LayerNorm(c, eps=1e-5)
            self.q1 = nn.Linear(c, c, bias=False)
            self.k1 = nn.Linear(c, c, bias=False)
            self.v1 = nn.Linear(c, c, bias=False)
            self.o1 = nn.Linear(c, c)
            self.norm2 = nn.LayerNorm(c, eps=1e-5)
            self.q2 = nn.Linear(c, c, bias=False)
            self.k2 = nn.Linear(ctx_dim, c, bias=False)
            self.v2 = nn.Linear(ctx_dim, c, bias=False)
            self.o2 = nn.Linear(c, c)
            self.norm3 = nn.LayerNorm(c, eps=1e-5)
            self.geglu = nn.Linear(c, 8 * c)
            self.ff_out = nn.Linear(4 * c, c)

        @staticmethod
        def attn(q, k, v):
            b, nq, _ = q.shape
            d = c // heads

            def split(x):
                return x.reshape(b, -1, heads, d).transpose(1, 2)

            q, k, v = split(q), split(k), split(v)
            p = torch.softmax(q @ k.transpose(2, 3) / d ** 0.5, dim=-1)
            return (p @ v).transpose(1, 2).reshape(b, nq, c)

        def forward(self, x, context):
            y = self.norm1(x)
            x = x + self.o1(self.attn(self.q1(y), self.k1(y), self.v1(y)))
            y = self.norm2(x)
            x = x + self.o2(self.attn(self.q2(y), self.k2(context), self.v2(context)))
            y = self.norm3(x)
            a, b = self.geglu(y).chunk(2, dim=-1)
            return x + self.ff_out(a * torch.nn.functional.gelu(b))

    ref = RefBlock().eval()

    def lin(mod, bias=True):
        d = {"kernel": _t_linear(mod.weight.detach().numpy())}
        if bias:
            d["bias"] = mod.bias.detach().numpy()
        return d

    def ln(mod):
        return {"scale": mod.weight.detach().numpy(), "bias": mod.bias.detach().numpy()}

    params = {"params": {
        "norm1": ln(ref.norm1), "norm2": ln(ref.norm2), "norm3": ln(ref.norm3),
        # the converter concatenates to_q/to_k/to_v along the output dim
        # (convert_sdxl_unet _lin_cat) — same construction here
        "attn1_qkv": {"kernel": np.concatenate(
            [_t_linear(m.weight.detach().numpy()) for m in (ref.q1, ref.k1, ref.v1)], 1
        )},
        "attn1_out": lin(ref.o1),
        "attn2_q": lin(ref.q2, bias=False),
        "attn2_kv": {"kernel": np.concatenate(
            [_t_linear(m.weight.detach().numpy()) for m in (ref.k2, ref.v2)], 1
        )},
        "attn2_out": lin(ref.o2),
        "ff_geglu": lin(ref.geglu), "ff_out": lin(ref.ff_out),
    }}

    rng = np.random.RandomState(6)
    x = rng.randn(2, n, c).astype(np.float32)
    context = rng.randn(2, nc, ctx_dim).astype(np.float32)
    blk = TransformerBlock(channels=c, heads=heads)
    got = np.asarray(blk.apply(params, jnp.asarray(x), jnp.asarray(context)))
    with torch.no_grad():
        want = ref(torch.tensor(x), torch.tensor(context)).numpy()
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)
