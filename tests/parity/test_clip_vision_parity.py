"""CLIP vision tower conversion parity vs an independent torch replica.

The reference tree vendors only the text tower (text_encoder.py) and the
openai ``clip`` package isn't installed, so the oracle for
``convert_clip_vision`` is a torch replica of the published
VisionTransformer (conv1 stem, class token, pre-LN blocks with QuickGELU,
argmaxless [CLS] pooling, projection) in the openai state_dict layout."""
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))
import ref_loader  # noqa: E402


@pytest.fixture(scope="module", autouse=True)
def _install():
    ref_loader.install()


def test_clip_vision_conversion_parity():
    import torch
    import torch.nn as nn

    import jax.numpy as jnp

    from divergen_tpu.modeling.text.clip import CLIPVision
    from divergen_tpu.utils.torch_weights import convert_clip_vision

    torch.manual_seed(3)
    width, heads, layers, patch, img, out_dim = 32, 4, 2, 8, 32, 16
    n_tok = (img // patch) ** 2 + 1

    class QuickGELU(nn.Module):
        def forward(self, x):
            return x * torch.sigmoid(1.702 * x)

    class Block(nn.Module):
        def __init__(self):
            super().__init__()
            self.ln_1 = nn.LayerNorm(width)
            self.attn = nn.MultiheadAttention(width, heads, batch_first=False)
            self.ln_2 = nn.LayerNorm(width)
            self.mlp = nn.Sequential()
            self.mlp.add_module("c_fc", nn.Linear(width, 4 * width))
            self.mlp.add_module("gelu", QuickGELU())
            self.mlp.add_module("c_proj", nn.Linear(4 * width, width))

        def forward(self, x):  # (L, B, C)
            y = self.ln_1(x)
            x = x + self.attn(y, y, y, need_weights=False)[0]
            return x + self.mlp(self.ln_2(x))

    class VisionTransformer(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(3, width, patch, stride=patch, bias=False)
            scale = width ** -0.5
            self.class_embedding = nn.Parameter(scale * torch.randn(width))
            self.positional_embedding = nn.Parameter(scale * torch.randn(n_tok, width))
            self.ln_pre = nn.LayerNorm(width)
            self.resblocks = nn.ModuleList(Block() for _ in range(layers))
            self.ln_post = nn.LayerNorm(width)
            self.proj = nn.Parameter(scale * torch.randn(width, out_dim))

        def forward(self, x):  # (B, 3, H, W)
            x = self.conv1(x).flatten(2).permute(0, 2, 1)
            cls = self.class_embedding[None, None].expand(x.shape[0], 1, -1)
            x = torch.cat([cls, x], dim=1) + self.positional_embedding
            x = self.ln_pre(x).permute(1, 0, 2)
            for b in self.resblocks:
                x = b(x)
            x = x.permute(1, 0, 2)
            return self.ln_post(x[:, 0]) @ self.proj

    ref = VisionTransformer().eval()
    # openai checkpoint key layout
    sd = {}
    for k, v in ref.state_dict().items():
        k = k.replace("resblocks.", "transformer.resblocks.")
        sd[f"visual.{k}"] = v.detach().numpy()
    conv = convert_clip_vision(sd)

    rng = np.random.RandomState(4)
    x = rng.randn(2, img, img, 3).astype(np.float32)
    ours = CLIPVision(embed_dim=out_dim, image_size=img, patch=patch,
                      width=width, heads=heads, layers=layers)
    got = np.asarray(ours.apply(conv, jnp.asarray(x)))
    with torch.no_grad():
        want = ref(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
