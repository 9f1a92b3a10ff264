"""SDXL text-tower + VAE conversion parity vs torch replicas.

The reference loads these submodels through diffusers
(``DiverGen/generation/txt2img_diffusers_stages_from_txt.py:136-198``) and
conditions generation on ``encode_prompt`` (:242). The packages aren't in
the image, so — per the established parity-vs-replica pattern — the torch
replicas below reproduce the PUBLISHED architectures in the exact
state-dict key layout of the real checkpoints (HF ``CLIPTextModel(With
Projection)``; diffusers ``AutoencoderKL`` decoder), and the converters +
flax modules are pinned against them.
"""
import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

sys.path.insert(0, str(Path(__file__).parent))


# ---------------- HF CLIPTextModel replica (transformers key layout) ------
class _HFAttn(tnn.Module):
    def __init__(self, w, heads):
        super().__init__()
        self.q_proj = tnn.Linear(w, w)
        self.k_proj = tnn.Linear(w, w)
        self.v_proj = tnn.Linear(w, w)
        self.out_proj = tnn.Linear(w, w)
        self.heads = heads

    def forward(self, x, mask):
        b, n, c = x.shape
        d = c // self.heads

        def split(t):
            return t.view(b, n, self.heads, d).transpose(1, 2)

        q, k, v = split(self.q_proj(x)), split(self.k_proj(x)), split(self.v_proj(x))
        a = (q @ k.transpose(-1, -2)) * d**-0.5 + mask
        o = (a.softmax(-1) @ v).transpose(1, 2).reshape(b, n, c)
        return self.out_proj(o)


class _HFMlp(tnn.Module):
    def __init__(self, w, act):
        super().__init__()
        self.fc1 = tnn.Linear(w, 4 * w)
        self.fc2 = tnn.Linear(4 * w, w)
        self.act = act

    def forward(self, x):
        h = self.fc1(x)
        h = h * torch.sigmoid(1.702 * h) if self.act == "quick_gelu" else F.gelu(h)
        return self.fc2(h)


class _HFLayer(tnn.Module):
    def __init__(self, w, heads, act):
        super().__init__()
        self.layer_norm1 = tnn.LayerNorm(w)
        self.self_attn = _HFAttn(w, heads)
        self.layer_norm2 = tnn.LayerNorm(w)
        self.mlp = _HFMlp(w, act)

    def forward(self, x, mask):
        x = x + self.self_attn(self.layer_norm1(x), mask)
        return x + self.mlp(self.layer_norm2(x))


class _HFEmbeddings(tnn.Module):
    def __init__(self, vocab, w, ctx):
        super().__init__()
        self.token_embedding = tnn.Embedding(vocab, w)
        self.position_embedding = tnn.Embedding(ctx, w)


class _HFEncoder(tnn.Module):
    def __init__(self, w, heads, layers, act):
        super().__init__()
        self.layers = tnn.ModuleList([_HFLayer(w, heads, act) for _ in range(layers)])


class _HFTextModel(tnn.Module):
    def __init__(self, vocab=600, w=64, heads=4, layers=3, ctx=77, act="quick_gelu"):
        super().__init__()
        self.embeddings = _HFEmbeddings(vocab, w, ctx)
        self.encoder = _HFEncoder(w, heads, layers, act)
        self.final_layer_norm = tnn.LayerNorm(w)

    def forward(self, tokens):
        """Returns (pooled_pre_projection, penultimate_hidden) — the
        hidden_states[-2] convention SDXL conditions on."""
        x = self.embeddings.token_embedding(tokens) + self.embeddings.position_embedding(
            torch.arange(tokens.shape[1])
        )
        n = tokens.shape[1]
        mask = torch.full((n, n), float("-inf")).triu(1)[None, None]
        hidden = None
        for i, layer in enumerate(self.encoder.layers):
            if i == len(self.encoder.layers) - 1:
                hidden = x
            x = layer(x, mask)
        x = self.final_layer_norm(x)
        eot = tokens.argmax(-1)
        pooled = x[torch.arange(x.shape[0]), eot]
        return pooled, hidden


class _HFTextModelWithProjection(tnn.Module):
    def __init__(self, embed_dim=48, **kw):
        super().__init__()
        self.text_model = _HFTextModel(**kw)
        self.text_projection = tnn.Linear(kw.get("w", 64), embed_dim, bias=False)

    def forward(self, tokens):
        pooled, hidden = self.text_model(tokens)
        return self.text_projection(pooled), hidden


def _tokens(rng, b=3, vocab=600, ctx=77, pad_id=0):
    tokens = np.full((b, ctx), pad_id, np.int64)
    for i in range(b):
        n = rng.randint(5, 20)
        tokens[i, 0] = 1
        tokens[i, 1:n] = rng.randint(2, vocab - 1, n - 1)
        tokens[i, n] = vocab - 1  # EOT = max id
    return tokens


@pytest.mark.parametrize("act,pad_id", [("quick_gelu", 599), ("gelu", 0)])
def test_hf_clip_text_parity(act, pad_id):
    """convert_hf_clip_text: HF layout → CLIPText, penultimate hidden +
    projected pooled parity (both SDXL tower variants: CLIP-L quick_gelu /
    bigG exact-gelu; both pad conventions)."""
    import jax.numpy as jnp

    from divergen_tpu.modeling.text.clip import CLIPText
    from divergen_tpu.utils.torch_weights import convert_hf_clip_text

    torch.manual_seed(3)
    ref = _HFTextModelWithProjection(embed_dim=48, vocab=600, w=64, heads=4,
                                     layers=3, act=act)
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_hf_clip_text(sd)

    ours = CLIPText(embed_dim=48, vocab_size=600, width=64, heads=4, layers=3,
                    act=act)
    tokens = _tokens(np.random.RandomState(0), pad_id=pad_id)
    with torch.no_grad():
        want_pooled, want_hidden = ref(torch.from_numpy(tokens))

    got_pooled, got_hidden = ours.apply(
        params, jnp.asarray(tokens, jnp.int32), return_sequence=True, penultimate=True
    )
    np.testing.assert_allclose(np.asarray(got_hidden), want_hidden.numpy(),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_pooled), want_pooled.numpy(),
                               rtol=1e-4, atol=1e-4)


def test_hf_clip_text_no_projection():
    """Tower-1 checkpoints (plain CLIPTextModel) have no text_projection key;
    conversion must still produce a complete CLIPText tree."""
    import jax.numpy as jnp

    from divergen_tpu.modeling.text.clip import CLIPText
    from divergen_tpu.utils.torch_weights import convert_hf_clip_text

    torch.manual_seed(4)
    ref = _HFTextModel(vocab=600, w=64, heads=4, layers=2)
    ref.eval()
    sd = {f"text_model.{k}": v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_hf_clip_text(sd)
    ours = CLIPText(embed_dim=64, vocab_size=600, width=64, heads=4, layers=2)
    tokens = _tokens(np.random.RandomState(1), b=2)
    with torch.no_grad():
        _, want_hidden = ref(torch.from_numpy(tokens))
    _, got_hidden = ours.apply(
        params, jnp.asarray(tokens, jnp.int32), return_sequence=True, penultimate=True
    )
    np.testing.assert_allclose(np.asarray(got_hidden), want_hidden.numpy(),
                               rtol=1e-4, atol=1e-4)


# ---------------- diffusers AutoencoderKL decoder replica -----------------
class _DResnet(tnn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.norm1 = tnn.GroupNorm(32, cin, eps=1e-6)
        self.conv1 = tnn.Conv2d(cin, cout, 3, padding=1)
        self.norm2 = tnn.GroupNorm(32, cout, eps=1e-6)
        self.conv2 = tnn.Conv2d(cout, cout, 3, padding=1)
        self.conv_shortcut = tnn.Conv2d(cin, cout, 1) if cin != cout else None

    def forward(self, x):
        h = self.conv1(F.silu(self.norm1(x)))
        h = self.conv2(F.silu(self.norm2(h)))
        if self.conv_shortcut is not None:
            x = self.conv_shortcut(x)
        return x + h


class _DAttention(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.group_norm = tnn.GroupNorm(32, c, eps=1e-6)
        self.to_q = tnn.Linear(c, c)
        self.to_k = tnn.Linear(c, c)
        self.to_v = tnn.Linear(c, c)
        self.to_out = tnn.ModuleList([tnn.Linear(c, c)])

    def forward(self, x):
        b, c, h, w = x.shape
        y = self.group_norm(x).reshape(b, c, h * w).transpose(1, 2)
        q, k, v = self.to_q(y), self.to_k(y), self.to_v(y)
        a = (q @ k.transpose(-1, -2)) * c**-0.5
        o = self.to_out[0](a.softmax(-1) @ v)
        return x + o.transpose(1, 2).reshape(b, c, h, w)


class _DMidBlock(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.resnets = tnn.ModuleList([_DResnet(c, c), _DResnet(c, c)])
        self.attentions = tnn.ModuleList([_DAttention(c)])

    def forward(self, x):
        x = self.resnets[0](x)
        x = self.attentions[0](x)
        return self.resnets[1](x)


class _DUpBlock(tnn.Module):
    def __init__(self, cin, cout, upsample):
        super().__init__()
        self.resnets = tnn.ModuleList(
            [_DResnet(cin if i == 0 else cout, cout) for i in range(3)]
        )
        self.upsamplers = (
            tnn.ModuleList([tnn.Module()]) if upsample else None
        )
        if upsample:
            self.upsamplers[0].conv = tnn.Conv2d(cout, cout, 3, padding=1)

    def forward(self, x):
        for r in self.resnets:
            x = r(x)
        if self.upsamplers is not None:
            x = F.interpolate(x, scale_factor=2, mode="nearest")
            x = self.upsamplers[0].conv(x)
        return x


class _DDecoder(tnn.Module):
    def __init__(self, channels=(32, 64), zc=4):
        super().__init__()
        rev = list(reversed(channels))
        self.conv_in = tnn.Conv2d(zc, rev[0], 3, padding=1)
        self.mid_block = _DMidBlock(rev[0])
        self.up_blocks = tnn.ModuleList()
        for i, cout in enumerate(rev):
            cin = rev[max(i - 1, 0)]
            self.up_blocks.append(_DUpBlock(cin, cout, upsample=i < len(rev) - 1))
        self.conv_norm_out = tnn.GroupNorm(32, rev[-1], eps=1e-6)
        self.conv_out = tnn.Conv2d(rev[-1], 3, 3, padding=1)

    def forward(self, z):
        x = self.conv_in(z)
        x = self.mid_block(x)
        for b in self.up_blocks:
            x = b(x)
        return self.conv_out(F.silu(self.conv_norm_out(x)))


class _DAutoencoderDecoderOnly(tnn.Module):
    """AutoencoderKL decode path, diffusers key layout."""

    def __init__(self, channels=(32, 64), zc=4):
        super().__init__()
        self.post_quant_conv = tnn.Conv2d(zc, zc, 1)
        self.decoder = _DDecoder(channels, zc)

    def forward(self, z):
        return self.decoder(self.post_quant_conv(z))


def test_sdxl_vae_decoder_parity():
    """convert_sdxl_vae: diffusers AutoencoderKL layout → VAEDecoder params;
    pixel-level forward parity incl. upsampler placement, conv_shortcut,
    single-head mid attention and GroupNorm eps=1e-6."""
    import jax.numpy as jnp

    from divergen_tpu.pipeline.generation.vae import VAEDecoder
    from divergen_tpu.utils.torch_weights import convert_sdxl_vae

    torch.manual_seed(5)
    channels = (32, 64)
    ref = _DAutoencoderDecoderOnly(channels=channels)
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    converted = convert_sdxl_vae(sd, n_levels=len(channels))
    assert converted["encoder"] is None

    sf = 0.13025
    ours = VAEDecoder(channels=channels, scaling_factor=sf)
    rng = np.random.RandomState(2)
    z = rng.randn(2, 8, 8, 4).astype(np.float32)

    with torch.no_grad():
        # our decoder divides by scaling_factor internally; diffusers does
        # it in the pipeline before calling vae.decode
        want = ref(torch.from_numpy(z.transpose(0, 3, 1, 2) / sf)).numpy()
    got = np.asarray(ours.apply(converted["decoder"], jnp.asarray(z)))
    np.testing.assert_allclose(got, want.transpose(0, 2, 3, 1), rtol=2e-4, atol=2e-4)
