"""SAM mask-decoder conversion parity vs an independent torch replica.

The segment-anything package isn't installed and its checkpoints aren't
downloadable here, so the oracle is a line-for-line torch implementation of
the PUBLISHED SAM decoder architecture (two-way transformer + upscaling +
hypernetworks + IoU head), written against the public key layout that
``convert_sam`` consumes (mask_decoder.transformer.layers.N..., iou_token,
mask_tokens, output_upscaling, output_hypernetworks_mlps,
iou_prediction_head, prompt_encoder.*). Forward parity through the
converter validates every transpose/flip/wiring decision."""
import math
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))
import ref_loader  # noqa: E402


@pytest.fixture(scope="module", autouse=True)
def _install():
    ref_loader.install()


def _build_torch_decoder(dim, depth, heads):
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    class Attention(nn.Module):
        def __init__(self, dim, heads, downsample=1):
            super().__init__()
            self.internal = dim // downsample
            self.heads = heads
            self.q_proj = nn.Linear(dim, self.internal)
            self.k_proj = nn.Linear(dim, self.internal)
            self.v_proj = nn.Linear(dim, self.internal)
            self.out_proj = nn.Linear(self.internal, dim)

        def forward(self, q, k, v):
            q, k, v = self.q_proj(q), self.k_proj(k), self.v_proj(v)
            b, n, _ = q.shape
            d = self.internal // self.heads

            def split(x):
                return x.reshape(b, -1, self.heads, d).transpose(1, 2)

            q, k, v = split(q), split(k), split(v)
            attn = (q @ k.transpose(2, 3)) / math.sqrt(d)
            attn = torch.softmax(attn, dim=-1)
            out = (attn @ v).transpose(1, 2).reshape(b, n, self.internal)
            return self.out_proj(out)

    class Block(nn.Module):
        def __init__(self, skip_first_pe):
            super().__init__()
            self.skip = skip_first_pe
            self.self_attn = Attention(dim, heads)
            self.norm1 = nn.LayerNorm(dim)
            self.cross_attn_token_to_image = Attention(dim, heads, 2)
            self.norm2 = nn.LayerNorm(dim)
            self.mlp = nn.ModuleDict(
                {"lin1": nn.Linear(dim, 2048), "lin2": nn.Linear(2048, dim)}
            )
            self.norm3 = nn.LayerNorm(dim)
            self.cross_attn_image_to_token = Attention(dim, heads, 2)
            self.norm4 = nn.LayerNorm(dim)

        def forward(self, queries, keys, qpe, kpe):
            if self.skip:
                queries = self.self_attn(queries, queries, queries)
            else:
                q = queries + qpe
                queries = queries + self.self_attn(q, q, queries)
            queries = self.norm1(queries)
            q = queries + qpe
            k = keys + kpe
            queries = self.norm2(queries + self.cross_attn_token_to_image(q, k, keys))
            queries = self.norm3(
                queries + self.mlp["lin2"](torch.relu(self.mlp["lin1"](queries)))
            )
            q = queries + qpe
            k = keys + kpe
            keys = self.norm4(keys + self.cross_attn_image_to_token(k, q, queries))
            return queries, keys

    class LayerNorm2d(nn.Module):
        def __init__(self, c):
            super().__init__()
            self.weight = nn.Parameter(torch.ones(c))
            self.bias = nn.Parameter(torch.zeros(c))

        def forward(self, x):
            u = x.mean(1, keepdim=True)
            s = (x - u).pow(2).mean(1, keepdim=True)
            x = (x - u) / torch.sqrt(s + 1e-6)
            return self.weight[:, None, None] * x + self.bias[:, None, None]

    class MLP(nn.Module):
        def __init__(self, dims):
            super().__init__()
            self.layers = nn.ModuleList(
                nn.Linear(a, b) for a, b in zip(dims[:-1], dims[1:])
            )

        def forward(self, x):
            for i, l in enumerate(self.layers):
                x = l(x) if i == 0 else l(torch.relu(x))
            return x

    class Transformer(nn.Module):
        def __init__(self):
            super().__init__()
            self.layers = nn.ModuleList(Block(i == 0) for i in range(depth))
            self.final_attn_token_to_image = Attention(dim, heads, 2)
            self.norm_final_attn = nn.LayerNorm(dim)

        def forward(self, src, pos, tokens):
            queries, keys = tokens, src
            for l in self.layers:
                queries, keys = l(queries, keys, tokens, pos)
            q = queries + tokens
            k = keys + pos
            queries = self.norm_final_attn(
                queries + self.final_attn_token_to_image(q, k, keys)
            )
            return queries, keys

    class Decoder(nn.Module):
        def __init__(self):
            super().__init__()
            self.transformer = Transformer()
            self.iou_token = nn.Embedding(1, dim)
            self.mask_tokens = nn.Embedding(4, dim)
            self.output_upscaling = nn.Sequential(
                nn.ConvTranspose2d(dim, dim // 4, 2, stride=2),
                LayerNorm2d(dim // 4),
                nn.GELU(),
                nn.ConvTranspose2d(dim // 4, dim // 8, 2, stride=2),
                nn.GELU(),
            )
            self.output_hypernetworks_mlps = nn.ModuleList(
                MLP([dim, dim, dim, dim // 8]) for _ in range(4)
            )
            self.iou_prediction_head = MLP([dim, dim, dim, 4])

        def forward(self, image_emb, image_pe, sparse, dense):
            # image_emb (B,C,h,w); sparse (B,P,C); dense (C,)
            b, c, h, w = image_emb.shape
            out_tok = torch.cat(
                [self.iou_token.weight, self.mask_tokens.weight], 0
            )
            tokens = torch.cat(
                [out_tok.unsqueeze(0).expand(b, -1, -1), sparse], 1
            )
            src = image_emb + dense[None, :, None, None]
            src = src.flatten(2).permute(0, 2, 1)
            pos = image_pe.flatten(1).permute(1, 0).unsqueeze(0).expand(b, -1, -1)
            hs, src = self.transformer(src, pos, tokens)
            iou_tok = hs[:, 0]
            mask_toks = hs[:, 1:5]
            src = src.permute(0, 2, 1).reshape(b, c, h, w)
            up = self.output_upscaling(src)
            hyper = torch.stack(
                [m(mask_toks[:, i]) for i, m in enumerate(self.output_hypernetworks_mlps)], 1
            )
            masks = (hyper @ up.flatten(2)).reshape(b, 4, h * 4, w * 4)
            iou = self.iou_prediction_head(iou_tok)
            return masks[:, 1:4], iou[:, 1:4]

    return Decoder()


def test_sam_decoder_conversion_parity():
    import jax
    import jax.numpy as jnp
    import torch

    from divergen_tpu.pipeline.segmentation.sam import MaskDecoder
    from divergen_tpu.utils.torch_weights import convert_sam

    torch.manual_seed(0)
    dim, depth, heads, h = 32, 2, 8, 8
    ref = _build_torch_decoder(dim, depth, heads).eval()

    # wrap the replica's state_dict in the public checkpoint key layout,
    # with enough prompt/encoder keys for convert_sam's fixed lookups
    sd = {f"mask_decoder.{k}": v.detach().numpy() for k, v in ref.state_dict().items()}
    rng = np.random.RandomState(0)
    sd.update({
        "image_encoder.patch_embed.proj.weight": rng.randn(dim, 3, 4, 4).astype(np.float32),
        "image_encoder.patch_embed.proj.bias": np.zeros(dim, np.float32),
        "image_encoder.pos_embed": rng.randn(1, h, h, dim).astype(np.float32),
        "image_encoder.neck.0.weight": rng.randn(dim, dim, 1, 1).astype(np.float32),
        "image_encoder.neck.1.weight": np.ones(dim, np.float32),
        "image_encoder.neck.1.bias": np.zeros(dim, np.float32),
        "image_encoder.neck.2.weight": rng.randn(dim, dim, 3, 3).astype(np.float32),
        "image_encoder.neck.3.weight": np.ones(dim, np.float32),
        "image_encoder.neck.3.bias": np.zeros(dim, np.float32),
        "prompt_encoder.pe_layer.positional_encoding_gaussian_matrix": rng.randn(2, dim // 2).astype(np.float32),
        "prompt_encoder.point_embeddings.0.weight": rng.randn(1, dim).astype(np.float32),
        "prompt_encoder.point_embeddings.1.weight": rng.randn(1, dim).astype(np.float32),
        "prompt_encoder.not_a_point_embed.weight": rng.randn(1, dim).astype(np.float32),
        "prompt_encoder.no_mask_embed.weight": rng.randn(1, dim).astype(np.float32),
    })
    conv = convert_sam(sd, layers=0)

    image_emb = rng.randn(2, h, h, dim).astype(np.float32)
    image_pe = rng.randn(h, h, dim).astype(np.float32)
    sparse = rng.randn(2, 5, dim).astype(np.float32)
    dense = sd["prompt_encoder.no_mask_embed.weight"][0]

    dec = MaskDecoder(dim=dim, depth=depth)
    params = {"params": conv["params"]["decoder"]}
    masks, iou = dec.apply(
        params, jnp.asarray(image_emb), jnp.asarray(image_pe),
        jnp.asarray(sparse), jnp.asarray(dense),
    )
    with torch.no_grad():
        ref_masks, ref_iou = ref(
            torch.tensor(image_emb.transpose(0, 3, 1, 2)),
            torch.tensor(image_pe.transpose(2, 0, 1)),
            torch.tensor(sparse),
            torch.tensor(dense),
        )
    np.testing.assert_allclose(
        np.asarray(masks), ref_masks.numpy(), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(np.asarray(iou), ref_iou.numpy(), rtol=2e-4, atol=2e-4)
