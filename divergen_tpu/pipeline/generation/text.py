"""SDXL prompt conditioning: the two CLIP text towers, fused.

Counterpart of the reference's ``stage_1.encode_prompt(prompt)``
(``DiverGen/generation/txt2img_diffusers_stages_from_txt.py:242`` — the
diffusers ``StableDiffusionXLPipeline.encode_prompt``): tokenize with both
tokenizers, run CLIP ViT-L/14 (quick_gelu) and OpenCLIP ViT-bigG/14 (gelu),
concatenate the PENULTIMATE hidden states (768 + 1280 = 2048) as the
cross-attention context, and take bigG's projected EOT embedding (1280) as
the pooled add-embedding. TPU design: both towers run inside one jit —
batched prompts, one dispatch, bf16-friendly.

Tokenizer conventions matter for output parity because SDXL has no padding
mask: tower 1 (diffusers CLIPTokenizer) pads with the EOT id, tower 2
(OpenCLIP-style) pads with 0.
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from ...modeling.text.clip import CLIPText, build_sdxl_text_towers
from ...modeling.text.tokenizer import SimpleTokenizer


def tiny_sdxl_text_towers(dtype=None):
    """Miniature tower pair with the real dual-tower wiring (tests).
    Hidden widths sum to 64 = UNetSDXL.tiny's context_dim."""
    import jax.numpy as jnp

    dtype = dtype or jnp.float32
    clip_l = CLIPText(embed_dim=24, width=24, heads=2, layers=2,
                      vocab_size=49408, dtype=dtype)
    big_g = CLIPText(embed_dim=40, width=40, heads=2, layers=2,
                     vocab_size=49408, dtype=dtype, act="gelu")
    return clip_l, big_g


class SDXLTextEncoder:
    """Both towers + tokenizer behind one jitted ``encode`` call.

    ``params_l`` / ``params_g``: CLIPText param trees (from
    utils.torch_weights.load_sdxl_text_params, or random init for
    smoke/throughput runs).
    """

    def __init__(self, params_l, params_g, bpe_path: str = "",
                 towers: Optional[Tuple[CLIPText, CLIPText]] = None,
                 dtype=None):
        import jax
        import jax.numpy as jnp

        self.clip_l, self.big_g = towers or build_sdxl_text_towers(
            dtype=dtype or jnp.float32
        )
        self.params_l = params_l
        self.params_g = params_g
        self.tokenizer = (
            SimpleTokenizer(bpe_path=bpe_path) if bpe_path
            else SimpleTokenizer(merges=[])
        )
        self._eot = self.tokenizer.eot

        def fwd(pl, pg, tok_l, tok_g):
            _, hid_l = self.clip_l.apply(
                pl, tok_l, return_sequence=True, penultimate=True
            )
            pooled_g, hid_g = self.big_g.apply(
                pg, tok_g, return_sequence=True, penultimate=True
            )
            ctx = jnp.concatenate(
                [hid_l.astype(jnp.float32), hid_g.astype(jnp.float32)], axis=-1
            )
            return ctx, pooled_g.astype(jnp.float32)

        self._fwd = jax.jit(fwd)

    @classmethod
    def random(cls, seed: int = 0, tiny: bool = False, dtype=None):
        """Random-weight towers: real architecture + real prompt hashing
        through BPE tokens — shape/throughput-true when no checkpoint is
        available (replaces the round-2 hash-seeded-embedding stub)."""
        import jax

        towers = tiny_sdxl_text_towers(dtype) if tiny else build_sdxl_text_towers(
            dtype or jax.numpy.float32
        )
        clip_l, big_g = towers
        tok = np.zeros((1, 77), np.int32)
        params_l = jax.jit(clip_l.init)(jax.random.PRNGKey(seed), tok)
        params_g = jax.jit(big_g.init)(jax.random.PRNGKey(seed + 1), tok)
        return cls(params_l, params_g, towers=towers, dtype=dtype)

    def tokenize(self, prompts: List[str]) -> Tuple[np.ndarray, np.ndarray]:
        tok_l = self.tokenizer.tokenize(prompts, pad_id=self._eot)
        tok_g = self.tokenizer.tokenize(prompts, pad_id=0)
        return tok_l, tok_g

    def encode(self, prompts: List[str]):
        """prompts → (ctx (B, 77, 2048), pooled (B, 1280)) [f32]."""
        import jax.numpy as jnp

        tok_l, tok_g = self.tokenize(prompts)
        ctx, pooled = self._fwd(
            self.params_l, self.params_g, jnp.asarray(tok_l), jnp.asarray(tok_g)
        )
        return ctx, pooled

    def encode_sliced(self, prompts: List[str], ctx_dim: int):
        """Prompt-faithful conditioning at an arbitrary context width: the
        concatenated tower hidden states sliced to ``ctx_dim``. Used for the
        stage-III x4 upscaler when no dedicated upscaler text tower is
        loaded (the reference conditions stage 3 on the prompt through the
        x4 pipeline's own encoder,
        txt2img_diffusers_stages_from_txt.py:313-325; slicing real SDXL
        features keeps the upscale prompt-conditioned without a second
        checkpoint)."""
        ctx, _ = self.encode(prompts)
        if ctx.shape[-1] < ctx_dim:
            import jax.numpy as jnp

            pad = jnp.zeros(ctx.shape[:-1] + (ctx_dim - ctx.shape[-1],), ctx.dtype)
            return jnp.concatenate([ctx, pad], axis=-1)
        return ctx[..., :ctx_dim]


def tower_from_params(params, act: str = "gelu", dtype=None) -> CLIPText:
    """Build a CLIPText module matching a converted checkpoint's shapes.

    Used for the SD-x4-upscaler's own text tower (OpenCLIP ViT-H in HF
    CLIPTextModel layout: width 1024, 23 layers, exact gelu — the encoder
    the reference's stage-3 DiffusionPipeline applies to the prompt)."""
    import jax.numpy as jnp

    p = params["params"] if "params" in params else params
    width = int(np.asarray(p["positional_embedding"]).shape[1])
    vocab = int(np.asarray(p["token_embedding"]["embedding"]).shape[0])
    layers = sum(1 for k in p if k.startswith("resblock"))
    return CLIPText(
        embed_dim=int(np.asarray(p["text_projection"]).shape[-1]),
        width=width, heads=max(width // 64, 1), layers=layers,
        vocab_size=vocab, act=act, dtype=dtype or jnp.float32,
    )


class UpscalerTextEncoder:
    """Stage-III prompt conditioning through a dedicated CLIP tower.

    SD-x4-upscaler convention: FINAL-layer hidden states (the HF checkpoint
    ships with the last layer already dropped), padded with EOT like
    diffusers' CLIPTokenizer."""

    def __init__(self, params, bpe_path: str = "", tower: Optional[CLIPText] = None):
        import jax

        self.tower = tower or tower_from_params(params)
        self.params = params
        self.tokenizer = (
            SimpleTokenizer(bpe_path=bpe_path) if bpe_path
            else SimpleTokenizer(merges=[])
        )
        self._fwd = jax.jit(
            lambda p, tok: self.tower.apply(p, tok, return_sequence=True)[1]
        )

    def encode(self, prompts: List[str], ctx_dim: Optional[int] = None):
        import jax.numpy as jnp

        tok = self.tokenizer.tokenize(prompts, pad_id=self.tokenizer.eot)
        ctx = self._fwd(self.params, jnp.asarray(tok))
        return ctx.astype(jnp.float32)
