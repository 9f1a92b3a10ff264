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
