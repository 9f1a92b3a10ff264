"""Checkpoint converter tests: torch-layout state dicts → flax params,
verified by exact placement (values land where the names say) and by
running the converted model."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from divergen_tpu.utils.torch_weights import (
    _merge_trees,
    convert_clip_text,
    convert_swin,
    load_state_dict,
)


def _rand_sd_clip_text(width=32, layers=2, vocab=64, ctx=16, embed=16, rng=None):
    rng = rng or np.random.RandomState(0)
    sd = {
        "token_embedding.weight": rng.randn(vocab, width).astype(np.float32),
        "positional_embedding": rng.randn(ctx, width).astype(np.float32),
        "text_projection": rng.randn(width, embed).astype(np.float32),
        "ln_final.weight": np.ones(width, np.float32),
        "ln_final.bias": np.zeros(width, np.float32),
    }
    for i in range(layers):
        rb = f"transformer.resblocks.{i}."
        sd.update({
            rb + "ln_1.weight": np.ones(width, np.float32),
            rb + "ln_1.bias": np.zeros(width, np.float32),
            rb + "ln_2.weight": np.ones(width, np.float32),
            rb + "ln_2.bias": np.zeros(width, np.float32),
            rb + "attn.in_proj_weight": rng.randn(3 * width, width).astype(np.float32),
            rb + "attn.in_proj_bias": rng.randn(3 * width).astype(np.float32),
            rb + "attn.out_proj.weight": rng.randn(width, width).astype(np.float32),
            rb + "attn.out_proj.bias": rng.randn(width).astype(np.float32),
            rb + "mlp.c_fc.weight": rng.randn(4 * width, width).astype(np.float32),
            rb + "mlp.c_fc.bias": rng.randn(4 * width).astype(np.float32),
            rb + "mlp.c_proj.weight": rng.randn(width, 4 * width).astype(np.float32),
            rb + "mlp.c_proj.bias": rng.randn(width).astype(np.float32),
        })
    return sd


def test_clip_text_conversion_runs():
    from divergen_tpu.modeling.text.clip import CLIPText

    sd = _rand_sd_clip_text()
    params = convert_clip_text(sd)
    # kernels transposed
    np.testing.assert_allclose(
        params["params"]["resblock0"]["attn"]["in_proj"]["kernel"],
        sd["transformer.resblocks.0.attn.in_proj_weight"].T,
    )
    model = CLIPText(embed_dim=16, context_length=16, vocab_size=64, width=32, heads=2, layers=2)
    toks = jnp.asarray(np.random.RandomState(1).randint(1, 60, (2, 16)), jnp.int32)
    # shapes must line up exactly with a fresh init
    ref = model.init(jax.random.PRNGKey(0), toks)

    def shapes(tree):
        flat = jax.tree_util.tree_flatten_with_path(tree)[0]
        return {jax.tree_util.keystr(p): tuple(np.shape(v)) for p, v in flat}

    assert shapes(ref) == shapes(params)
    out = model.apply(params, toks)
    assert out.shape == (2, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_swin_conversion_shapes():
    from divergen_tpu.modeling.backbone.swin import SwinTransformer

    model = SwinTransformer(embed_dim=32, depths=(2, 2), num_heads=(2, 4), window=4)
    x = jnp.zeros((1, 32, 32, 3))
    ref = model.init(jax.random.PRNGKey(0), x)["params"]

    rng = np.random.RandomState(0)
    sd = {
        "patch_embed.proj.weight": rng.randn(32, 3, 4, 4).astype(np.float32),
        "patch_embed.proj.bias": rng.randn(32).astype(np.float32),
        "patch_embed.norm.weight": np.ones(32, np.float32),
        "patch_embed.norm.bias": np.zeros(32, np.float32),
    }
    for stage, (depth, dim, heads) in enumerate([(2, 32, 2), (2, 64, 4)]):
        for blk in range(depth):
            b = f"layers.{stage}.blocks.{blk}."
            tbl = (2 * 4 - 1) ** 2
            sd.update({
                b + "norm1.weight": np.ones(dim, np.float32),
                b + "norm1.bias": np.zeros(dim, np.float32),
                b + "norm2.weight": np.ones(dim, np.float32),
                b + "norm2.bias": np.zeros(dim, np.float32),
                b + "attn.qkv.weight": rng.randn(3 * dim, dim).astype(np.float32),
                b + "attn.qkv.bias": rng.randn(3 * dim).astype(np.float32),
                b + "attn.proj.weight": rng.randn(dim, dim).astype(np.float32),
                b + "attn.proj.bias": rng.randn(dim).astype(np.float32),
                b + "attn.relative_position_bias_table": rng.randn(tbl, heads).astype(np.float32),
                b + "mlp.fc1.weight": rng.randn(4 * dim, dim).astype(np.float32),
                b + "mlp.fc1.bias": rng.randn(4 * dim).astype(np.float32),
                b + "mlp.fc2.weight": rng.randn(dim, 4 * dim).astype(np.float32),
                b + "mlp.fc2.bias": rng.randn(dim).astype(np.float32),
            })
        if stage == 0:
            sd.update({
                "layers.0.downsample.norm.weight": np.ones(128, np.float32),
                "layers.0.downsample.norm.bias": np.zeros(128, np.float32),
                "layers.0.downsample.reduction.weight": rng.randn(64, 128).astype(np.float32),
            })
    sd.update({
        "norm0.weight": np.ones(32, np.float32), "norm0.bias": np.zeros(32, np.float32),
        "norm1.weight": np.ones(64, np.float32), "norm1.bias": np.zeros(64, np.float32),
    })
    conv = convert_swin(sd, depths=(2, 2))
    merged, skipped = _merge_trees(ref, conv)
    assert not [s for s in skipped if "unknown" in s], skipped
    # every converted leaf placed
    np.testing.assert_allclose(
        merged["stage0_block0"]["attn"]["qkv"]["kernel"],
        sd["layers.0.blocks.0.attn.qkv.weight"].T,
    )
    out = SwinTransformer(embed_dim=32, depths=(2, 2), num_heads=(2, 4), window=4).apply(
        {"params": merged}, x
    )
    assert out["s3"].shape == (1, 4, 4, 64)


def test_merge_trees_skips_mismatch():
    target = {"a": np.zeros((2, 2)), "b": {"c": np.zeros(3)}}
    src = {"a": np.ones((2, 2)), "b": {"c": np.ones(4)}, "d": np.ones(1)}
    merged, skipped = _merge_trees(target, src)
    np.testing.assert_array_equal(merged["a"], 1)
    np.testing.assert_array_equal(merged["b"]["c"], 0)  # mismatched → kept
    assert len(skipped) == 2


def test_load_state_dict_torch_roundtrip(tmp_path):
    import torch

    sd = {"w": torch.arange(6, dtype=torch.float32).reshape(2, 3)}
    torch.save({"state_dict": sd}, tmp_path / "m.pth")
    out = load_state_dict(str(tmp_path / "m.pth"))
    np.testing.assert_array_equal(out["w"], np.arange(6, dtype=np.float32).reshape(2, 3))


def test_sdxl_unet_conversion_full_coverage():
    """Synthesize a diffusers-style state dict with the tiny UNet's shapes,
    convert, merge, and verify every flax leaf took the torch value."""
    import re

    import jax
    import jax.numpy as jnp

    from divergen_tpu.pipeline.generation.unet import UNetSDXL
    from divergen_tpu.utils.torch_weights import _merge_trees, convert_sdxl_unet

    unet = UNetSDXL.tiny(dtype=jnp.float32)
    lat = jnp.zeros((1, 16, 16, 4))
    ctx = jnp.zeros((1, 7, 64))
    pooled = jnp.zeros((1, 1280))
    tids = jnp.zeros((1, 6))
    params = unet.init(jax.random.PRNGKey(0), lat, jnp.zeros((1,)), ctx, pooled, tids)
    n_lvl = len(unet.block_channels)

    def module_to_torch(mod: str) -> str:
        """flax module path (no leaf) -> diffusers module name."""
        mod = mod.replace("/GroupNorm_0", "")

        def tx(m):
            rest = (
                m[2]
                .replace("attn1_out", "attn1.to_out.0")
                .replace("attn2_out", "attn2.to_out.0")
                .replace("attn1_", "attn1.to_")
                .replace("attn2_", "attn2.to_")
                .replace("ff_geglu", "ff.net.0.proj")
                .replace("ff_out", "ff.net.2")
            )
            return f"transformer_blocks.{m[1]}.{rest}"

        mod = re.sub(r"block(\d+)/(.*)", tx, mod)
        rules = [
            (r"down(\d+)_res(\d+)/(.*)", lambda m: f"down_blocks.{m[1]}.resnets.{m[2]}.{m[3]}"),
            (r"down(\d+)_attn(\d+)/(.*)", lambda m: f"down_blocks.{m[1]}.attentions.{m[2]}.{m[3]}"),
            (r"down(\d+)_ds/conv", lambda m: f"down_blocks.{m[1]}.downsamplers.0.conv"),
            (r"up(\d+)_res(\d+)/(.*)", lambda m: f"up_blocks.{n_lvl - 1 - int(m[1])}.resnets.{m[2]}.{m[3]}"),
            (r"up(\d+)_attn(\d+)/(.*)", lambda m: f"up_blocks.{n_lvl - 1 - int(m[1])}.attentions.{m[2]}.{m[3]}"),
            (r"up(\d+)_us/conv", lambda m: f"up_blocks.{n_lvl - 1 - int(m[1])}.upsamplers.0.conv"),
            (r"mid_res(\d+)/(.*)", lambda m: f"mid_block.resnets.{m[1]}.{m[2]}"),
            (r"mid_attn/(.*)", lambda m: f"mid_block.attentions.0.{m[1]}"),
            (r"time_embed_1", lambda m: "time_embedding.linear_1"),
            (r"time_embed_2", lambda m: "time_embedding.linear_2"),
            (r"add_embed_1", lambda m: "add_embedding.linear_1"),
            (r"add_embed_2", lambda m: "add_embedding.linear_2"),
            (r"conv_in", lambda m: "conv_in"),
            (r"conv_out", lambda m: "conv_out"),
            (r"norm_out", lambda m: "conv_norm_out"),
        ]
        for pat, fn in rules:
            m = re.fullmatch(pat, mod)
            if m:
                out = fn(m)
                # attention internals may still carry a norm1/proj_in tail
                return out
        raise AssertionError(f"unmapped flax module {mod}")

    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    sd = {}
    for kp, arr in flat:
        path = [k.key for k in kp]
        assert path[0] == "params"
        leaf = path[-1]
        mod = "/".join(path[1:-1])
        arr = np.asarray(arr)
        if leaf == "kernel" and arr.ndim == 4:
            tarr = arr.transpose(3, 2, 0, 1)
        elif leaf == "kernel":
            tarr = arr.T
        else:
            tarr = arr
        suffix = ".weight" if leaf in ("kernel", "scale") else ".bias"
        sd[module_to_torch(mod) + suffix] = tarr

    conv = convert_sdxl_unet(sd, unet)
    merged, skipped = _merge_trees(jax.tree.map(np.asarray, params), conv)
    assert not skipped, skipped[:10]
    flat2, _ = jax.tree_util.tree_flatten_with_path(merged)
    # round trip: every leaf must equal the synthesized torch tensor
    for (kp, orig), (kp2, got) in zip(flat, flat2):
        assert kp == kp2
        np.testing.assert_allclose(np.asarray(orig), np.asarray(got), rtol=0, atol=0,
                                   err_msg="/".join(k.key for k in kp))
    out = unet.apply(merged, lat, jnp.zeros((1,)), ctx, pooled, tids)
    assert np.isfinite(np.asarray(out)).all()
