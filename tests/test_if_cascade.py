"""DeepFloyd-IF cascade (pipeline/generation/if_unet.py): tiny-config
stage I/II pipelines, learned-range DDPM properties, converter coverage.

Reference drives IF-I-XL / IF-II-L via diffusers
(generation/txt2img_diffusers_stages_from_txt.py:136-198)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from divergen_tpu.pipeline.generation.if_unet import (
    IFStageIIPipeline,
    IFStageIPipeline,
    IFUNet,
)
from divergen_tpu.pipeline.generation.scheduler import (
    ddpm_learned_range_step,
    ddpm_timesteps,
    dynamic_threshold,
    make_scheduler,
)


def _tiny_unet(**kw):
    cfg = dict(channels=(8, 16), layers_per_block=1, encoder_dim=12,
               head_dim=4, pool_heads=2, attn_start=1)
    cfg.update(kw)
    return IFUNet(**cfg)


def _ctx(b, l=5, d=12, seed=0):
    return jnp.asarray(np.random.RandomState(seed).randn(b, l, d), jnp.float32)


def test_if_unet_shapes_and_grad():
    unet = _tiny_unet()
    x = jnp.zeros((2, 16, 16, 3))
    t = jnp.array([10, 500])
    ctx = _ctx(2)
    params = unet.init(jax.random.PRNGKey(0), x, t, ctx)
    out = unet.apply(params, x, t, ctx)
    assert out.shape == (2, 16, 16, 6)  # eps + learned variance
    assert np.isfinite(np.asarray(out)).all()


def test_if_stage1_pipeline_generates():
    unet = _tiny_unet()
    ctx = _ctx(1)
    params = unet.init(jax.random.PRNGKey(0), jnp.zeros((2, 8, 8, 3)),
                       jnp.zeros((2,), jnp.int32), jnp.concatenate([ctx, ctx]))
    pipe = IFStageIPipeline(unet, params, steps=3)
    img = pipe.generate(jax.random.PRNGKey(1), ctx, jnp.zeros_like(ctx), size=8)
    img = np.asarray(img)
    assert img.shape == (1, 8, 8, 3)
    assert np.isfinite(img).all() and img.min() >= -1.0 and img.max() <= 1.0


def test_if_stage2_pipeline_upscales():
    unet = _tiny_unet(in_channels=6, noise_level_cond=True, attn_start=1)
    ctx = _ctx(1)
    params = unet.init(
        jax.random.PRNGKey(0), jnp.zeros((2, 16, 16, 6)),
        jnp.zeros((2,), jnp.int32), jnp.concatenate([ctx, ctx]),
        noise_level=jnp.zeros((2,), jnp.int32),
    )
    pipe = IFStageIIPipeline(unet, params, steps=2)
    low = jnp.zeros((1, 8, 8, 3))
    img = pipe.generate(jax.random.PRNGKey(1), low, ctx, jnp.zeros_like(ctx),
                        noise_level=100, scale=2)
    assert np.asarray(img).shape == (1, 16, 16, 3)
    assert np.isfinite(np.asarray(img)).all()


def test_ddpm_timesteps_leading_spacing():
    cfg = make_scheduler("cosine")
    ts = ddpm_timesteps(cfg, 4)
    assert list(ts) == [750, 500, 250, 0]  # leading: k·(1000//4), reversed


def test_dynamic_threshold_matches_numpy_quantile():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 4, 4, 3).astype(np.float32) * 3.0
    out = np.asarray(dynamic_threshold(jnp.asarray(x), 0.95, 1.5))
    for b in range(2):
        s = np.quantile(np.abs(x[b]).ravel(), 0.95)
        s = np.clip(s, 1.0, 1.5)
        np.testing.assert_allclose(out[b], np.clip(x[b], -s, s) / s, atol=1e-5)
    assert np.abs(out).max() <= 1.0 + 1e-6


def test_learned_range_variance_endpoints():
    """v=-1 → posterior (min) log-variance; v=+1 → β_t (max): the step noise
    magnitude must match each closed form exactly (DDPMScheduler
    'learned_range' semantics)."""
    cfg = make_scheduler("cosine")
    t, pt = 500, 250
    ac = cfg.alphas_cumprod
    abar_t, abar_prev = ac[t], ac[pt]
    current_beta = 1 - abar_t / abar_prev
    posterior = (1 - abar_prev) / (1 - abar_t) * current_beta

    lat = jnp.ones((1, 2, 2, 3)) * 0.3
    eps = jnp.zeros_like(lat)
    noise = jnp.ones_like(lat)
    base = ddpm_learned_range_step(cfg, lat, eps, jnp.zeros_like(lat) - 1,
                                   t, pt, jnp.zeros_like(lat),
                                   thresholding=False)
    lo = ddpm_learned_range_step(cfg, lat, eps, jnp.zeros_like(lat) - 1,
                                 t, pt, noise, thresholding=False)
    hi = ddpm_learned_range_step(cfg, lat, eps, jnp.ones_like(lat),
                                 t, pt, noise, thresholding=False)
    sigma_lo = float((lo - base).ravel()[0])
    sigma_hi = float((hi - base).ravel()[0])
    np.testing.assert_allclose(sigma_lo, np.sqrt(posterior), rtol=1e-5)
    np.testing.assert_allclose(sigma_hi, np.sqrt(current_beta), rtol=1e-5)


def test_final_step_is_deterministic():
    cfg = make_scheduler("cosine")
    lat = jnp.ones((1, 2, 2, 3)) * 0.1
    eps = jnp.zeros_like(lat)
    a = ddpm_learned_range_step(cfg, lat, eps, jnp.zeros_like(lat), 0, -250,
                                jnp.ones_like(lat), thresholding=False)
    b = ddpm_learned_range_step(cfg, lat, eps, jnp.zeros_like(lat), 0, -250,
                                jnp.zeros_like(lat), thresholding=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def _fake_diffusers_sd(unet, params):
    """Invert the converter's naming: diffusers-style keys with the right
    shapes for the given tiny config (the same scheme
    test_full_shape_convert.py uses for SDXL)."""
    p = params["params"]
    sd = {}

    def lin(src, node):
        sd[f"{src}.weight"] = np.ascontiguousarray(np.asarray(node["kernel"]).T)
        sd[f"{src}.bias"] = np.asarray(node["bias"])

    def convw(src, node):
        sd[f"{src}.weight"] = np.ascontiguousarray(
            np.asarray(node["kernel"]).transpose(3, 2, 0, 1))
        sd[f"{src}.bias"] = np.asarray(node["bias"])

    def normw(src, node):
        sd[f"{src}.weight"] = np.asarray(node["scale"])
        sd[f"{src}.bias"] = np.asarray(node["bias"])

    def res(src, node):
        normw(f"{src}.norm1", node["norm1"])
        convw(f"{src}.conv1", node["conv1"])
        lin(f"{src}.time_emb_proj", node["time_emb_proj"])
        normw(f"{src}.norm2", node["norm2"])
        convw(f"{src}.conv2", node["conv2"])
        if "conv_shortcut" in node:
            convw(f"{src}.conv_shortcut", node["conv_shortcut"])

    def attn(src, node):
        normw(f"{src}.group_norm", node["group_norm"])
        for k in ("to_q", "to_k", "to_v", "add_k_proj", "add_v_proj"):
            lin(f"{src}.{k}", node[k])
        lin(f"{src}.to_out.0", node["to_out"])

    lin("time_embedding.linear_1", p["time_emb_1"])
    lin("time_embedding.linear_2", p["time_emb_2"])
    add = p["add_embedding"]
    normw("add_embedding.norm1", add["norm1"])
    normw("add_embedding.norm2", add["norm2"])
    sd["add_embedding.pool.positional_embedding"] = np.asarray(
        add["pool"]["positional_embedding"])
    for k in ("q_proj", "k_proj", "v_proj"):
        lin(f"add_embedding.pool.{k}", add["pool"][k])
    lin("add_embedding.proj", add["proj"])
    convw("conv_in", p["conv_in"])
    n, lpb = len(unet.channels), unet.layers_per_block
    for i in range(n):
        for j in range(lpb):
            res(f"down_blocks.{i}.resnets.{j}", p[f"down_{i}_res_{j}"])
            if i >= unet.attn_start:
                attn(f"down_blocks.{i}.attentions.{j}", p[f"down_{i}_attn_{j}"])
        if i < n - 1:
            res(f"down_blocks.{i}.downsamplers.0", p[f"down_{i}_downsample"])
    res("mid_block.resnets.0", p["mid_res_0"])
    attn("mid_block.attentions.0", p["mid_attn"])
    res("mid_block.resnets.1", p["mid_res_1"])
    for k in range(n):
        lvl = n - 1 - k
        for j in range(lpb + 1):
            res(f"up_blocks.{k}.resnets.{j}", p[f"up_{lvl}_res_{j}"])
            if lvl >= unet.attn_start:
                attn(f"up_blocks.{k}.attentions.{j}", p[f"up_{lvl}_attn_{j}"])
        if lvl > 0:
            res(f"up_blocks.{k}.upsamplers.0", p[f"up_{lvl}_upsample"])
    normw("conv_norm_out", p["conv_norm_out"])
    convw("conv_out", p["conv_out"])
    return sd


def test_if_converter_full_coverage_and_equivalence():
    """Converter maps every diffusers key, reproduces the exact param tree
    (structure + values), and the converted params run."""
    from divergen_tpu.utils.torch_weights import convert_if_unet

    unet = _tiny_unet()
    x = jnp.zeros((1, 16, 16, 3))
    t = jnp.zeros((1,), jnp.int32)
    ctx = _ctx(1)
    params = unet.init(jax.random.PRNGKey(3), x, t, ctx)
    sd = _fake_diffusers_sd(unet, params)
    conv = convert_if_unet(sd, unet)
    assert conv.pop("_stats")["unmapped"] == []

    flat_ref = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_new = dict(jax.tree_util.tree_flatten_with_path(conv)[0])
    assert len(flat_ref) == len(flat_new)
    for path, v in flat_ref:
        got = flat_new[path]
        assert got.shape == v.shape, path
        np.testing.assert_allclose(np.asarray(got), np.asarray(v), err_msg=str(path))

    out = unet.apply(conv, x, t, ctx)
    assert out.shape == (1, 16, 16, 6)


def test_if_release_configs_build():
    """The public sizings instantiate (eval_shape only — no init compile)."""
    for m, cin, lo, hi in ((IFUNet.if_i_xl(), 3, 3.5e9, 5.5e9),
                           (IFUNet.if_ii_l(), 6, 1.0e9, 1.6e9)):
        kw = {"noise_level_cond": jnp.zeros((1,), jnp.int32)} if m.noise_level_cond else {}
        shapes = jax.eval_shape(
            lambda mm=m, c=cin, k=kw: mm.init(
                jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, c)),
                jnp.zeros((1,), jnp.int32),
                jnp.zeros((1, 3, mm.encoder_dim)),
                **({"noise_level": jnp.zeros((1,), jnp.int32)}
                   if mm.noise_level_cond else {}),
            )
        )
        n_params = sum(int(np.prod(s.shape)) for s in jax.tree.leaves(shapes))
        assert lo < n_params < hi, f"{n_params} params — sizing off"


def test_txt2img_cli_if_stages(tmp_path):
    """--stages I II drives the IF cascade end to end (tiny): reference dir
    layout samples/I + samples/II, {cat}_{count:07d}.png naming, resume."""
    from divergen_tpu.pipeline.generation.txt2img import main

    pf = tmp_path / "77.txt"
    pf.write_text("a photo of a single widget\n")
    argv = ["--from_file", str(pf), "--outdir", str(tmp_path / "out"),
            "--n_samples", "2", "--max_batch_size", "2", "--tiny",
            "--steps", "2", "--stages", "I", "II"]
    assert main(argv) == 0
    i_dir = tmp_path / "out" / "samples" / "I"
    ii_dir = tmp_path / "out" / "samples" / "II"
    assert sorted(p.name for p in i_dir.iterdir()) == [
        "77_0000000.png", "77_0000001.png"]
    assert sorted(p.name for p in ii_dir.iterdir()) == [
        "77_0000000.png", "77_0000001.png"]
    import cv2

    im1 = cv2.imread(str(i_dir / "77_0000000.png"))
    im2 = cv2.imread(str(ii_dir / "77_0000000.png"))
    assert im1.shape[0] * 2 == im2.shape[0]  # tiny mode: 2x stage II
    # idempotent resume: --disable_overwrite skips existing files
    assert main(argv + ["--disable_overwrite"]) == 0


def test_txt2img_cli_rejects_stage_ii_without_i(tmp_path):
    """'--stages II' must error, not silently run the SDXL path and write
    1024² SDXL outputs into samples/II (the cascade is driven by stage I's
    latents; II-only resume is not a supported entry)."""
    import pytest

    from divergen_tpu.pipeline.generation.txt2img import main

    pf = tmp_path / "77.txt"
    pf.write_text("a photo of a single widget\n")
    with pytest.raises(SystemExit, match="must start with 'I'"):
        main(["--from_file", str(pf), "--outdir", str(tmp_path / "out"),
              "--n_samples", "2", "--tiny", "--steps", "2", "--stages", "II"])
