"""DPM-Solver++ 2M parity vs a stateful VP-space replica of diffusers'
DPMSolverMultistepScheduler.

The shipped sampler (`scheduler.dpmpp_2m_step`) runs in the UNSCALED sigma
parametrization so it shares the pipeline's input scaling and x0 prediction
with Euler; diffusers' scheduler runs in VP space (x_t = α·x + ...,
init_noise_sigma = 1.0, scale_model_input = identity). The replica below
mirrors the diffusers implementation structurally — step_index,
model_outputs history, lower_order_nums, linspace timestep spacing,
final_sigmas_type="zero" — with algorithm_type="dpmsolver++",
solver_order=2, prediction_type="epsilon" (the settings the reference's
DiffusionPipeline-loaded schedulers use,
DiverGen/generation/txt2img_diffusers_stages_from_txt.py:136-198).
"""
import sys

import numpy as np
import pytest

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from divergen_tpu.pipeline.generation.scheduler import (
    dpmpp_2m_step,
    dpmpp_init_noise_scale,
    dpmpp_timesteps_sigmas,
    make_scheduler,
)


class DiffusersDPMReplica:
    """VP-space replica of diffusers DPMSolverMultistepScheduler
    (dpmsolver++, order 2, epsilon, linspace, final_sigmas_type=zero)."""

    def __init__(self, cfg, steps):
        ac = cfg.alphas_cumprod
        sigmas_full = np.sqrt((1 - ac) / ac)
        ts = (
            np.linspace(0, cfg.num_train_timesteps - 1, steps + 1)
            .round()[::-1][:-1]
            .astype(np.int64)
        )
        sig = np.interp(ts, np.arange(len(sigmas_full)), sigmas_full)
        self.sigmas = np.concatenate([sig, [0.0]])
        self.timesteps = ts
        self.model_outputs = [None, None]
        self.lower_order_nums = 0
        self.step_index = 0
        self.init_noise_sigma = 1.0

    @staticmethod
    def _alpha_sigma(s):
        alpha = 1.0 / np.sqrt(s**2 + 1.0)
        return alpha, s * alpha

    def _lambda(self, s):
        a, sv = self._alpha_sigma(s)
        return np.log(a) - np.log(max(sv, 1e-30))

    def convert_model_output(self, eps, sample):
        a, sv = self._alpha_sigma(self.sigmas[self.step_index])
        return (sample - sv * eps) / a

    def first_order_update(self, m0, sample):
        st, ss = self.sigmas[self.step_index + 1], self.sigmas[self.step_index]
        at, svt = self._alpha_sigma(st)
        _, svs = self._alpha_sigma(ss)
        h = self._lambda(st) - self._lambda(ss)
        return (svt / svs) * sample - at * (np.exp(-h) - 1.0) * m0

    def second_order_update(self, sample):
        st = self.sigmas[self.step_index + 1]
        s0 = self.sigmas[self.step_index]
        s1 = self.sigmas[self.step_index - 1]
        at, svt = self._alpha_sigma(st)
        _, sv0 = self._alpha_sigma(s0)
        lt, l0, l1 = self._lambda(st), self._lambda(s0), self._lambda(s1)
        m0, m1 = self.model_outputs[-1], self.model_outputs[-2]
        h, h0 = lt - l0, l0 - l1
        r0 = h0 / h
        d0, d1 = m0, (m0 - m1) / r0
        return (
            (svt / sv0) * sample
            - at * (np.exp(-h) - 1.0) * d0
            - 0.5 * at * (np.exp(-h) - 1.0) * d1
        )

    def step(self, eps, sample):
        x0 = self.convert_model_output(eps, sample)
        self.model_outputs[0] = self.model_outputs[1]
        self.model_outputs[1] = x0
        # final_sigmas_type="zero" forces first-order at the last step
        lower_order_final = self.step_index == len(self.timesteps) - 1
        if self.lower_order_nums < 1 or lower_order_final:
            prev = self.first_order_update(x0, sample)
        else:
            prev = self.second_order_update(sample)
        if self.lower_order_nums < 2:
            self.lower_order_nums += 1
        self.step_index += 1
        return prev


def _fake_eps(w):
    """Deterministic fake denoiser eps(x_t, i): bounded, smooth, i-dependent
    — exercises the multistep history without a real UNet."""

    def f(x_t, i):
        return np.tanh(x_t * w + 0.1 * np.sin(i + 1.0))

    return f


@pytest.mark.parametrize("steps", [2, 3, 8, 25])
def test_dpmpp_2m_matches_diffusers_replica(steps):
    cfg = make_scheduler("scaled_linear")
    ts, sigmas = dpmpp_timesteps_sigmas(cfg, steps)
    rep = DiffusersDPMReplica(cfg, steps)
    np.testing.assert_allclose(sigmas[:-1], rep.sigmas[:-1], rtol=1e-6)
    np.testing.assert_allclose(ts, rep.timesteps.astype(np.float64))

    rng = np.random.RandomState(0)
    shape = (2, 4, 4, 3)
    noise = rng.randn(*shape).astype(np.float64)
    model = _fake_eps(rng.rand(*shape) * 0.5 + 0.2)

    # --- replica: VP-space trajectory
    samp = noise * rep.init_noise_sigma
    for i in range(steps):
        samp = rep.step(model(samp, i), samp)

    # --- ours: unscaled-space scan (f64 to isolate algorithm parity)
    sig_j = jnp.asarray(sigmas, jnp.float64)
    with jax.enable_x64(True):
        lat = jnp.asarray(noise) * dpmpp_init_noise_scale(sigmas)
        x0_prev = jnp.zeros_like(lat)
        for i in range(steps):
            x_t = lat / jnp.sqrt(sig_j[i] ** 2 + 1.0)  # == VP sample
            eps = jnp.asarray(model(np.asarray(x_t), i))
            x0 = lat - sig_j[i] * eps
            lat = dpmpp_2m_step(lat, x0, x0_prev, jnp.asarray(i), sig_j, steps)
            x0_prev = x0
    # after the final step sigma=0 ⇒ unscaled == VP sample. Tolerance floor
    # is the f32 quantization of the shipped sigma table (replica keeps
    # f64): observed max 2.8e-6 rel / 3.5e-8 abs at steps=8.
    np.testing.assert_allclose(np.asarray(lat), samp, rtol=1e-5, atol=1e-7)


def test_dpmpp_2m_step_traces_in_scan():
    """the step must compile inside lax.scan with a traced index (no NaNs
    from the guarded first/last-step branches)."""
    cfg = make_scheduler("scaled_linear")
    steps = 6
    _, sigmas = dpmpp_timesteps_sigmas(cfg, steps)
    sig_j = jnp.asarray(sigmas)
    lat0 = jnp.ones((1, 4, 4, 2), jnp.float32) * dpmpp_init_noise_scale(sigmas)

    @jax.jit
    def run(lat):
        def body(carry, i):
            lat, x0_prev = carry
            eps = jnp.tanh(lat / jnp.sqrt(sig_j[i] ** 2 + 1.0))
            x0 = lat - sig_j[i] * eps
            return (dpmpp_2m_step(lat, x0, x0_prev, i, sig_j, steps), x0), None

        (lat, _), _ = jax.lax.scan(body, (lat, jnp.zeros_like(lat)), jnp.arange(steps))
        return lat

    out = np.asarray(run(lat0))
    assert np.isfinite(out).all()


def test_pipeline_dpmpp_sampler_runs():
    from divergen_tpu.pipeline.generation.pipeline import SDXLPipeline
    from divergen_tpu.pipeline.generation.unet import UNetSDXL

    unet = UNetSDXL.tiny(dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    lat = jnp.zeros((1, 8, 8, 4))
    ctx = jnp.zeros((1, 7, 64))
    up = unet.init(rng, lat, jnp.zeros((1,)), ctx)
    pipe = SDXLPipeline(unet, up, None, None, steps=5, sampler="dpmpp_2m")
    out = pipe.generate(rng, ctx, ctx, height=64, width=64, decode=False)
    assert out.shape == (1, 8, 8, 4)
    assert np.isfinite(np.asarray(out)).all()
