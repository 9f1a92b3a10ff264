"""Diffusion noise schedulers (pure functions; scan-friendly).

Counterparts of the diffusers schedulers the reference pipelines construct
(``generation/txt2img_diffusers_stages_from_txt.py:136-198``): DDIM (the
IF/DDPM family) and EulerDiscrete (SDXL's default). All state is explicit
arrays so the denoising loop compiles to a single ``lax.scan``.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array


def betas_scaled_linear(n: int = 1000, start: float = 0.00085, end: float = 0.012) -> np.ndarray:
    """SD/SDXL 'scaled_linear' beta schedule."""
    return np.linspace(start**0.5, end**0.5, n, dtype=np.float64) ** 2


def betas_cosine(n: int = 1000, s: float = 0.008) -> np.ndarray:
    """squaredcos_cap_v2 (DeepFloyd-IF)."""
    t = np.arange(n + 1, dtype=np.float64) / n
    f = np.cos((t + s) / (1 + s) * np.pi / 2) ** 2
    betas = 1 - f[1:] / f[:-1]
    return np.clip(betas, 0, 0.999)


class SchedulerConfig(NamedTuple):
    alphas_cumprod: np.ndarray  # (N,)
    num_train_timesteps: int
    prediction_type: str = "epsilon"  # epsilon | v_prediction


def make_scheduler(kind: str = "scaled_linear", n: int = 1000,
                   prediction_type: str = "epsilon",
                   start: float = 0.00085, end: float = 0.012) -> SchedulerConfig:
    betas = betas_cosine(n) if kind == "cosine" else betas_scaled_linear(n, start, end)
    alphas_cumprod = np.cumprod(1.0 - betas)
    return SchedulerConfig(alphas_cumprod, n, prediction_type)


def add_noise(cfg: SchedulerConfig, sample: Array, noise: Array, t) -> Array:
    """DDPMScheduler.add_noise: sqrt(ᾱ_t)·x + sqrt(1-ᾱ_t)·ε."""
    ac = jnp.asarray(cfg.alphas_cumprod, jnp.float32)[jnp.asarray(t)]
    return jnp.sqrt(ac) * sample + jnp.sqrt(1.0 - ac) * noise


# ---------------- DDIM ----------------
def ddim_timesteps(cfg: SchedulerConfig, steps: int) -> np.ndarray:
    ratio = cfg.num_train_timesteps // steps
    return (np.arange(steps) * ratio).round()[::-1].astype(np.int64)


def ddim_step(cfg: SchedulerConfig, latents: Array, eps: Array, t: Array, t_prev: Array,
              eta: float = 0.0) -> Array:
    ac = jnp.asarray(cfg.alphas_cumprod, jnp.float32)
    a_t = ac[t]
    a_prev = jnp.where(t_prev >= 0, ac[jnp.maximum(t_prev, 0)], 1.0)
    if cfg.prediction_type == "v_prediction":
        x0 = jnp.sqrt(a_t) * latents - jnp.sqrt(1 - a_t) * eps
        eps = jnp.sqrt(a_t) * eps + jnp.sqrt(1 - a_t) * latents
    else:
        x0 = (latents - jnp.sqrt(1 - a_t) * eps) / jnp.sqrt(a_t)
    return jnp.sqrt(a_prev) * x0 + jnp.sqrt(1 - a_prev) * eps


# ---------------- Euler discrete (SDXL default) ----------------
def euler_sigmas(cfg: SchedulerConfig, steps: int) -> Tuple[np.ndarray, np.ndarray]:
    """(timesteps (S,), sigmas (S+1,)) with linspace timestep spacing."""
    ac = cfg.alphas_cumprod
    sigmas_full = np.sqrt((1 - ac) / ac)
    ts = np.linspace(0, cfg.num_train_timesteps - 1, steps, dtype=np.float64)[::-1].copy()
    sig = np.interp(ts, np.arange(len(sigmas_full)), sigmas_full)
    return ts, np.concatenate([sig, [0.0]]).astype(np.float32)


def euler_scale_input(latents: Array, sigma: Array) -> Array:
    return latents / jnp.sqrt(sigma**2 + 1.0)


def euler_step(latents: Array, eps: Array, sigma: Array, sigma_next: Array) -> Array:
    """Deterministic Euler: x ← x + (σ₊ − σ)·d, d = (x − σ·x₀̂)/σ = eps."""
    pred_x0 = latents - sigma * eps
    d = (latents - pred_x0) / jnp.maximum(sigma, 1e-9)
    return latents + (sigma_next - sigma) * d


def euler_init_noise_scale(sigmas: np.ndarray) -> float:
    return float(sigmas[0])


# ---------------- DPM-Solver++ 2M (multistep) ----------------
# Counterpart of diffusers DPMSolverMultistepScheduler(algorithm_type=
# "dpmsolver++", solver_order=2, final_sigmas_type="zero") — the standard
# quality-neutral 25–30-step SDXL setting (the reference loads schedulers
# via DiffusionPipeline, txt2img_diffusers_stages_from_txt.py:136-198).
#
# Implemented in the UNSCALED sigma parametrization (x = x0 + σ·ε) so the
# pipeline's euler_scale_input + pred_x0 stay shared with Euler. This is
# trajectory-identical to diffusers' VP-space update: with α=1/√(σ²+1),
# λ=−log σ, h=λ₊−λ, diffusers'
#   x_t ← (σvp₊/σvp)·x_t − α₊(e^{−h}−1)·(x0 + ½·D1)
# divided through by α₊ gives
#   x ← (σ₊/σ)·x + (1 − σ₊/σ)·(x0 + ½·D1),  D1 = (x0 − x0_prev)·h/h₀
# (tests/parity/test_dpmpp_parity.py pins this against a stateful VP-space
# replica of the diffusers scheduler).


def dpmpp_timesteps_sigmas(cfg: SchedulerConfig, steps: int,
                           karras: bool = False) -> Tuple[np.ndarray, np.ndarray]:
    """(timesteps (S,), sigmas (S+1,), last sigma 0) — diffusers 'linspace'
    spacing for the multistep solver: S+1 rounded points, last dropped."""
    ac = cfg.alphas_cumprod
    sigmas_full = np.sqrt((1 - ac) / ac)
    ts = (
        np.linspace(0, cfg.num_train_timesteps - 1, steps + 1)
        .round()[::-1][:-1]
        .copy()
        .astype(np.float64)
    )
    sig = np.interp(ts, np.arange(len(sigmas_full)), sigmas_full)
    if karras:
        # diffusers _convert_to_karras (rho=7) + _sigma_to_t log-interp
        rho = 7.0
        smin, smax = sig[-1], sig[0]
        ramp = np.linspace(0, 1, steps)
        sig = (smax ** (1 / rho) + ramp * (smin ** (1 / rho) - smax ** (1 / rho))) ** rho
        log_full = np.log(sigmas_full)
        ts = np.interp(np.log(sig), log_full, np.arange(len(sigmas_full)))
    return ts, np.concatenate([sig, [0.0]]).astype(np.float32)


def dpmpp_init_noise_scale(sigmas: np.ndarray) -> float:
    """diffusers DPMSolver init_noise_sigma is 1.0 in VP space; unscaled
    space multiplies by 1/α₀ = √(σ₀²+1)."""
    return float(np.sqrt(float(sigmas[0]) ** 2 + 1.0))


def dpmpp_2m_step(latents: Array, pred_x0: Array, pred_x0_prev: Array,
                  i: Array, sigmas: Array, num_steps: int) -> Array:
    """One DPM-Solver++ 2M update in unscaled space (scan-friendly: `i` may
    be traced). First-order at i==0 (no history) and at the final step
    (σ₊=0 ⇒ diffusers' final_sigmas_type="zero" branch); midpoint
    second-order elsewhere."""
    sig = sigmas[i]
    sig_next = sigmas[i + 1]
    sig_prev = sigmas[jnp.maximum(i - 1, 0)]
    r = sig_next / jnp.maximum(sig, 1e-20)
    use_first = jnp.logical_or(i == 0, i == num_steps - 1)
    # h = λ₊−λ = log(σ/σ₊); h₀ = λ−λ₋ = log(σ₋/σ); r0 = h₀/h
    h = jnp.log(sig) - jnp.log(jnp.maximum(sig_next, 1e-20))
    h0 = jnp.log(sig_prev) - jnp.log(sig)
    r0 = h0 / h
    d1 = (pred_x0 - pred_x0_prev) / jnp.where(use_first, 1.0, r0)
    x0_eff = jnp.where(use_first, pred_x0, pred_x0 + 0.5 * d1)
    return r * latents + (1.0 - r) * x0_eff


# ---------------- DDPM, learned-range variance (DeepFloyd-IF stages) -------
# Counterpart of the diffusers DDPMScheduler the IF pipelines construct
# (variance_type="learned_range", thresholding=True, squaredcos_cap_v2
# betas — reference loads them via DiffusionPipeline.from_pretrained,
# generation/txt2img_diffusers_stages_from_txt.py:136-198). The UNet emits
# 2·C channels: ε and a per-pixel variance interpolant v ∈ [−1, 1] between
# the posterior (min) and β_t (max) log-variances.


def ddpm_timesteps(cfg: SchedulerConfig, steps: int) -> np.ndarray:
    """DDPMScheduler.set_timesteps 'leading' spacing."""
    ratio = cfg.num_train_timesteps // steps
    return (np.arange(steps) * ratio).round()[::-1].astype(np.int64)


def dynamic_threshold(x0: Array, ratio: float = 0.95,
                      max_value: float = 1.5) -> Array:
    """diffusers _threshold_sample: per-sample abs-quantile s (clamped to
    [1, max_value]), clip to ±s and rescale into [−1, 1]."""
    b = x0.shape[0]
    flat = jnp.abs(x0.reshape(b, -1)).astype(jnp.float32)
    s = jnp.quantile(flat, ratio, axis=1)
    s = jnp.clip(s, 1.0, max_value).reshape((b,) + (1,) * (x0.ndim - 1))
    return jnp.clip(x0, -s, s) / s


def ddpm_learned_range_step(
    cfg: SchedulerConfig,
    latents: Array,
    eps: Array,
    var_pred: Array,  # same shape as latents, the learned interpolant
    t: Array,
    prev_t: Array,
    noise: Array,
    thresholding: bool = True,
    threshold_ratio: float = 0.95,
    threshold_max: float = 1.5,
) -> Array:
    """One ancestral DDPM step with the learned-range variance
    (DDPMScheduler.step semantics). ``prev_t < 0`` means the final step
    (ᾱ_prev = 1, no noise)."""
    ac = jnp.asarray(cfg.alphas_cumprod, jnp.float32)
    abar_t = ac[t]
    abar_prev = jnp.where(prev_t >= 0, ac[jnp.maximum(prev_t, 0)], 1.0)
    current_alpha = abar_t / abar_prev
    current_beta = 1.0 - current_alpha

    x0 = (latents - jnp.sqrt(1.0 - abar_t) * eps) / jnp.sqrt(abar_t)
    if thresholding:
        x0 = dynamic_threshold(x0, threshold_ratio, threshold_max)

    coef_x0 = jnp.sqrt(abar_prev) * current_beta / (1.0 - abar_t)
    coef_xt = jnp.sqrt(current_alpha) * (1.0 - abar_prev) / (1.0 - abar_t)
    mean = coef_x0 * x0 + coef_xt * latents

    posterior_var = (1.0 - abar_prev) / (1.0 - abar_t) * current_beta
    min_log = jnp.log(jnp.clip(posterior_var, 1e-20))
    max_log = jnp.log(jnp.clip(current_beta, 1e-20))
    frac = (var_pred.astype(jnp.float32) + 1.0) / 2.0
    log_var = frac * max_log + (1.0 - frac) * min_log

    stochastic = mean + jnp.exp(0.5 * log_var) * noise
    return jnp.where(t > 0, stochastic, mean).astype(latents.dtype)
