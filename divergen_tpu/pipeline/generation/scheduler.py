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
