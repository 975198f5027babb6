"""Gaussian diffusion decoder with few-step adversarial sampling.

Behavior parity with `model/diffusion.py:38-235` in the reference
(DDPM q_sample / posterior, x0-prediction with clamping, the t=-1 ==
ground-truth convention of `diffuse_fn`, shallow-mode posterior around the
coarse mel, and denormalized [spec_min, spec_max] <-> [-1, 1] mel scaling) —
but purely functional: the reference's stateful `self.cond` stash
(`diffusion.py:192-193`) and in-place `t` mutation (`:180-181`) are replaced
by explicit arguments, and the T<=4 sampling loop is unrolled at trace time.

Mel layout is [B, T, n_mels] (channel-last) everywhere; the reference's
[B, 1, M, T] NCHW detour is dropped.
"""

import functools
from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.schedules import get_noise_schedule_list


@dataclass(frozen=True)
class DiffusionSchedule:
    """Precomputed DDPM coefficient tables; hashable (tuples) so it can be a
    static attribute of flax modules / jit closures."""

    betas: Tuple[float, ...]
    spec_min: Tuple[float, ...]
    spec_max: Tuple[float, ...]

    @classmethod
    def create(cls, schedule_mode, timesteps, min_beta, max_beta, s,
               spec_min, spec_max):
        betas = get_noise_schedule_list(
            schedule_mode, timesteps, min_beta, max_beta, s)
        return cls(betas=tuple(float(b) for b in betas),
                   spec_min=tuple(float(x) for x in spec_min),
                   spec_max=tuple(float(x) for x in spec_max))

    @property
    def num_timesteps(self):
        return len(self.betas)

    # memoized: the schedule is a frozen (hashable) dataclass and table()
    # is called per _extract per traced step — recomputing the five derived
    # coefficient tables each time is trace-time waste
    @functools.lru_cache(maxsize=None)
    def _tables(self):
        betas = np.asarray(self.betas, dtype=np.float64)
        alphas_cumprod = np.cumprod(1.0 - betas)
        alphas_cumprod_prev = np.append(1.0, alphas_cumprod[:-1])
        posterior_variance = (
            betas * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod))
        return dict(
            sqrt_alphas_cumprod=np.sqrt(alphas_cumprod),
            sqrt_one_minus_alphas_cumprod=np.sqrt(1.0 - alphas_cumprod),
            posterior_log_variance_clipped=np.log(
                np.maximum(posterior_variance, 1e-20)),
            posterior_mean_coef1=(
                betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)),
            posterior_mean_coef2=(
                (1.0 - alphas_cumprod_prev) * np.sqrt(1.0 - betas)
                / (1.0 - alphas_cumprod)),
        )

    def table(self, name):
        return jnp.asarray(self._tables()[name], dtype=jnp.float32)

    # --- mel normalization ([spec_min, spec_max] -> [-1, 1]) ---------------

    def norm_spec(self, x):
        lo = jnp.asarray(self.spec_min, dtype=x.dtype)
        hi = jnp.asarray(self.spec_max, dtype=x.dtype)
        return (x - lo) / (hi - lo) * 2.0 - 1.0

    def denorm_spec(self, x):
        lo = jnp.asarray(self.spec_min, dtype=x.dtype)
        hi = jnp.asarray(self.spec_max, dtype=x.dtype)
        return (x + 1.0) / 2.0 * (hi - lo) + lo

    # --- forward process ----------------------------------------------------

    def _extract(self, name, t):
        # t: [B] -> [B, 1, 1] coefficient
        return self.table(name)[t][:, None, None]

    def q_sample(self, x0, t, noise):
        """Sample q(x_t | x_0) in normalized space."""
        return (self._extract("sqrt_alphas_cumprod", t) * x0
                + self._extract("sqrt_one_minus_alphas_cumprod", t) * noise)

    def diffuse(self, mel, t, noise):
        """Normalize a raw mel and diffuse to step t; t == -1 returns the
        normalized ground truth (the reference's `diffuse_fn` convention)."""
        x0 = self.norm_spec(mel)
        out = self.q_sample(x0, jnp.maximum(t, 0), noise)
        return jnp.where((t < 0)[:, None, None], x0, out)

    def q_posterior_sample(self, x0, x_t, t, noise):
        """Sample q(x_{t-1} | x_t, x_0); no noise at t == 0."""
        mean = (self._extract("posterior_mean_coef1", t) * x0
                + self._extract("posterior_mean_coef2", t) * x_t)
        log_var = self._extract("posterior_log_variance_clipped", t)
        nonzero = (t > 0).astype(x_t.dtype)[:, None, None]
        return mean + nonzero * jnp.exp(0.5 * log_var) * noise

    # --- inference ----------------------------------------------------------

    def sampling(self, denoise_fn, rng, cond, spk_emb, noise=None,
                 clip_denoised=True, return_trace=False, step_noises=None):
        """Reverse process from pure noise (or a provided start) to x0.

        denoise_fn(x_t, t, cond, spk_emb) -> x0 prediction (normalized).
        The loop over T <= 4 steps is a static Python loop, fully unrolled
        and fused by XLA (`model/diffusion.py:155-165`).
        `step_noises` optionally injects the per-step posterior noises
        ([T, B, T_mel, n_mels], consumed t = T-1 .. 0) for deterministic /
        parity-testable sampling.
        Returns the final normalized x0 ([B, T, n_mels]); with
        return_trace=True, the whole trajectory [T+1, B, T_mel, n_mels].
        """
        B, T_mel, _ = cond.shape
        n_mels = len(self.spec_min)
        if noise is None:
            rng, sub = jax.random.split(rng)
            x = jax.random.normal(sub, (B, T_mel, n_mels), dtype=cond.dtype)
        else:
            x = noise
        trace = [x]
        for k, i in enumerate(reversed(range(self.num_timesteps))):
            t = jnp.full((B,), i, dtype=jnp.int32)
            x0_pred = denoise_fn(x, t, cond, spk_emb)
            if clip_denoised:
                x0_pred = jnp.clip(x0_pred, -1.0, 1.0)
            if step_noises is None:
                rng, sub = jax.random.split(rng)
                step_noise = jax.random.normal(sub, x.shape, dtype=x.dtype)
            else:
                step_noise = jnp.asarray(step_noises[k], dtype=x.dtype)
            x = self.q_posterior_sample(x0_pred, x, t, step_noise)
            trace.append(x)
        if return_trace:
            return jnp.stack(trace, axis=0)
        return x

    # --- aux-mode supervision ----------------------------------------------

    def diffuse_trace(self, rng, mel, mel_mask):
        """[T+1, B, T_mel, n_mels]: the clamped normalized mel followed by
        its diffusion at t = 0..T-1, all masked
        (`model/diffusion.py:167-175`)."""
        maskf = mel_mask[..., None].astype(mel.dtype)
        trace = [jnp.clip(self.norm_spec(mel), -1.0, 1.0) * maskf]
        B = mel.shape[0]
        for i in range(self.num_timesteps):
            rng, sub = jax.random.split(rng)
            noise = jax.random.normal(sub, mel.shape, dtype=mel.dtype)
            t = jnp.full((B,), i, dtype=jnp.int32)
            trace.append(self.diffuse(mel, t, noise) * maskf)
        return jnp.stack(trace, axis=0)
