"""Euler / Euler-ancestral discrete schedulers (σ-space) as pure jnp.

SDXL-turbo samples with the Euler-ancestral scheduler at 4 steps, guidance 0
(the reference's ``Generator4Embeds``, ``Generation/custom_pipeline.py:
456-492``); the img2img low-level variant starts the σ ladder at an
intermediate strength (``custom_pipeline_low_level.py``). Implemented from
the k-diffusion/EDM formulation so the denoise loop is one ``lax.scan``.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


class EulerDiscreteSchedule:
    """σ-ladder over the DDPM beta schedule, 'trailing' timestep spacing
    (what turbo uses) and scaled-linear betas like Stable Diffusion."""

    def __init__(
        self,
        num_train_timesteps: int = 1000,
        beta_start: float = 0.00085,
        beta_end: float = 0.012,
        *,
        ancestral: bool = True,
    ):
        self.num_train_timesteps = num_train_timesteps
        self.ancestral = ancestral
        betas = (
            np.linspace(beta_start**0.5, beta_end**0.5, num_train_timesteps) ** 2
        )
        ac = np.cumprod(1.0 - betas)
        self.alphas_cumprod = jnp.asarray(ac, jnp.float32)
        self._sigmas_full = np.sqrt((1 - ac) / ac)

    def timesteps_and_sigmas(
        self, num_inference_steps: int, *, strength: float = 1.0
    ) -> tuple[jax.Array, jax.Array]:
        """Trailing spacing: t_i = T - 1 - i·(T/n). ``strength`` < 1 keeps only
        the final ``round(n·strength)`` steps (img2img init)."""
        step = self.num_train_timesteps / num_inference_steps
        ts = np.round(
            np.arange(self.num_train_timesteps, 0, -step)
        ).astype(np.int64) - 1
        ts = ts[:num_inference_steps]
        sigmas = self._sigmas_full[ts]
        if strength < 1.0:
            n_keep = max(int(round(num_inference_steps * strength)), 1)
            ts, sigmas = ts[-n_keep:], sigmas[-n_keep:]
        sigmas = np.concatenate([sigmas, [0.0]])
        return (
            jnp.asarray(ts.copy(), jnp.int32),
            jnp.asarray(sigmas, jnp.float32),
        )

    def init_noise_sigma(self, sigmas: jax.Array) -> jax.Array:
        return jnp.sqrt(sigmas[0] ** 2 + 1)

    @staticmethod
    def scale_model_input(x: jax.Array, sigma: jax.Array) -> jax.Array:
        return x / jnp.sqrt(sigma**2 + 1)

    def add_noise(self, x0: jax.Array, noise: jax.Array, sigma: jax.Array):
        """img2img init: x = x0 + σ·ε (σ-space forward process)."""
        return x0 + sigma * noise

    def step(
        self,
        eps: jax.Array,
        sigma: jax.Array,
        sigma_next: jax.Array,
        x: jax.Array,
        noise: jax.Array,
    ) -> jax.Array:
        """One Euler(-ancestral) step. ``eps`` is the ε-prediction on the
        *scaled* model input; ``noise`` ~ N(0,1) used only on ancestral steps."""
        x0 = x - sigma * eps
        if not self.ancestral:
            d = (x - x0) / sigma
            return x + d * (sigma_next - sigma)
        var_up = sigma_next**2 * (sigma**2 - sigma_next**2) / sigma**2
        sigma_up = jnp.sqrt(jnp.clip(var_up, 0.0, None))
        sigma_down = jnp.sqrt(jnp.clip(sigma_next**2 - sigma_up**2, 0.0, None))
        d = (x - x0) / sigma
        x = x + d * (sigma_down - sigma)
        return x + jnp.where(sigma_next > 0, sigma_up, 0.0) * noise
