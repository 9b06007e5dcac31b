"""DDPM schedule tables + steps as pure jnp — the scheduler the diffusion
prior trains and samples with.

The reference uses diffusers' ``DDPMScheduler()`` with stock settings
(``Generation/diffusion_prior.py:273-275``): 1000 linear betas 1e-4→0.02,
ε-prediction, ``fixed_small`` variance, **clip_sample=True** (predicted x₀
clamped to [-1, 1] — a default the reference inherits silently; configurable
here). Implemented from the DDPM equations (Ho et al. 2020) so the whole
sampler is a ``lax.scan`` over a precomputed table — no per-step host sync
(the reference calls ``.item()`` every denoise step,
``diffusion_prior.py:376``).

All tables are static (hashable dataclass) → jit-friendly.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp


class DDPMSchedule:
    """Linear-beta DDPM with ε-prediction and fixed-small variance."""

    def __init__(
        self,
        num_train_timesteps: int = 1000,
        beta_start: float = 1e-4,
        beta_end: float = 0.02,
        clip_sample: bool = True,
        clip_sample_range: float = 1.0,
    ):
        self.num_train_timesteps = num_train_timesteps
        self.clip_sample = clip_sample
        self.clip_sample_range = clip_sample_range
        betas = np.linspace(beta_start, beta_end, num_train_timesteps,
                            dtype=np.float64)
        alphas = 1.0 - betas
        self.betas = jnp.asarray(betas, jnp.float32)
        self.alphas = jnp.asarray(alphas, jnp.float32)
        self.alphas_cumprod = jnp.asarray(
            np.cumprod(alphas), jnp.float32
        )

    # — training —
    def add_noise(
        self, x0: jax.Array, noise: jax.Array, timesteps: jax.Array
    ) -> jax.Array:
        """q(x_t | x_0): √ᾱ_t x₀ + √(1−ᾱ_t) ε (broadcast over trailing dims)."""
        ac = self.alphas_cumprod[timesteps]
        shape = (-1,) + (1,) * (x0.ndim - 1)
        return (
            jnp.sqrt(ac).reshape(shape) * x0
            + jnp.sqrt(1.0 - ac).reshape(shape) * noise
        )

    # — sampling —
    def inference_timesteps(self, num_inference_steps: int) -> jax.Array:
        """Spaced timesteps, descending (diffusers ``set_timesteps`` layout):
        arange(0, T, T//n) reversed → [T-r, ..., r, 0]."""
        ratio = self.num_train_timesteps // num_inference_steps
        ts = (np.arange(0, num_inference_steps) * ratio).round()[::-1]
        return jnp.asarray(ts.copy(), jnp.int32)

    def step(
        self,
        eps: jax.Array,
        t: jax.Array,
        x_t: jax.Array,
        noise: jax.Array,
        *,
        num_inference_steps: int,
    ) -> jax.Array:
        """One ancestral step x_t → x_{t-Δ} given predicted ε.

        ``noise`` must be standard normal of x_t's shape; it is ignored at the
        final step (prev_t < 0).
        """
        ratio = self.num_train_timesteps // num_inference_steps
        prev_t = t - ratio
        ac_t = self.alphas_cumprod[t]
        ac_prev = jnp.where(prev_t >= 0, self.alphas_cumprod[prev_t.clip(0)], 1.0)
        beta_prod_t = 1.0 - ac_t
        current_alpha = ac_t / ac_prev
        current_beta = 1.0 - current_alpha

        x0 = (x_t - jnp.sqrt(beta_prod_t) * eps) / jnp.sqrt(ac_t)
        if self.clip_sample:
            x0 = jnp.clip(x0, -self.clip_sample_range, self.clip_sample_range)

        c0 = jnp.sqrt(ac_prev) * current_beta / beta_prod_t
        ct = jnp.sqrt(current_alpha) * (1.0 - ac_prev) / beta_prod_t
        mean = c0 * x0 + ct * x_t

        # fixed_small variance, no noise at the last step
        var = jnp.clip(
            (1.0 - ac_prev) / beta_prod_t * current_beta, 1e-20, None
        )
        add = jnp.where(t > 0, jnp.sqrt(var), 0.0)
        return mean + add * noise


def row_noise(row_keys: jax.Array, step: jax.Array | int,
              row_shape: tuple[int, ...]) -> jax.Array:
    """(B,) typed PRNG keys → (B, *row_shape) normal noise for one denoise
    step: row b's draw is ``normal(fold_in(row_keys[b], step))`` — a pure
    function of the ROW's key and the step index, independent of batch size
    or the row's position in it. The single source of the per-row derivation
    the serving coalescer's determinism contract rests on (used by both the
    prior sampler below and the SDXL loop in ``gen/sdxl.py``; keys built by
    ``serve._row_keys``)."""
    return jax.vmap(
        lambda k: jax.random.normal(
            jax.random.fold_in(k, step), row_shape, jnp.float32
        )
    )(row_keys)


def make_cfg_sampler(
    denoise_fn,
    schedule: DDPMSchedule,
    *,
    num_inference_steps: int = 50,
    guidance_scale: float = 5.0,
):
    """Build a jittable classifier-free-guidance sampler.

    ``denoise_fn(x, t, cond, cond_mask) -> eps`` with a per-sample
    conditional gate. The reference runs two forwards per denoise step
    (cond + uncond, ``diffusion_prior.py:364-376``); here both branches ride
    ONE forward with doubled batch and mask [1…1, 0…0] — better MXU
    utilization and half the dispatches — inside a single ``lax.scan`` over
    the spaced timesteps.
    """
    timesteps = schedule.inference_timesteps(num_inference_steps)

    @partial(jax.jit, static_argnames=("shape",))
    def sample(key: jax.Array, cond: jax.Array | None, shape: tuple[int, ...],
               init_noise: jax.Array | None = None,
               step_noises: jax.Array | None = None,
               row_keys: jax.Array | None = None):
        """``init_noise`` (shape) / ``step_noises`` (steps, *shape) override
        the PRNG draws — the shared-trajectory hook for sampling parity vs
        the reference's ``Pipe.generate``
        (``scripts/parity_prior_trajectory.py``).

        ``row_keys`` (B,) typed PRNG keys make every noise draw a pure
        function of the ROW's key (fold_in by step index), independent of
        batch size or the row's position in it — the serving layer's
        coalescer merges concurrent requests into one batch, and a request's
        result must not depend on what it was batched with
        (``server.py::_Coalescer``). When given, ``key`` is ignored."""
        if row_keys is not None:
            x = (row_noise(row_keys, 0, shape[1:]) if init_noise is None
                 else init_noise.astype(jnp.float32))
        else:
            key, init_key = jax.random.split(key)
            x = (jax.random.normal(init_key, shape, jnp.float32)
                 if init_noise is None else init_noise.astype(jnp.float32))
        n = shape[0]
        use_cfg = cond is not None and guidance_scale != 0
        if use_cfg:
            cond2 = jnp.concatenate([cond, cond], axis=0)
            mask2 = jnp.concatenate(
                [jnp.ones((n,), jnp.float32), jnp.zeros((n,), jnp.float32)]
            )

        def body(carry, step_in):
            t, step_i, injected = step_in
            x, key = carry
            key, nkey = jax.random.split(key)
            if use_cfg:
                tb = jnp.full((2 * n,), t, jnp.int32)
                eps2 = denoise_fn(
                    jnp.concatenate([x, x], axis=0), tb, cond2, mask2
                )
                eps_c, eps_u = eps2[:n], eps2[n:]
                eps = eps_u + guidance_scale * (eps_c - eps_u)
            else:
                tb = jnp.full((n,), t, jnp.int32)
                eps = denoise_fn(x, tb, cond, jnp.zeros((n,), jnp.float32))
            if injected is not None:
                noise = injected
            elif row_keys is not None:
                noise = row_noise(row_keys, step_i + 1, shape[1:])
            else:
                noise = jax.random.normal(nkey, shape, jnp.float32)
            x = schedule.step(
                eps, t, x, noise, num_inference_steps=num_inference_steps
            )
            return (x, key), None

        xs = (timesteps, jnp.arange(timesteps.shape[0], dtype=jnp.int32),
              None if step_noises is None else step_noises.astype(jnp.float32))
        (x, _), _ = jax.lax.scan(body, (x, key), xs)
        return x

    return sample
