"""Diffusion-prior trainer + sampling pipe.

Rebuilds ``Pipe`` (``Generation/diffusion_prior.py:268-378``):

- train: ε-prediction MSE on DDPM-noised CLIP image embeddings conditioned on
  EEG features; Adam 1e-3, linear-warmup(500)-cosine schedule over the full
  run, global grad-norm clip 1.0, 10% per-batch cond dropout (``:282-338``).
- generate: 50-step CFG sampling, guidance 5.0 (``:340-378``) — here a single
  ``lax.scan`` with batched cond/uncond (see ``ops/ddpm.py``).

The training pairs (EEG feature, CLIP image embedding ×4 reps) mirror
``EmbeddingDataset`` + the ×4 expansion (``:206-237``;
``Generation_metrics_sub8.ipynb`` cell 5). Whole-dataset-in-HBM scan epochs,
like the contrastive trainer.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp
import optax
from flax import struct

from eeg_image_decode_tpu.core.config import PriorConfig
from eeg_image_decode_tpu.models.diffusion_prior import DiffusionPriorUNet
from eeg_image_decode_tpu.ops.ddpm import DDPMSchedule, make_cfg_sampler


class PriorState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any


def _make_prior_optimizer(cfg: PriorConfig, total_steps: int):
    """Adam + warmup(500)-cosine + global-norm clip 1.0 — the reference
    ``Pipe.train`` optimizer (``Generation/diffusion_prior.py:285-293``).

    The reference calls ``lr_scheduler.step()`` BEFORE ``optimizer.step()``
    (``:328-330``), so its k-th update (0-indexed) runs at λ(k+1) — in
    particular the FIRST step already moves at lr·1/warmup instead of 0.
    The schedule is evaluated at ``count + 1`` to reproduce that order
    exactly (pinned by the prior trajectory-parity rehearsal,
    ``scripts/parity_prior_trajectory.py``).
    """
    schedule = optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=cfg.lr,
        warmup_steps=cfg.warmup_steps,
        decay_steps=max(total_steps, cfg.warmup_steps + 1),
        end_value=0.0,
    )
    return optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip_norm),
        optax.adam(lambda count: schedule(count + 1)),
    )


class PriorPipe:
    """Train + sample wrapper around DiffusionPriorUNet (the reference's
    ``Pipe``)."""

    def __init__(
        self,
        cfg: PriorConfig = PriorConfig(),
        *,
        model: DiffusionPriorUNet | None = None,
        total_steps: int | None = None,
        mesh=None,
    ):
        """``mesh``: optional ``jax.sharding.Mesh`` with a ``dp`` axis —
        training data-parallelizes by sharding each step's batch indices
        (replicated state/data, GSPMD inserts the grad all-reduce), the same
        scheme as the contrastive trainer."""
        self.mesh = mesh
        self.cfg = cfg
        self.model = model or DiffusionPriorUNet(
            embed_dim=cfg.embed_dim,
            cond_dim=cfg.cond_dim,
            hidden_dims=tuple(cfg.hidden_dims),
            time_embed_dim=cfg.time_embed_dim,
            dropout=cfg.dropout,
        )
        self.schedule = DDPMSchedule(num_train_timesteps=cfg.num_train_timesteps)
        self.state: PriorState | None = None
        self._total_steps = total_steps
        self._samplers: dict = {}  # (steps, scale, params-id) → jitted sampler

    # — initialization —
    def init(self, total_steps: int, seed: int | None = None) -> PriorState:
        cfg = self.cfg
        x = jnp.zeros((2, cfg.embed_dim))
        t = jnp.zeros((2,), jnp.int32)
        c = jnp.zeros((2, cfg.cond_dim))
        m = jnp.ones((2,), jnp.float32)
        variables = self.model.init(
            jax.random.key(cfg.seed if seed is None else seed), x, t, c, m
        )
        self.tx = _make_prior_optimizer(cfg, total_steps)
        self.state = PriorState(
            step=jnp.zeros((), jnp.int32),
            params=variables["params"],
            opt_state=self.tx.init(variables["params"]),
        )
        self._schedule_total_steps = total_steps
        self._loaded_params = False  # explicit init: caller owns the schedule
        self._epoch_fn = self._make_epoch_fn()
        # the injected-epoch jit closes over self.tx — a fresh optimizer
        # (new schedule horizon) must invalidate it or later injected epochs
        # would silently step with the stale schedule
        self._injected_epoch_fn = None
        return self.state

    def _rebuild_optimizer(self, total_steps: int) -> None:
        """Rebuild the warmup-cosine schedule for a NEW run length, keeping
        the current params. Used when training starts from params that were
        ``load``ed (init'd with total_steps=1): without this, fine-tuning a
        loaded prior would run the LR schedule of a 1-step job — warm up,
        then decay to zero almost immediately."""
        cfg = self.cfg
        self.tx = _make_prior_optimizer(cfg, total_steps)
        self.state = self.state.replace(
            step=jnp.zeros((), jnp.int32),
            opt_state=self.tx.init(self.state.params),
        )
        self._schedule_total_steps = total_steps
        self._loaded_params = False
        self._epoch_fn = self._make_epoch_fn()
        self._injected_epoch_fn = None  # closes over self.tx (see init)

    def _make_epoch_fn(self):
        cfg, model, schedule, tx = self.cfg, self.model, self.schedule, self.tx

        def loss_fn(params, h_emb, c_emb, t, noise, cond_mask, dropout_key):
            noisy = schedule.add_noise(h_emb, noise, t)
            eps = model.apply(
                {"params": params},
                noisy,
                t,
                c_emb,
                cond_mask,
                deterministic=False,
                rngs={"dropout": dropout_key},
            )
            return jnp.mean((eps.astype(jnp.float32) - noise) ** 2)

        def train_step(state: PriorState, idx, c_all, h_all, base_key):
            h = jnp.take(h_all, idx, axis=0)
            c = jnp.take(c_all, idx, axis=0)
            key = jax.random.fold_in(base_key, state.step)
            k_drop, k_noise, k_t, k_dropout = jax.random.split(key, 4)
            # whole-batch cond dropout with p=0.1 (ref :303-305)
            keep = (jax.random.uniform(k_drop) >= cfg.cond_dropout_prob).astype(
                jnp.float32
            )
            cond_mask = jnp.full((h.shape[0],), keep)
            noise = jax.random.normal(k_noise, h.shape, jnp.float32)
            t = jax.random.randint(
                k_t, (h.shape[0],), 0, cfg.num_train_timesteps
            )
            loss, grads = jax.value_and_grad(loss_fn)(
                state.params, h, c, t, noise, cond_mask, k_dropout
            )
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            return (
                state.replace(
                    step=state.step + 1, params=new_params, opt_state=new_opt
                ),
                {"loss": loss},
            )

        def epoch_fn(state, c_all, h_all, perm, key):
            step = partial(train_step, c_all=c_all, h_all=h_all, base_key=key)
            state, metrics = jax.lax.scan(step, state, perm)
            return state, jax.tree_util.tree_map(jnp.mean, metrics)

        if self.mesh is None:
            return jax.jit(epoch_fn, donate_argnums=(0,))
        from eeg_image_decode_tpu.core.mesh import dp_epoch_jit

        return dp_epoch_jit(epoch_fn, self.mesh, n_args=5, perm_index=3)

    def train_epoch_injected(
        self,
        c_all: jax.Array,
        h_all: jax.Array,
        perm: jax.Array,  # (n_steps, B) int32
        noise: jax.Array,  # (n_steps, B, embed_dim)
        timesteps: jax.Array,  # (n_steps, B) int32
        keep: jax.Array,  # (n_steps,) float — per-BATCH cond keep flags
    ):
        """One epoch with every stochastic input drawn EXTERNALLY — the
        trajectory-parity hook: feed the exact noise / timesteps / per-batch
        cond-dropout decisions the reference's ``Pipe.train`` drew
        (``Generation/diffusion_prior.py:303-313``; per-batch
        ``torch.rand(1) < 0.1``, ``randn_like``, ``randint``) and the two
        trainers must walk the same loss curve
        (``scripts/parity_prior_trajectory.py``). Deterministic forward
        (MLP dropout is 0.0 in the reference config). Returns
        ``(per-step losses,)`` alongside the updated state, which is stored
        on the pipe."""
        assert self.state is not None, "init() the pipe first"
        if getattr(self, "_injected_epoch_fn", None) is None:
            cfg, model, schedule, tx = (
                self.cfg, self.model, self.schedule, self.tx,
            )

            def loss_fn(params, h, c, t, eps_target, cond_mask):
                noisy = schedule.add_noise(h, eps_target, t)
                eps = model.apply(
                    {"params": params}, noisy, t, c, cond_mask,
                    deterministic=True,
                )
                return jnp.mean((eps.astype(jnp.float32) - eps_target) ** 2)

            def train_step(state, batch, c_all, h_all):
                idx, eps_target, t, keep_s = batch
                h = jnp.take(h_all, idx, axis=0)
                c = jnp.take(c_all, idx, axis=0)
                cond_mask = jnp.full((h.shape[0],), keep_s, jnp.float32)
                loss, grads = jax.value_and_grad(loss_fn)(
                    state.params, h, c, t, eps_target, cond_mask
                )
                updates, new_opt = tx.update(
                    grads, state.opt_state, state.params
                )
                new_params = optax.apply_updates(state.params, updates)
                return (
                    state.replace(step=state.step + 1, params=new_params,
                                  opt_state=new_opt),
                    loss,
                )

            def epoch_fn(state, c_all, h_all, perm, noise, t, keep):
                step = partial(train_step, c_all=c_all, h_all=h_all)
                return jax.lax.scan(step, state, (perm, noise, t, keep))

            self._injected_epoch_fn = jax.jit(epoch_fn, donate_argnums=(0,))
        self.state, losses = self._injected_epoch_fn(
            self.state, jnp.asarray(c_all, jnp.float32),
            jnp.asarray(h_all, jnp.float32), jnp.asarray(perm, jnp.int32),
            jnp.asarray(noise, jnp.float32),
            jnp.asarray(timesteps, jnp.int32),
            jnp.asarray(keep, jnp.float32),
        )
        return np.asarray(losses)

    # — training —
    def train(
        self,
        c_embeddings: np.ndarray,
        h_embeddings: np.ndarray,
        *,
        epochs: int | None = None,
        batch_size: int | None = None,
        log_fn=print,
        checkpointer=None,
        ckpt_every_epochs: int = 10,
        resume: bool = False,
    ) -> list[dict]:
        """``checkpointer`` (``core.checkpoint.Checkpointer``) saves the full
        PriorState (params + Adam state + step) every ``ckpt_every_epochs``
        plus a durable final save; ``resume=True`` restores the latest step
        and continues — per-epoch permutations/keys derive from (seed,
        epoch), so the resumed run reproduces the uninterrupted trajectory
        exactly. The reference's 150-epoch prior job loses everything on a
        kill (it only pickles the final state_dict)."""
        cfg = self.cfg
        epochs = epochs or cfg.epochs
        batch_size = batch_size or cfg.batch_size
        n = c_embeddings.shape[0]
        batch_size = min(batch_size, n)
        from eeg_image_decode_tpu.core.mesh import validate_dp_batch

        # after the min() clamp — a small dataset can silently shrink a
        # previously valid batch below dp divisibility
        validate_dp_batch(self.mesh, batch_size)
        n_steps = max(n // batch_size, 1)
        if self.state is None:
            self.init(total_steps=n_steps * epochs)
        elif (
            getattr(self, "_loaded_params", False)
            and int(self.state.step) == 0
            and self._schedule_total_steps != n_steps * epochs
        ):
            # params came from load()/from_checkpoint() (schedule built with
            # total_steps=1, no steps taken yet): rebuild the optimizer for
            # THIS run so fine-tuning gets the real warmup-cosine instead of
            # one that decays to ~zero LR after warmup_steps+1 steps. An
            # explicitly init()'d pipe is untouched — the kill-and-resume
            # pattern launches with the FULL job's total_steps then trains
            # fewer epochs, and must keep that schedule.
            self._rebuild_optimizer(n_steps * epochs)

        start_epoch = 0
        history: list[dict] = []
        if resume:
            from eeg_image_decode_tpu.core.checkpoint import load_history

            if checkpointer is None:
                raise ValueError("resume=True needs a checkpointer")
            step = checkpointer.latest_step()
            if step is None:
                raise FileNotFoundError(
                    f"no checkpoints under {checkpointer.directory}"
                )
            self.state = checkpointer.restore(step, self.state)
            start_epoch = int(step)  # save key = completed epoch count
            history = load_history(checkpointer, start_epoch)

        c_all = jax.device_put(jnp.asarray(c_embeddings, jnp.float32))
        h_all = jax.device_put(jnp.asarray(h_embeddings, jnp.float32))
        for epoch in range(start_epoch, epochs):
            rng = np.random.default_rng(cfg.seed * 9176 + epoch)
            perm = jnp.asarray(
                rng.permutation(n)[: n_steps * batch_size]
                .reshape(n_steps, batch_size)
                .astype(np.int32)
            )
            t0 = time.perf_counter()
            self.state, metrics = self._epoch_fn(
                self.state, c_all, h_all, perm, jax.random.key(cfg.seed + epoch)
            )
            loss = float(metrics["loss"])
            if not np.isfinite(loss):
                raise FloatingPointError(
                    f"non-finite prior loss {loss} at epoch {epoch}"
                )
            dt = time.perf_counter() - t0
            history.append({"epoch": epoch, "loss": loss, "epoch_time_s": dt})
            if log_fn and (epoch % max(1, epochs // 20) == 0 or epoch == epochs - 1):
                log_fn(f"prior epoch {epoch}: loss={loss:.4f} ({dt:.2f}s)")
            if (
                checkpointer is not None
                and (epoch + 1) % ckpt_every_epochs == 0
            ):
                from eeg_image_decode_tpu.core.checkpoint import save_history

                checkpointer.save(epoch + 1, self.state)
                save_history(checkpointer, history)
        if checkpointer is not None and epochs > start_epoch:
            from eeg_image_decode_tpu.core.checkpoint import save_history

            if checkpointer.latest_step() != epochs:
                checkpointer.save(epochs, self.state)
            save_history(checkpointer, history)
            checkpointer.manager.wait_until_finished()  # durable final save
        return history

    # — checkpointing (the reference pickles the prior state_dict,
    #   Generation_metrics_sub8.ipynb cell 9 / GIT_caption_batch.ipynb cell 7) —

    #: config fields that determine the parameter tree's architecture
    ARCH_FIELDS = ("embed_dim", "cond_dim", "hidden_dims", "time_embed_dim")

    def save(self, path: str) -> str:
        import os
        import pickle

        assert self.state is not None
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "wb") as f:
            pickle.dump(jax.device_get(self.state.params), f)
        return path

    def save_with_config(self, path: str) -> str:
        """Pickle ``{"config": …, "params": …}`` so a loader can validate (or
        reconstruct) the architecture instead of failing deep inside a flax
        apply on a mismatched ``hidden_dims``."""
        import dataclasses
        import os
        import pickle

        assert self.state is not None
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "wb") as f:
            pickle.dump(
                {
                    "format": "eeg_image_decode_tpu/prior-v1",
                    "config": dataclasses.asdict(self.cfg),
                    "params": jax.device_get(self.state.params),
                },
                f,
            )
        return path

    def load(self, path: str) -> None:
        """Load a pickled prior (either the config-carrying ``prior-v1``
        format or a legacy raw param tree). A config-carrying checkpoint that
        disagrees with this pipe's architecture raises a one-line diff."""
        import pickle

        with open(path, "rb") as f:
            obj = pickle.load(f)
        params = self._validate_payload(obj)
        if self.state is None:
            self.init(total_steps=1)
        self.state = self.state.replace(params=params)
        self._loaded_params = True  # train() rebuilds the LR schedule

    def _validate_payload(self, obj):
        import dataclasses

        if isinstance(obj, dict) and "params" in obj and "config" in obj:
            mine = dataclasses.asdict(self.cfg)
            theirs = obj["config"]

            def norm(v):
                return tuple(v) if isinstance(v, (list, tuple)) else v

            diffs = {
                k: {"pipe": mine[k], "checkpoint": theirs.get(k)}
                for k in self.ARCH_FIELDS
                if norm(mine[k]) != norm(theirs.get(k))
            }
            if diffs:
                raise ValueError(
                    f"prior checkpoint config does not match this pipe: {diffs}"
                )
            return obj["params"]
        return obj  # legacy raw param tree

    @classmethod
    def from_checkpoint(
        cls, path: str, *, default_cfg: PriorConfig | None = None, mesh=None
    ) -> "PriorPipe":
        """Build a pipe FROM a checkpoint: a config-carrying pickle
        reconstructs its own ``PriorConfig`` (no caller guessing); a legacy
        raw tree uses ``default_cfg`` (and still fails clearly on the first
        apply if that guess is wrong)."""
        import pickle

        with open(path, "rb") as f:
            obj = pickle.load(f)
        if isinstance(obj, dict) and "params" in obj and "config" in obj:
            stored = dict(obj["config"])
            for k, v in stored.items():
                if isinstance(v, list):
                    stored[k] = tuple(v)
            cfg = PriorConfig(**stored)
            params = obj["params"]
        else:
            cfg = default_cfg or PriorConfig()
            params = obj
        pipe = cls(cfg, mesh=mesh)
        pipe.init(total_steps=1)
        pipe.state = pipe.state.replace(params=params)
        pipe._loaded_params = True  # train() rebuilds the LR schedule
        return pipe

    # — sampling —
    def generate(
        self,
        c_embeds: jax.Array,
        *,
        num_inference_steps: int | None = None,
        guidance_scale: float | None = None,
        key: jax.Array | None = None,
        row_keys: jax.Array | None = None,
    ) -> jax.Array:
        """EEG features → sampled CLIP image embeddings (N, embed_dim).

        ``row_keys`` (N,) typed PRNG keys give each row batch-composition-
        independent noise (see ``ops/ddpm.py::make_cfg_sampler``)."""
        assert self.state is not None, "train or load the prior first"
        cfg = self.cfg
        steps = num_inference_steps or cfg.num_inference_steps
        scale = cfg.guidance_scale if guidance_scale is None else guidance_scale

        # cache the jitted sampler: params enter as a traced argument so a new
        # state does NOT retrace (only a new steps/scale combination does)
        cache_key = (steps, float(scale))
        if cache_key not in self._samplers:

            def denoise_with(params):
                def denoise(x, t, cond, cond_mask):
                    return self.model.apply(
                        {"params": params}, x, t, cond, cond_mask,
                        deterministic=True,
                    )

                return denoise

            def sample(params, key, cond, shape, row_keys=None):
                return make_cfg_sampler(
                    denoise_with(params), self.schedule,
                    num_inference_steps=steps, guidance_scale=scale,
                )(key, cond, shape, row_keys=row_keys)

            self._samplers[cache_key] = jax.jit(
                sample, static_argnames=("shape",)
            )
        if key is None:
            key = jax.random.key(cfg.seed)
        c = jnp.asarray(c_embeds, jnp.float32)
        return self._samplers[cache_key](
            self.state.params, key, c, (c.shape[0], cfg.embed_dim),
            row_keys=row_keys,
        )


def expand_image_embeddings(
    img_embeddings: np.ndarray, n_classes: int, images_per_class: int, reps: int
) -> np.ndarray:
    """(n_cls*ipc, D) → (n_cls*ipc*reps, D): align one CLIP embedding with
    each EEG repetition (ref ``emb_img_train.view(1654,10,1,1024).repeat
    (1,1,4,1)``, Generation_metrics_sub8.ipynb cell 5)."""
    d = img_embeddings.shape[-1]
    x = img_embeddings.reshape(n_classes, images_per_class, 1, d)
    return np.broadcast_to(
        x, (n_classes, images_per_class, reps, d)
    ).reshape(-1, d)
