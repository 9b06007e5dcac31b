"""Low-level (VAE-latent) trainer.

Rebuilds the training loop of
``Generation/train_vae_latent_512_low_level_no_average.py:265-344,490-545``:
L1 regression from EEG epochs to cached SDXL VAE latents (un-averaged test
reps, C7), AdamW 1e-3 with cosine annealing over the run, batch 30. Same
whole-dataset-in-HBM scan-epoch design as the other trainers.
"""

from __future__ import annotations

import os
import time
from functools import partial
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp
import optax
from flax import struct

from eeg_image_decode_tpu.core.config import LowLevelConfig
from eeg_image_decode_tpu.models.lowlevel import EncoderLowLevel


class LowLevelState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any


class LowLevelTrainer:
    def __init__(self, cfg: LowLevelConfig = LowLevelConfig(), *,
                 model: EncoderLowLevel | None = None, mesh=None):
        """``mesh``: optional Mesh with a ``dp`` axis — batch indices shard,
        state/data replicate, GSPMD inserts the grad all-reduce (and the
        BatchNorm batch statistics stay global: the stat reductions are
        logical over the full batch). batch_size must divide the dp size —
        the reference's default 30 does not divide 8, so pick one that does
        when training on a mesh."""
        self.mesh = mesh
        self.cfg = cfg
        self.model = model or EncoderLowLevel(
            n_channels=cfg.n_channels,
            seq_len=cfg.seq_len,
            time_proj_dim=cfg.time_proj_dim,
            latent_channels=cfg.latent_shape[0],
        )
        self.state: LowLevelState | None = None
        self._preview: dict | None = None

    def init(self, total_steps: int, seed: int = 0,
             steps_per_epoch: int | None = None) -> LowLevelState:
        cfg = self.cfg
        variables = self.model.init(
            jax.random.key(seed),
            jnp.zeros((2, cfg.n_channels, cfg.seq_len)),
            deterministic=True,
        )
        if steps_per_epoch:
            # the reference steps CosineAnnealingLR(T_max=epochs,
            # eta_min=1e-6) once per EPOCH (train_vae_latent_512_low_level
            # _no_average.py:407,442): a per-epoch staircase, epoch e at
            # η_min + (lr−η_min)(1+cos(πe/T))/2 — pinned by
            # scripts/parity_lowlevel_trajectory.py
            t_max = max(total_steps // steps_per_epoch, 1)
            eta_min = 1e-6

            def schedule(count):
                epoch = count // steps_per_epoch
                return eta_min + (cfg.lr - eta_min) * 0.5 * (
                    1.0 + jnp.cos(jnp.pi * epoch / t_max)
                )
        else:  # no epoch structure known: smooth per-step cosine
            schedule = optax.cosine_decay_schedule(cfg.lr, max(total_steps, 1))
        # torch.optim.AdamW's DEFAULT weight_decay=0.01 — the reference
        # passes only lr (:533), so 0.01 is what its runs actually used
        self.tx = optax.adamw(schedule, weight_decay=0.01)
        self.state = LowLevelState(
            step=jnp.zeros((), jnp.int32),
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=self.tx.init(variables["params"]),
        )
        self._epoch_fn = self._make_epoch_fn()
        return self.state

    def _make_epoch_fn(self):
        model, tx = self.model, self.tx

        def loss_fn(params, batch_stats, eeg, latents):
            pred, updates = model.apply(
                {"params": params, "batch_stats": batch_stats},
                eeg,
                deterministic=False,
                mutable=["batch_stats"],
            )
            # latents arrive NHWC to match the model output
            loss = jnp.mean(jnp.abs(pred - latents))  # L1 (ref :294)
            return loss, updates["batch_stats"]

        def train_step(state, idx, eeg_all, lat_all):
            eeg = jnp.take(eeg_all, idx, axis=0)
            lat = jnp.take(lat_all, idx, axis=0)
            (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, state.batch_stats, eeg, lat
            )
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            return (
                state.replace(
                    step=state.step + 1,
                    params=optax.apply_updates(state.params, updates),
                    batch_stats=new_bs,
                    opt_state=new_opt,
                ),
                {"loss": loss},
            )

        def epoch_fn(state, eeg_all, lat_all, perm):
            step = partial(train_step, eeg_all=eeg_all, lat_all=lat_all)
            state, metrics = jax.lax.scan(step, state, perm)
            return state, jax.tree_util.tree_map(jnp.mean, metrics)

        if self.mesh is None:
            return jax.jit(epoch_fn, donate_argnums=(0,))
        from eeg_image_decode_tpu.core.mesh import dp_epoch_jit

        return dp_epoch_jit(epoch_fn, self.mesh, n_args=4, perm_index=3)

    def set_preview_decoder(self, vae, vae_params, *, preview_dir: str,
                            preview_every: int = 10, n_previews: int = 4
                            ) -> None:
        """Install a frozen VAE so ``train()`` periodically decodes a few
        predicted latents to PNGs — the reference's training-time sample
        decode (``train_vae_latent_512_low_level_no_average.py:309-323,
        375-397``). Previews land in ``preview_dir/epoch_%04d/%02d.png``."""
        import jax.numpy as jnp

        from eeg_image_decode_tpu.gen.vae import VAE

        @jax.jit
        def decode(params, batch_stats, vparams, eeg):
            lat = self.model.apply(
                {"params": params, "batch_stats": batch_stats},
                eeg, deterministic=True,
            )
            img = vae.apply({"params": vparams}, lat.astype(jnp.float32),
                            method=VAE.decode)
            return jnp.clip(img * 0.5 + 0.5, 0.0, 1.0)

        self._preview = {
            "decode": decode,
            "vae_params": vae_params,
            "dir": preview_dir,
            "every": max(1, preview_every),
            "n": n_previews,
        }

    def _write_previews(self, epoch: int, eeg: np.ndarray) -> None:
        from PIL import Image

        p = self._preview
        imgs = np.asarray(p["decode"](
            self.state.params, self.state.batch_stats, p["vae_params"],
            jnp.asarray(eeg[: p["n"]], jnp.float32),
        ))
        out = os.path.join(p["dir"], f"epoch_{epoch:04d}")
        os.makedirs(out, exist_ok=True)
        for i, im in enumerate(imgs):
            Image.fromarray((im * 255).astype(np.uint8)).save(
                os.path.join(out, f"{i:02d}.png")
            )

    def train(
        self,
        eeg: np.ndarray,
        latents: np.ndarray,
        *,
        epochs: int | None = None,
        batch_size: int | None = None,
        seed: int = 0,
        log_fn=print,
        checkpointer=None,
        ckpt_every_epochs: int = 10,
        resume: bool = False,
    ) -> list[dict]:
        """``latents`` accepted NCHW (the cached torch layout, (N,4,64,64)) or
        NHWC; converted to NHWC internally.

        ``checkpointer``/``resume`` work like the prior trainer's: full-state
        orbax saves every ``ckpt_every_epochs`` + durable final, epoch-keyed
        permutations so a resumed run reproduces the uninterrupted one (the
        reference's 200-epoch job restarts from scratch on a kill)."""
        cfg = self.cfg
        epochs = epochs or cfg.epochs
        batch_size = min(batch_size or cfg.batch_size, eeg.shape[0])
        from eeg_image_decode_tpu.core.mesh import validate_dp_batch

        validate_dp_batch(self.mesh, batch_size)
        if latents.ndim == 4 and latents.shape[1] == cfg.latent_shape[0]:
            latents = np.moveaxis(latents, 1, -1)
        n = eeg.shape[0]
        n_steps = max(n // batch_size, 1)
        if self.state is None:
            # steps_per_epoch selects the reference's per-EPOCH
            # CosineAnnealingLR staircase (the schedule the trajectory-parity
            # proof pins) — without it init() falls back to a smooth per-step
            # cosine that diverges from the validated trajectory
            self.init(total_steps=n_steps * epochs, seed=seed,
                      steps_per_epoch=n_steps)
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
            start_epoch = int(step)
            history = load_history(checkpointer, start_epoch)
        eeg_all = jax.device_put(jnp.asarray(eeg, jnp.float32))
        lat_all = jax.device_put(jnp.asarray(latents, jnp.float32))
        for epoch in range(start_epoch, epochs):
            rng = np.random.default_rng(seed * 7907 + epoch)
            perm = jnp.asarray(
                rng.permutation(n)[: n_steps * batch_size]
                .reshape(n_steps, batch_size)
                .astype(np.int32)
            )
            t0 = time.perf_counter()
            self.state, metrics = self._epoch_fn(self.state, eeg_all, lat_all, perm)
            loss = float(metrics["loss"])
            if not np.isfinite(loss):
                raise FloatingPointError(
                    f"non-finite low-level loss {loss} at epoch {epoch}"
                )
            history.append(
                {"epoch": epoch, "loss": loss,
                 "epoch_time_s": time.perf_counter() - t0}
            )
            if log_fn and epoch % max(1, epochs // 10) == 0:
                log_fn(f"lowlevel epoch {epoch}: L1={loss:.4f}")
            if (
                self._preview is not None
                and (epoch + 1) % self._preview["every"] == 0
            ):
                self._write_previews(epoch, eeg)
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
        if (
            self._preview is not None
            and epochs > start_epoch  # no-op resume: nothing new to decode
            and epochs % self._preview["every"] != 0  # else loop just wrote it
        ):
            self._write_previews(epochs - 1, eeg)  # final previews (ref eval)
        return history

    def predict(self, eeg: jax.Array) -> jax.Array:
        """EEG → predicted VAE latents (N, 64, 64, 4 → NHWC)."""
        assert self.state is not None
        return self.model.apply(
            {"params": self.state.params, "batch_stats": self.state.batch_stats},
            jnp.asarray(eeg, jnp.float32),
            deterministic=True,
        )
