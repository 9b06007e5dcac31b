"""Perf ablation of the contrastive train step on the real chip.

Toggles: dropout off, probe off, text-loss off, bf16 EEG storage, rbg PRNG.
Run: python scripts/ablate_perf.py
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
import optax

from eeg_image_decode_tpu.core.config import ATMSConfig, ContrastiveTrainConfig
from eeg_image_decode_tpu.losses import retrieval_loss
from eeg_image_decode_tpu.models import build_encoder
from eeg_image_decode_tpu.train.contrastive import create_train_state
import bench as B


def make_epoch(model, tx, *, probe=True, text=True, dropout=True):
    def loss_fn(params, batch_stats, batch, dkey):
        (feats, scale), updates = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["eeg"], batch["subject_ids"],
            deterministic=not dropout,
            rngs={"dropout": dkey} if dropout else {},
            mutable=["batch_stats"],
        )
        feats = feats.astype(jnp.float32)
        if text:
            loss = retrieval_loss(feats, batch["img_feat"], batch["text_feat"], scale)
        else:
            from eeg_image_decode_tpu.losses import symmetric_infonce
            loss = symmetric_infonce(feats, batch["img_feat"], scale)
        return loss, (updates["batch_stats"], feats)

    def step(state, idx, data, key):
        batch = {
            "eeg": jnp.take(data.eeg, idx, axis=0).astype(jnp.float32),
            "subject_ids": jnp.take(data.subject_ids, idx, axis=0),
            "img_feat": jnp.take(data.img_feat, jnp.take(data.img_idx, idx), axis=0),
            "text_feat": jnp.take(data.text_feat, jnp.take(data.text_idx, idx), axis=0),
            "labels": jnp.take(data.labels, idx, axis=0),
        }
        dkey = jax.random.fold_in(key, state.step)
        (loss, (new_bs, feats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch, dkey)
        upd, new_opt = tx.update(grads, state.opt_state, state.params)
        state = state.replace(step=state.step + 1,
                              params=optax.apply_updates(state.params, upd),
                              batch_stats=new_bs, opt_state=new_opt)
        metrics = {"loss": loss}
        if probe:
            pl_ = jnp.dot(feats, data.class_img_feat.T,
                          preferred_element_type=jnp.float32)
            metrics["acc"] = jnp.mean(
                (jnp.argmax(pl_, 1) == batch["labels"]).astype(jnp.float32))
        return state, metrics

    @partial(jax.jit, donate_argnums=(0,))
    def epoch(state, data, perm, key):
        st = partial(step, data=data, key=key)
        state, m = jax.lax.scan(st, state, perm)
        return state, jax.tree_util.tree_map(jnp.mean, m)

    return epoch


def run(tag, *, probe=True, text=True, dropout=True, eeg_bf16=False):
    data = B._device_synthetic_data()
    if eeg_bf16:
        data = data.replace(eeg=data.eeg.astype(jnp.bfloat16))
    n = int(data.eeg.shape[0]); bs = 1024; n_steps = n // bs
    model = build_encoder("atms", config=ATMSConfig(), dtype=jnp.bfloat16)
    cfg = ContrastiveTrainConfig(batch_size=bs)
    state, tx = create_train_state(model, cfg, data.eeg[:2].astype(jnp.float32),
                                   data.subject_ids[:2])
    epoch = make_epoch(model, tx, probe=probe, text=text, dropout=dropout)
    times = []
    for e in range(3):
        perm = jax.random.permutation(jax.random.key(e), n)[: n_steps * bs]
        perm = perm.reshape(n_steps, bs).astype(jnp.int32)
        t0 = time.perf_counter()
        state, m = epoch(state, data, perm, jax.random.key(e))
        float(m["loss"])
        times.append(time.perf_counter() - t0)
    sps = n_steps * bs / min(times[1:])
    print(f"{tag:28s}: {sps:9.0f} samples/s  (epoch {min(times[1:]):.3f}s)",
          flush=True)


if __name__ == "__main__":
    run("full (baseline)")
    run("no dropout", dropout=False)
    run("no probe", probe=False)
    run("no text loss", text=False)
    run("eeg bf16 storage", eeg_bf16=True)
    run("all off + bf16", probe=False, text=False, dropout=False, eeg_bf16=True)
