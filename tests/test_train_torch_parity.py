"""Multi-step TRAINING parity vs an independent torch trainer.

Extends the forward golden test (``test_atms_torch_parity.py``) to the full
training semantics a reference user depends on: starting from the same
converted checkpoint, the flax trainer (``train/contrastive.py``) and a
from-the-spec torch trainer — train-mode BatchNorm, the reference's
``0.99·img_clip + 0.01·text_clip`` loss with the raw (never exp'd)
trainable ``logit_scale`` (``ATMS_retrieval.py:206,227-234``), and AdamW
lr 3e-4 / weight-decay 0.01 (``:524``) — must produce:

- the same first-step gradients (tight: this pins loss + backward
  semantics before optimizer noise can amplify),
- the same per-step loss trajectory over 3 steps,
- params within a few optimizer steps of each other (loose: Adam's early
  updates are ~sign(g)·lr, so near-zero gradient elements are
  sign-unstable to fp32 noise — lr-scale deltas there are not bugs).

Dropout is set to 0 on both sides (parity needs identical masks, and the
two frameworks' PRNGs are incompatible by construction).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from eeg_image_decode_tpu.core.config import (  # noqa: E402
    ATMSConfig,
    ContrastiveTrainConfig,
)
from eeg_image_decode_tpu.losses import retrieval_loss  # noqa: E402
from eeg_image_decode_tpu.models import build_encoder  # noqa: E402
from eeg_image_decode_tpu.train.contrastive import (  # noqa: E402
    DeviceData,
    create_train_state,
    make_epoch_fn,
)
from eeg_image_decode_tpu.utils.convert import (  # noqa: E402
    convert_atms_state_dict,
)
from tests.test_atms_torch_parity import _torch_atms_forward  # noqa: E402
from tests.test_convert import _rand_state_dict  # noqa: E402

B, N_STEPS, D = 8, 3, 1024
C, T = 63, 250
LR, WD = 3e-4, 1e-2


def _torch_clip_loss(feats, targets, scale):
    logits = scale * feats @ targets.T
    labels = torch.arange(feats.shape[0])
    return 0.5 * (
        torch.nn.functional.cross_entropy(logits, labels)
        + torch.nn.functional.cross_entropy(logits.T, labels)
    )


def test_three_step_training_parity(rng):
    sd = _rand_state_dict(rng)
    n = B * N_STEPS
    eeg = (rng.normal(size=(n, C, T)) * 0.5).astype(np.float32)
    img = rng.normal(size=(n, D)).astype(np.float32)
    img /= np.linalg.norm(img, axis=1, keepdims=True)
    text = rng.normal(size=(n, D)).astype(np.float32)
    text /= np.linalg.norm(text, axis=1, keepdims=True)
    sid = 4

    # ——— flax side ———
    mcfg = ATMSConfig(dropout=0.0, conv_dropout=0.0, proj_dropout=0.0)
    model = build_encoder("atms", config=mcfg)
    variables = convert_atms_state_dict(sd)
    tcfg = ContrastiveTrainConfig(
        batch_size=B, lr=LR, weight_decay=WD, alpha=0.99
    )
    sids = np.full((n,), sid, np.int32)
    state, tx = create_train_state(
        model, tcfg, jnp.asarray(eeg[:2]), jnp.asarray(sids[:2])
    )
    state = state.replace(
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
    )
    data = DeviceData(
        eeg=jnp.asarray(eeg),
        labels=jnp.zeros((n,), jnp.int32),
        subject_ids=jnp.asarray(sids),
        img_feat=jnp.asarray(img),
        text_feat=jnp.asarray(text),
        img_idx=jnp.arange(n, dtype=jnp.int32),
        text_idx=jnp.arange(n, dtype=jnp.int32),
        class_img_feat=jnp.asarray(img[:1]),
    )

    # first-step gradients through the trainer's exact loss
    def loss_fn(params):
        (feats, scale), _ = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            data.eeg[:B],
            data.subject_ids[:B],
            deterministic=False,
            mutable=["batch_stats"],
        )
        return retrieval_loss(
            feats.astype(jnp.float32), data.img_feat[:B],
            data.text_feat[:B], scale, alpha=0.99,
        )

    loss0, grads = jax.value_and_grad(loss_fn)(state.params)

    epoch_fn = make_epoch_fn(model, tx, tcfg)
    losses = []
    for step in range(N_STEPS):
        perm = jnp.arange(step * B, (step + 1) * B, dtype=jnp.int32)[None]
        state, metrics = epoch_fn(state, data, perm, jax.random.key(0))
        losses.append(float(metrics["loss"]))

    # ——— torch side, written from the reference spec ———
    is_stat = lambda k: "running_" in k or "num_batches" in k
    t = {
        k: torch.tensor(np.asarray(v), requires_grad=not is_stat(k))
        for k, v in sd.items()
    }
    opt = torch.optim.AdamW(
        [v for k, v in t.items() if not is_stat(k)], lr=LR, weight_decay=WD
    )
    t_losses = []
    t_grads0 = None
    for step in range(N_STEPS):
        lo, hi = step * B, (step + 1) * B
        feats = _torch_atms_forward(
            t, torch.tensor(eeg[lo:hi]), sid, training=True
        )
        loss = 0.99 * _torch_clip_loss(
            feats, torch.tensor(img[lo:hi]), t["logit_scale"]
        ) + 0.01 * _torch_clip_loss(
            feats, torch.tensor(text[lo:hi]), t["logit_scale"]
        )
        opt.zero_grad()
        loss.backward()
        if step == 0:
            t_grads0 = {
                k: (v.grad.detach().numpy().copy()
                    if v.grad is not None
                    else np.zeros_like(v.detach().numpy()))
                for k, v in t.items()
            }
        opt.step()
        t_losses.append(float(loss.detach()))

    # 1. first-step loss + gradients (the converter is pure
    #    transposes/reshapes, so it maps gradients exactly like weights)
    np.testing.assert_allclose(float(loss0), t_losses[0], rtol=1e-5)
    g_conv = convert_atms_state_dict(t_grads0)["params"]
    flat_j = jax.tree_util.tree_flatten_with_path(grads)[0]
    flat_t = dict(jax.tree_util.tree_flatten_with_path(g_conv)[0])
    checked = 0
    for path, gj in flat_j:
        gt = flat_t[path]
        np.testing.assert_allclose(
            np.asarray(gj), np.asarray(gt), atol=2e-4, rtol=1e-3,
            err_msg=str(path),
        )
        checked += 1
    assert checked >= 30  # every parameter leaf compared

    # 2. loss trajectory
    np.testing.assert_allclose(losses, t_losses, rtol=2e-3)

    # 3. params stay within a few optimizer steps
    p_torch = convert_atms_state_dict(
        {k: v.detach().numpy() for k, v in t.items()}
    )["params"]
    flat_p = dict(jax.tree_util.tree_flatten_with_path(p_torch)[0])
    for path, pj in jax.tree_util.tree_flatten_with_path(state.params)[0]:
        np.testing.assert_allclose(
            np.asarray(pj), np.asarray(flat_p[path]),
            atol=N_STEPS * LR * 2, rtol=0.1, err_msg=str(path),
        )
