"""Dropout-PLACEMENT parity vs the reference, via mask injection.

The frameworks' PRNGs are incompatible by construction, so stochastic
training parity cannot be pinned by seeding. What CAN be pinned exactly is
*placement*: draw every dropout mask once in numpy, feed the same pre-scaled
keep-masks to (a) the flax ATMS through its ``dropout_masks`` hook and (b) a
torch oracle that implements the reference's seven dropout sites in the
reference's positions —

- ``models/subject_layers/Embed.py:162`` (DataEmbedding output),
- ``models/subject_layers/SelfAttention_Family.py:69`` (softmax probs),
- ``models/subject_layers/Transformer_EncDec.py:45`` (attention residual),
- ``Transformer_EncDec.py:48`` (FFN post-activation),
- ``Transformer_EncDec.py:49`` (FFN post-conv2),
- ``Retrieval/ATMS_retrieval.py:110`` (tsconv Dropout(0.5)),
- ``ATMS_retrieval.py:157-167`` (Proj_eeg residual-branch Dropout(0.5))

— and assert forward AND gradients agree. A dropout placed at the wrong
site, in the wrong order relative to a residual/norm, or silently dropped
fails this test; the dropout-off trainer-parity test
(``test_train_torch_parity.py``) cannot see any of that.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from eeg_image_decode_tpu.core.config import ATMSConfig  # noqa: E402
from eeg_image_decode_tpu.models import build_encoder  # noqa: E402
from eeg_image_decode_tpu.utils.convert import (  # noqa: E402
    convert_atms_state_dict,
)
from tests.test_atms_torch_parity import _torch_atms_forward  # noqa: E402
from tests.test_convert import _rand_state_dict  # noqa: E402

B, C, T = 4, 63, 250
L, H, FF, D = 64, 4, 256, 1024  # tokens (63ch+subject), heads, d_ff, proj
P, F_CH = 36, 40  # pooled positions ((250-25+1-51)//5+1), conv filters


def _draw_masks(rng):
    """Pre-scaled keep-masks (0 or 1/(1-p)) at the reference's rates:
    0.25 at the embedding + four attention-layer sites
    (``ATMS_retrieval.py:55`` Config.dropout), 0.5 at tsconv + projector
    (``:110,160``)."""

    def keep(shape, p):
        return ((rng.random(shape) >= p).astype(np.float32) / (1.0 - p))

    return {
        "emb": keep((B, L, T), 0.25),
        "layer0": {
            "m_attn": keep((B, H, L, L), 0.25),
            "m_res": keep((B, L, T), 0.25),
            "m_ffn1": keep((B, L, FF), 0.25),
            "m_ffn2": keep((B, L, T), 0.25),
        },
        "tsconv": keep((B, 1, P, F_CH), 0.5),
        "proj": keep((B, D), 0.5),
    }


def _flat_for_torch(masks):
    out = {k: v for k, v in masks.items() if k != "layer0"}
    out.update(masks["layer0"])
    return out


def test_dropout_placement_forward_and_grad_parity(rng):
    sd = _rand_state_dict(rng)
    variables = convert_atms_state_dict(sd)
    x = (rng.normal(size=(B, C, T)) * 0.5).astype(np.float32)
    sid = 4
    masks = _draw_masks(rng)
    v_probe = rng.normal(size=(B, D)).astype(np.float32)

    model = build_encoder("atms", config=ATMSConfig())
    jm = jax.tree_util.tree_map(jnp.asarray, masks)

    def fwd(params):
        (feats, _scale), _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            jnp.asarray(x),
            jnp.full((B,), sid, jnp.int32),
            deterministic=False,  # train-mode BatchNorm, like the reference
            dropout_masks=jm,
            mutable=["batch_stats"],
        )
        return feats

    def loss_fn(params):
        return jnp.sum(fwd(params).astype(jnp.float32) * jnp.asarray(v_probe))

    feats_j = np.asarray(fwd(variables["params"]))
    loss_j, grads_j = jax.value_and_grad(loss_fn)(variables["params"])

    # ——— torch oracle with the SAME masks at the reference's sites ———
    is_stat = lambda k: "running_" in k or "num_batches" in k
    t = {
        k: torch.tensor(np.asarray(v), requires_grad=not is_stat(k))
        for k, v in sd.items()
    }
    feats_t = _torch_atms_forward(
        t, torch.tensor(x), sid, training=True, masks=_flat_for_torch(masks)
    )
    loss_t = (feats_t * torch.tensor(v_probe)).sum()
    loss_t.backward()

    # forward parity under the exact same masks
    np.testing.assert_allclose(
        feats_j, feats_t.detach().numpy(), atol=2e-3, rtol=2e-3
    )
    np.testing.assert_allclose(
        float(loss_j), float(loss_t.detach()), rtol=1e-4
    )

    # gradient parity at every parameter leaf (converter maps gradients
    # exactly like weights: pure transposes/reshapes)
    t_grads = {
        k: (v.grad.detach().numpy().copy() if v.grad is not None
            else np.zeros_like(v.detach().numpy()))
        for k, v in t.items()
    }
    g_conv = convert_atms_state_dict(t_grads)["params"]
    flat_t = dict(jax.tree_util.tree_flatten_with_path(g_conv)[0])
    checked = 0
    for path, gj in jax.tree_util.tree_flatten_with_path(grads_j)[0]:
        np.testing.assert_allclose(
            np.asarray(gj), np.asarray(flat_t[path]),
            atol=3e-3, rtol=2e-3, err_msg=str(path),
        )
        checked += 1
    assert checked >= 30

    # guard: the masks genuinely flow — zeroing one site must change feats
    ab = dict(jm)
    ab["proj"] = jnp.zeros_like(ab["proj"])
    (feats_ab, _), _ = model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jnp.asarray(x), jnp.full((B,), sid, jnp.int32),
        deterministic=False, dropout_masks=ab, mutable=["batch_stats"],
    )
    assert np.abs(np.asarray(feats_ab) - feats_j).max() > 1e-3


def test_missing_mask_keys_mean_keep_all(rng):
    """An empty masks dict = deterministic forward with train-mode BN —
    missing sites must NOT silently fall back to stochastic dropout."""
    sd = _rand_state_dict(rng)
    variables = convert_atms_state_dict(sd)
    x = (rng.normal(size=(2, C, T)) * 0.5).astype(np.float32)

    model = build_encoder("atms", config=ATMSConfig())

    def run(masks):
        (feats, _), _ = model.apply(
            {"params": variables["params"],
             "batch_stats": variables["batch_stats"]},
            jnp.asarray(x), jnp.full((2,), 1, jnp.int32),
            deterministic=False, dropout_masks=masks,
            mutable=["batch_stats"],
        )
        return np.asarray(feats)

    a = run({})
    b = run({})  # no rngs passed: would raise if any nn.Dropout sampled
    np.testing.assert_array_equal(a, b)
