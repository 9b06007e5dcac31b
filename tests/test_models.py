"""Shape + numerics tests for the encoder zoo (the test pyramid the reference
lacks — SURVEY.md §4). Every encoder must map (B, 63, 250) → (B, 1024),
be finite, depend on its inputs, and train (grad flows to every param)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from eeg_image_decode_tpu.models import build_encoder
from eeg_image_decode_tpu.models.registry import ENCODERS

B, C, T, D = 4, 63, 250, 1024

ALL_ENCODERS = sorted(ENCODERS)


def _init_and_apply(name, x, subject_ids=None, train=False):
    model = build_encoder(name)
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        x,
        subject_ids,
        deterministic=True,
    )
    if train:
        out, updates = model.apply(
            variables,
            x,
            subject_ids,
            deterministic=False,
            rngs={"dropout": jax.random.key(2)},
            mutable=["batch_stats"],
        )
        return model, variables, out
    out = model.apply(variables, x, subject_ids, deterministic=True)
    return model, variables, out


@pytest.mark.parametrize("name", ALL_ENCODERS)
def test_encoder_output_shape_and_finite(name, rng):
    x = jnp.asarray(rng.normal(size=(B, C, T)).astype(np.float32))
    sids = jnp.zeros((B,), jnp.int32)
    _, _, (feats, scale) = _init_and_apply(name, x, sids)
    assert feats.shape == (B, D), f"{name}: {feats.shape}"
    assert bool(jnp.all(jnp.isfinite(feats))), name
    assert scale.shape == ()


@pytest.mark.parametrize("name", ["atms", "nice", "eegnetv4"])
def test_encoder_depends_on_input(name, rng):
    x1 = jnp.asarray(rng.normal(size=(B, C, T)).astype(np.float32))
    x2 = x1.at[0].add(1.0)
    sids = jnp.zeros((B,), jnp.int32)
    model = build_encoder(name)
    variables = model.init(jax.random.key(0), x1, sids, deterministic=True)
    f1, _ = model.apply(variables, x1, sids, deterministic=True)
    f2, _ = model.apply(variables, x2, sids, deterministic=True)
    assert not np.allclose(np.asarray(f1[0]), np.asarray(f2[0]))
    # untouched samples must be unaffected (no cross-batch leakage in eval)
    np.testing.assert_allclose(np.asarray(f1[1:]), np.asarray(f2[1:]), atol=1e-5)


def test_atms_subject_token_changes_features(rng):
    x = jnp.asarray(rng.normal(size=(B, C, T)).astype(np.float32))
    model = build_encoder("atms")
    variables = model.init(
        jax.random.key(0), x, jnp.zeros((B,), jnp.int32), deterministic=True
    )
    f0, _ = model.apply(variables, x, jnp.zeros((B,), jnp.int32), deterministic=True)
    f1, _ = model.apply(variables, x, jnp.ones((B,), jnp.int32), deterministic=True)
    assert not np.allclose(np.asarray(f0), np.asarray(f1))


def test_atms_out_of_range_subject_uses_shared_token(rng):
    """Reference fallback (Embed.py:117-121): any id >= num_subjects → shared
    token for the whole batch. ids 10 and 99 must therefore agree."""
    x = jnp.asarray(rng.normal(size=(B, C, T)).astype(np.float32))
    model = build_encoder("atms")
    variables = model.init(
        jax.random.key(0), x, jnp.zeros((B,), jnp.int32), deterministic=True
    )
    f10, _ = model.apply(
        variables, x, jnp.full((B,), 10, jnp.int32), deterministic=True
    )
    f99, _ = model.apply(
        variables, x, jnp.full((B,), 99, jnp.int32), deterministic=True
    )
    np.testing.assert_allclose(np.asarray(f10), np.asarray(f99), atol=1e-6)


def test_atms_joint_train_per_subject_embeddings(rng):
    from eeg_image_decode_tpu.core.config import ATMSConfig

    x = jnp.asarray(rng.normal(size=(B, C, T)).astype(np.float32))
    model = build_encoder("atms", config=ATMSConfig(joint_train=True))
    variables = model.init(
        jax.random.key(0), x, jnp.zeros((B,), jnp.int32), deterministic=True
    )
    p = variables["params"]["encoder"]["embedding"]
    assert "subject_value_w" in p, list(p.keys())
    assert p["subject_value_w"].shape == (10, T, T)
    f0, _ = model.apply(variables, x, jnp.zeros((B,), jnp.int32), deterministic=True)
    f1, _ = model.apply(variables, x, jnp.ones((B,), jnp.int32), deterministic=True)
    assert not np.allclose(np.asarray(f0), np.asarray(f1))


def test_atms_gradients_reach_all_params(rng):
    from eeg_image_decode_tpu.core.config import ATMSConfig
    from eeg_image_decode_tpu.losses import clip_loss

    # small time axis: this test only needs grad *coverage*, not real dims
    T, D = 64, 64
    x = jnp.asarray(rng.normal(size=(B, C, T)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
    sids = jnp.zeros((B,), jnp.int32)
    model = build_encoder(
        "atms",
        config=ATMSConfig(seq_len=T, d_model=T, temporal_kernel=9,
                          pool_size=16, pool_stride=4, proj_dim=D),
    )
    variables = model.init(
        {"params": jax.random.key(0)}, x, sids, deterministic=True
    )

    def loss_fn(params):
        (feats, scale), _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x,
            sids,
            deterministic=False,
            rngs={"dropout": jax.random.key(1)},
            mutable=["batch_stats"],
        )
        return clip_loss(feats, y, scale)

    grads = jax.grad(loss_fn)(variables["params"])
    zero_grads = [
        path
        for path, g in jax.tree_util.tree_leaves_with_path(grads)
        if float(jnp.max(jnp.abs(g))) == 0.0
    ]
    # only the out-of-range shared-token fallback may be untouched
    names = [jax.tree_util.keystr(p) for p in zero_grads]
    allowed = {"shared_embedding"}
    bad = [n for n in names if not any(a in n for a in allowed)]
    assert not bad, f"params with zero grads: {bad}"


def test_atms_train_mode_updates_batch_stats(rng):
    x = jnp.asarray(rng.normal(size=(B, C, T)).astype(np.float32))
    sids = jnp.zeros((B,), jnp.int32)
    model = build_encoder("atms")
    variables = model.init(jax.random.key(0), x, sids, deterministic=True)
    _, updates = model.apply(
        variables,
        x,
        sids,
        deterministic=False,
        rngs={"dropout": jax.random.key(1)},
        mutable=["batch_stats"],
    )
    before = jax.tree_util.tree_leaves(variables["batch_stats"])
    after = jax.tree_util.tree_leaves(updates["batch_stats"])
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(after, before)
    )


def test_tsconv_token_count_matches_reference():
    """(250-25+1)=226 → pool(51, stride 5) → 36 tokens → flatten 36*40=1440
    (ref Proj_eeg embedding_dim=1440, ATMS_retrieval.py:158)."""
    from eeg_image_decode_tpu.models.layers import TSConv

    x = jnp.zeros((2, 63, 250))
    m = TSConv()
    v = m.init(jax.random.key(0), x, deterministic=True)
    out = m.apply(v, x, deterministic=True)
    assert out.shape == (2, 36, 40)


def test_logit_scale_init_value():
    model = build_encoder("nice")
    v = model.init(jax.random.key(0), jnp.zeros((1, C, T)), deterministic=True)
    s = v["params"]["logit_scale"]["logit_scale"]
    np.testing.assert_allclose(float(s), np.log(1 / 0.07), rtol=1e-6)


def test_registry_rejects_unknown():
    with pytest.raises(KeyError):
        build_encoder("resnet50")


@pytest.mark.parametrize("impl", ["gram", "gram2d", "gramfold"])
def test_gram_stage1_bn_matches_flax_batchnorm(rng, impl):
    """GramStage1BN (stats from the stage-1 matmul inputs, an HBM-traffic
    optimization — docs/PERF.md; 'gram2d' additionally normalizes on the
    2-D matmul layout) must match nn.BatchNorm exactly: identical
    param/variable tree, train forward, batch_stats updates, gradients, and
    eval forward."""
    import jax.tree_util as jtu

    from eeg_image_decode_tpu.models.layers import TSConv

    x = jnp.asarray(rng.normal(size=(8, 15, 64)).astype(np.float32))

    def make(impl):
        return TSConv(filters=12, temporal_kernel=9, pool_size=16,
                      pool_stride=4, emb_size=12, spatial_extent=15,
                      fused_stage1=True, bn1_impl=impl, dropout=0.0)

    m_f, m_g = make("flax"), make(impl)
    v = m_f.init(jax.random.key(0), x, deterministic=True)
    v_g = m_g.init(jax.random.key(0), x, deterministic=True)
    sf = {jtu.keystr(p): a.shape for p, a in jtu.tree_leaves_with_path(v)}
    sg = {jtu.keystr(p): a.shape for p, a in jtu.tree_leaves_with_path(v_g)}
    assert sf == sg  # checkpoint-compatible tree

    out_f, upd_f = m_f.apply(v, x, deterministic=False,
                             mutable=["batch_stats"],
                             rngs={"dropout": jax.random.key(1)})
    out_g, upd_g = m_g.apply(v, x, deterministic=False,
                             mutable=["batch_stats"],
                             rngs={"dropout": jax.random.key(1)})
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_g),
                               atol=2e-5, rtol=1e-4)
    for k in ("mean", "var"):
        np.testing.assert_allclose(
            np.asarray(upd_f["batch_stats"]["bn1"][k]),
            np.asarray(upd_g["batch_stats"]["bn1"][k]),
            atol=1e-5, rtol=1e-4,
        )

    def loss(params, mod):
        out = mod.apply(
            {"params": params, "batch_stats": v["batch_stats"]},
            x, deterministic=False, mutable=["batch_stats"],
            rngs={"dropout": jax.random.key(1)},
        )[0]
        return jnp.sum(out * out)

    gf = jax.grad(loss)(v["params"], m_f)
    gg = jax.grad(loss)(v["params"], m_g)
    for (pa, a), (pb, b) in zip(
        sorted(jtu.tree_leaves_with_path(gf), key=lambda t: jtu.keystr(t[0])),
        sorted(jtu.tree_leaves_with_path(gg), key=lambda t: jtu.keystr(t[0])),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-4, rtol=2e-3,
                                   err_msg=jtu.keystr(pa))

    np.testing.assert_allclose(
        np.asarray(m_f.apply(v, x, deterministic=True)),
        np.asarray(m_g.apply(v, x, deterministic=True)),
        atol=2e-5, rtol=1e-4,
    )
