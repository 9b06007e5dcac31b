"""The fused-tsconv model path (what runs on TPU) must agree with the unfused
path given equivalent parameters."""

import numpy as np
import jax
import jax.numpy as jnp

from eeg_image_decode_tpu.models.layers import TSConv


def test_tsconv_module_fused_equals_unfused(rng):
    x = jnp.asarray(rng.normal(size=(3, 63, 250)).astype(np.float32))
    unfused = TSConv(fused_stage1=False)
    fused = TSConv(fused_stage1=True)
    v_u = unfused.init(jax.random.key(0), x, deterministic=True)
    v_f = fused.init(jax.random.key(0), x, deterministic=True)

    # transplant the unfused conv kernel (1, 25, 1, 40) into the fused (25, 40)
    k = v_u["params"]["temporal_conv"]["kernel"].reshape(25, 40)
    v_f = jax.tree_util.tree_map(lambda x: x, v_f)
    params_f = dict(v_f["params"])
    params_f["temporal_conv_kernel"] = k
    # share the rest of the params (same names in both variants)
    for name in v_u["params"]:
        if name != "temporal_conv":
            params_f[name] = v_u["params"][name]

    out_u = unfused.apply(
        {"params": v_u["params"], "batch_stats": v_u["batch_stats"]},
        x, deterministic=True,
    )
    out_f = fused.apply(
        {"params": params_f, "batch_stats": v_u["batch_stats"]},
        x, deterministic=True,
    )
    assert out_u.shape == out_f.shape == (3, 36, 40)
    np.testing.assert_allclose(
        np.asarray(out_f), np.asarray(out_u), atol=3e-5, rtol=1e-4
    )


def test_tsconv_train_mode_fused_equals_unfused(rng):
    """Training mode: the folded BatchNorm's batch statistics and running-
    average updates must match stock nn.BatchNorm on the 4-D view."""
    x = jnp.asarray(rng.normal(size=(4, 63, 250)).astype(np.float32))
    unfused = TSConv(fused_stage1=False, dropout=0.0)
    fused = TSConv(fused_stage1=True, dropout=0.0)
    v_u = unfused.init(jax.random.key(0), x, deterministic=True)
    v_f = fused.init(jax.random.key(0), x, deterministic=True)

    k = v_u["params"]["temporal_conv"]["kernel"].reshape(25, 40)
    params_f = dict(v_f["params"])
    params_f["temporal_conv_kernel"] = k
    for name in v_u["params"]:
        if name != "temporal_conv":
            params_f[name] = v_u["params"][name]

    out_u, upd_u = unfused.apply(
        {"params": v_u["params"], "batch_stats": v_u["batch_stats"]},
        x, deterministic=False, mutable=["batch_stats"],
    )
    out_f, upd_f = fused.apply(
        {"params": params_f, "batch_stats": v_u["batch_stats"]},
        x, deterministic=False, mutable=["batch_stats"],
    )
    np.testing.assert_allclose(
        np.asarray(out_f), np.asarray(out_u), atol=5e-5, rtol=1e-4
    )
    for bn in ("bn1", "bn2"):
        for stat in ("mean", "var"):
            np.testing.assert_allclose(
                np.asarray(upd_f["batch_stats"][bn][stat]),
                np.asarray(upd_u["batch_stats"][bn][stat]),
                atol=1e-5, rtol=1e-4,
            )
