"""Torch-checkpoint conversion tests: a synthetic reference-shaped state_dict
must convert, load, and match torch-op oracles on the precision-critical
subchains (Linear transpose, conv+bias→BN folding, FFN-as-conv1d)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from eeg_image_decode_tpu.models import build_encoder
from eeg_image_decode_tpu.utils.convert import convert_atms_state_dict

C, T, D_MODEL, HEADS, D_FF, N_SUB, EMB, PROJ = 63, 250, 250, 4, 256, 10, 40, 1024


def _rand_state_dict(rng):
    r = lambda *s: rng.normal(size=s).astype(np.float32) * 0.05
    inner = (D_MODEL // HEADS) * HEADS  # 248
    sd = {
        "encoder.enc_embedding.value_embedding.weight": r(D_MODEL, T),
        "encoder.enc_embedding.value_embedding.bias": r(D_MODEL),
        "encoder.enc_embedding.subject_embedding.subject_embedding.weight": r(N_SUB, D_MODEL),
        "encoder.enc_embedding.subject_embedding.shared_embedding": r(1, D_MODEL),
        "logit_scale": np.float32(np.log(1 / 0.07)),
    }
    p = "encoder.encoder.attn_layers.0"
    sd.update({
        f"{p}.attention.query_projection.weight": r(inner, D_MODEL),
        f"{p}.attention.query_projection.bias": r(inner),
        f"{p}.attention.key_projection.weight": r(inner, D_MODEL),
        f"{p}.attention.key_projection.bias": r(inner),
        f"{p}.attention.value_projection.weight": r(inner, D_MODEL),
        f"{p}.attention.value_projection.bias": r(inner),
        f"{p}.attention.out_projection.weight": r(D_MODEL, inner),
        f"{p}.attention.out_projection.bias": r(D_MODEL),
        f"{p}.conv1.weight": r(D_FF, D_MODEL, 1),
        f"{p}.conv1.bias": r(D_FF),
        f"{p}.conv2.weight": r(D_MODEL, D_FF, 1),
        f"{p}.conv2.bias": r(D_MODEL),
        f"{p}.norm1.weight": np.ones(D_MODEL, np.float32),
        f"{p}.norm1.bias": np.zeros(D_MODEL, np.float32),
        f"{p}.norm2.weight": np.ones(D_MODEL, np.float32),
        f"{p}.norm2.bias": np.zeros(D_MODEL, np.float32),
        "encoder.encoder.norm.weight": np.ones(D_MODEL, np.float32),
        "encoder.encoder.norm.bias": np.zeros(D_MODEL, np.float32),
        "enc_eeg.0.tsconv.0.weight": r(EMB, 1, 1, 25),
        "enc_eeg.0.tsconv.0.bias": r(EMB),
        "enc_eeg.0.tsconv.2.weight": np.abs(r(EMB)) + 1,
        "enc_eeg.0.tsconv.2.bias": r(EMB),
        "enc_eeg.0.tsconv.2.running_mean": r(EMB),
        "enc_eeg.0.tsconv.2.running_var": np.abs(r(EMB)) + 1,
        "enc_eeg.0.tsconv.4.weight": r(EMB, EMB, C, 1),
        "enc_eeg.0.tsconv.4.bias": r(EMB),
        "enc_eeg.0.tsconv.5.weight": np.abs(r(EMB)) + 1,
        "enc_eeg.0.tsconv.5.bias": r(EMB),
        "enc_eeg.0.tsconv.5.running_mean": r(EMB),
        "enc_eeg.0.tsconv.5.running_var": np.abs(r(EMB)) + 1,
        "enc_eeg.0.projection.0.weight": r(EMB, EMB, 1, 1),
        "enc_eeg.0.projection.0.bias": r(EMB),
        "proj_eeg.0.weight": r(PROJ, 1440),
        "proj_eeg.0.bias": r(PROJ),
        "proj_eeg.1.fn.1.weight": r(PROJ, PROJ),
        "proj_eeg.1.fn.1.bias": r(PROJ),
        "proj_eeg.2.weight": np.ones(PROJ, np.float32),
        "proj_eeg.2.bias": np.zeros(PROJ, np.float32),
    })
    return sd


def test_converted_checkpoint_loads_and_runs(rng):
    sd = _rand_state_dict(rng)
    variables = convert_atms_state_dict(sd)
    model = build_encoder("atms")
    # template init to compare structures
    x = jnp.asarray(rng.normal(size=(2, C, T)).astype(np.float32))
    sids = jnp.zeros((2,), jnp.int32)
    ref = model.init(jax.random.key(0), x, sids, deterministic=True)

    def paths(tree):
        return {jax.tree_util.keystr(p) for p, _ in
                jax.tree_util.tree_leaves_with_path(tree)}

    missing = paths(ref["params"]) - paths(variables["params"])
    assert not missing, f"converter missed params: {sorted(missing)[:10]}"

    feats, scale = model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        x, sids, deterministic=True,
    )
    assert feats.shape == (2, PROJ)
    assert bool(jnp.all(jnp.isfinite(feats)))
    np.testing.assert_allclose(float(scale), np.log(1 / 0.07), rtol=1e-6)


def test_value_embedding_matches_torch_linear(rng):
    sd = _rand_state_dict(rng)
    variables = convert_atms_state_dict(sd)
    x = rng.normal(size=(3, C, T)).astype(np.float32)
    want = torch.nn.functional.linear(
        torch.tensor(x),
        torch.tensor(sd["encoder.enc_embedding.value_embedding.weight"]),
        torch.tensor(sd["encoder.enc_embedding.value_embedding.bias"]),
    ).numpy()
    p = variables["params"]["encoder"]["embedding"]["value_embedding"]
    got = x @ p["kernel"] + p["bias"]
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_tsconv_bias_folding_matches_torch_chain(rng):
    """Eval-mode conv(+bias)→pool→BN in torch must equal our biasless conv →
    pool → BN with the shifted running mean."""
    sd = _rand_state_dict(rng)
    variables = convert_atms_state_dict(sd)
    x = rng.normal(size=(2, 1, 5, 80)).astype(np.float32)  # (B,1,C',T')

    tx = torch.tensor(x)
    w = torch.tensor(sd["enc_eeg.0.tsconv.0.weight"])
    b = torch.tensor(sd["enc_eeg.0.tsconv.0.bias"])
    conv = torch.nn.functional.conv2d(tx, w, b)
    pooled = torch.nn.functional.avg_pool2d(conv, (1, 51), (1, 5))
    bn_w = torch.tensor(sd["enc_eeg.0.tsconv.2.weight"])
    bn_b = torch.tensor(sd["enc_eeg.0.tsconv.2.bias"])
    bn_m = torch.tensor(sd["enc_eeg.0.tsconv.2.running_mean"])
    bn_v = torch.tensor(sd["enc_eeg.0.tsconv.2.running_var"])
    want = torch.nn.functional.batch_norm(
        pooled, bn_m, bn_v, bn_w, bn_b, False, 0.0, 1e-5
    ).numpy()  # (B, 40, C', P)

    # ours: NHWC biasless conv, folded-mean BN
    p = variables["params"]["encoder"]["enc_eeg"]
    s = variables["batch_stats"]["encoder"]["enc_eeg"]
    xin = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))  # NHWC
    conv_j = jax.lax.conv_general_dilated(
        xin, jnp.asarray(p["temporal_conv"]["kernel"]), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    pool_j = jax.numpy.stack(
        [conv_j[:, :, i * 5 : i * 5 + 51].mean(axis=2)
         for i in range((conv_j.shape[2] - 51) // 5 + 1)], axis=2,
    )
    bn = (pool_j - s["bn1"]["mean"]) / np.sqrt(s["bn1"]["var"] + 1e-5)
    got = bn * p["bn1"]["scale"] + p["bn1"]["bias"]
    np.testing.assert_allclose(
        np.transpose(np.asarray(got), (0, 3, 1, 2)), want, atol=2e-4
    )


def test_export_roundtrip_exact_where_invertible(rng):
    """export(convert(sd)) reproduces every exactly-invertible tensor of the
    original reference state_dict bit-for-bit, and
    convert(export(convert(sd))) is a FIXED POINT (the conv-bias/BN-mean
    fold is the only representation change, and it converges in one step)."""
    from eeg_image_decode_tpu.utils.convert import export_atms_state_dict

    sd0 = _rand_state_dict(rng)
    variables = convert_atms_state_dict(sd0)
    sd1 = export_atms_state_dict(variables)

    # every reference key is present (plus torch's num_batches_tracked)
    missing = set(sd0) - set(sd1)
    assert not missing, missing
    folded = {
        "enc_eeg.0.tsconv.0.bias", "enc_eeg.0.tsconv.2.running_mean",
        "enc_eeg.0.tsconv.4.bias", "enc_eeg.0.tsconv.5.running_mean",
    }
    for k in sd0:
        if k in folded:
            continue
        np.testing.assert_array_equal(
            np.asarray(sd1[k]), np.asarray(sd0[k]), err_msg=k
        )
        assert sd1[k].shape == np.asarray(sd0[k]).shape, k

    # the fold is self-consistent: mean' = mean - b with b' = 0
    np.testing.assert_allclose(
        sd1["enc_eeg.0.tsconv.2.running_mean"],
        np.asarray(sd0["enc_eeg.0.tsconv.2.running_mean"])
        - np.asarray(sd0["enc_eeg.0.tsconv.0.bias"]),
        rtol=1e-6,
    )

    # fixed point through a second roundtrip
    variables2 = convert_atms_state_dict(sd1)
    flat1 = jax.tree_util.tree_flatten_with_path(variables)[0]
    flat2 = dict(jax.tree_util.tree_flatten_with_path(variables2)[0])
    for path, v in flat1:
        np.testing.assert_array_equal(
            np.asarray(v), np.asarray(flat2[path]), err_msg=str(path)
        )


def test_export_roundtrip_behavioral(rng):
    """The exported state_dict behaves IDENTICALLY to the original in an
    independent torch forward, and matches the flax forward — the
    both-directions migration guarantee."""
    torch = pytest.importorskip("torch")  # noqa: F841
    from tests.test_atms_torch_parity import _torch_atms_forward
    from eeg_image_decode_tpu.utils.convert import export_atms_state_dict

    sd0 = _rand_state_dict(rng)
    variables = convert_atms_state_dict(sd0)
    sd1 = export_atms_state_dict(variables)

    x = (rng.normal(size=(3, C, T)) * 0.5).astype(np.float32)
    want = _torch_atms_forward(sd0, x, 4)
    got = _torch_atms_forward(sd1, x, 4)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)

    model = build_encoder("atms")
    feats, _ = model.apply(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        jnp.asarray(x), jnp.full((3,), 4, jnp.int32), deterministic=True,
    )
    np.testing.assert_allclose(np.asarray(feats), got, atol=2e-3, rtol=2e-3)
