"""Reverse migration proven against the reference's OWN model source.

Earlier rounds validated ``export_atms_state_dict`` / ``export_diffusion_
prior`` against torch twins re-implemented in the test suite; these tests
remove that assumption by importing the actual classes from
``/root/reference/Retrieval/ATMS_retrieval.py:171-191``,
``ATMS_retrieval_joint_train.py:173`` and
``/root/reference/Generation/diffusion_prior.py:92-203`` (heavy unused
imports shimmed — see ``tests/_reference_import.py``), loading the export
with ``load_state_dict(strict=True)``, and pinning forward parity between
the flax model and the reference's torch forward.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from tests._reference_import import (
    import_reference_atms,
    import_reference_atms_joint,
    import_reference_diffusion_prior,
)
from tests.test_convert import _rand_state_dict
from eeg_image_decode_tpu.models import build_encoder
from eeg_image_decode_tpu.utils.convert import (
    convert_atms_state_dict,
    export_atms_state_dict,
    reference_atms_config,
)


def _to_torch(sd: dict) -> dict:
    return {k: torch.tensor(np.asarray(v)) for k, v in sd.items()}


def test_atms_export_loads_strict_into_reference_class(rng):
    """convert → export → the reference's real ``ATMS()`` with
    ``strict=True`` (torch's default in ``ATMS_retrieval.py``), then
    forward parity flax vs the reference's own torch forward."""
    ref = import_reference_atms()
    variables = convert_atms_state_dict(_rand_state_dict(rng))
    sd = export_atms_state_dict(variables)

    model = ref.ATMS()  # num_subjects=2 ModuleList default
    model.load_state_dict(_to_torch(sd), strict=True)
    model.eval()

    x = (rng.normal(size=(3, 63, 250)) * 0.5).astype(np.float32)
    sids = np.full((3,), 4, np.int64)
    with torch.no_grad():
        want = model(torch.tensor(x), torch.tensor(sids)).numpy()

    flax_model = build_encoder("atms", config=reference_atms_config())
    got, _ = flax_model.apply(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        jnp.asarray(x), jnp.full((3,), 4, jnp.int32), deterministic=True,
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-3, rtol=2e-3)


def test_atms_joint_export_loads_strict_into_reference_class(rng):
    """A joint-trained flax model (per-subject value embeddings) exports to
    the joint script's ModuleDict layout and loads strict=True into its
    real ``ATMS(joint_train=True)`` — the path ADVICE r4 found crashing."""
    from eeg_image_decode_tpu.core.config import (
        ATMSConfig,
        ContrastiveTrainConfig,
    )
    from eeg_image_decode_tpu.train.contrastive import create_train_state

    ref = import_reference_atms_joint()
    flax_model = build_encoder(
        "atms",
        config=reference_atms_config(joint_train=True, fused_tsconv=False),
    )
    state, _ = create_train_state(
        flax_model, ContrastiveTrainConfig(),
        jnp.zeros((2, 63, 250)), jnp.zeros((2,), jnp.int32),
    )
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    sd = export_atms_state_dict(variables, num_subjects=10)

    model = ref.ATMS(joint_train=True)  # num_subjects=10 ModuleList/Dict
    model.load_state_dict(_to_torch(sd), strict=True)
    model.eval()

    x = (rng.normal(size=(4, 63, 250)) * 0.5).astype(np.float32)
    sids = np.array([0, 3, 7, 9], np.int64)
    with torch.no_grad():
        want = model(torch.tensor(x), torch.tensor(sids)).numpy()
    got, _ = flax_model.apply(
        variables, jnp.asarray(x), jnp.asarray(sids.astype(np.int32)),
        deterministic=True,
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-3, rtol=2e-3)


def test_prior_export_loads_strict_into_reference_class(rng):
    """export_diffusion_prior output loads strict=True into the reference's
    real ``DiffusionPriorUNet`` and matches its forward — conditioned,
    unconditioned (``c=None``), and under the traced cond_mask gate."""
    from eeg_image_decode_tpu.models.diffusion_prior import (
        DiffusionPriorUNet,
        export_diffusion_prior,
    )

    ref = import_reference_diffusion_prior()
    dims = (64, 48, 32)
    flax_model = DiffusionPriorUNet(
        embed_dim=32, cond_dim=24, hidden_dims=dims, time_embed_dim=16)
    x = rng.normal(size=(5, 32)).astype(np.float32)
    c = rng.normal(size=(5, 24)).astype(np.float32)
    t = np.array([0, 7, 123, 500, 999], np.int64)
    params = flax_model.init(
        jax.random.key(0), jnp.asarray(x), jnp.asarray(t), jnp.asarray(c)
    )["params"]
    sd = export_diffusion_prior(params)

    model = ref.DiffusionPriorUNet(
        embed_dim=32, cond_dim=24, hidden_dim=list(dims), time_embed_dim=16)
    model.load_state_dict(_to_torch(sd), strict=True)
    model.eval()

    with torch.no_grad():
        want_c = model(torch.tensor(x), torch.tensor(t),
                       torch.tensor(c)).numpy()
        want_u = model(torch.tensor(x), torch.tensor(t), None).numpy()
    got_c = flax_model.apply({"params": params}, jnp.asarray(x),
                             jnp.asarray(t), jnp.asarray(c))
    np.testing.assert_allclose(np.asarray(got_c), want_c, atol=2e-5,
                               rtol=1e-4)
    got_u = flax_model.apply({"params": params}, jnp.asarray(x),
                             jnp.asarray(t), None)
    np.testing.assert_allclose(np.asarray(got_u), want_u, atol=2e-5,
                               rtol=1e-4)
    # cond_mask=0 must equal the reference's c=None branch exactly
    got_gate = flax_model.apply(
        {"params": params}, jnp.asarray(x), jnp.asarray(t), jnp.asarray(c),
        jnp.zeros((5,), jnp.float32),
    )
    np.testing.assert_allclose(np.asarray(got_gate), want_u, atol=2e-5,
                               rtol=1e-4)


def test_lowlevel_export_loads_strict_into_reference_class(rng):
    """export_encoder_low_level output loads strict=True into the
    reference's real ``encoder_low_level`` (143M-param fixed-size module)
    and matches its forward."""
    from tests._reference_import import import_reference_lowlevel
    from eeg_image_decode_tpu.models.lowlevel import (
        EncoderLowLevel,
        convert_encoder_low_level,
        export_encoder_low_level,
    )

    ref = import_reference_lowlevel()
    torch.manual_seed(0)
    t_model = ref.encoder_low_level()
    variables = convert_encoder_low_level(
        {k: v.detach().numpy() for k, v in t_model.state_dict().items()})
    sd = export_encoder_low_level(variables)

    t2 = ref.encoder_low_level()
    t2.load_state_dict(_to_torch(sd), strict=True)
    t2.eval()
    x = (rng.normal(size=(2, 63, 250)) * 0.3).astype(np.float32)
    with torch.no_grad():
        want = t2(torch.tensor(x)).numpy()
        orig = t_model.eval()(torch.tensor(x)).numpy()
    np.testing.assert_allclose(want, orig, atol=1e-6)  # exact roundtrip
    model = EncoderLowLevel()
    got = model.apply(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        jnp.asarray(x), deterministic=True,
    )
    # NHWC → NCHW for comparison
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(got), -1, 1), want, atol=2e-3, rtol=2e-3)


def test_reference_class_rejects_truncated_export(rng):
    """Negative control: the pre-fix export (missing subject_wise_linear /
    mask/pe/temporal keys) must FAIL a strict load — i.e. the keys this
    round added are genuinely required by the reference."""
    ref = import_reference_atms()
    variables = convert_atms_state_dict(_rand_state_dict(rng))
    sd = export_atms_state_dict(variables)
    for k in list(sd):
        if k.startswith("subject_wise_linear."):
            del sd[k]
    model = ref.ATMS()
    with pytest.raises(RuntimeError, match="Missing key"):
        model.load_state_dict(_to_torch(sd), strict=True)
