"""Dropout-PLACEMENT parity for the diffusion prior, via mask injection.

The real reconstruction pipeline trains the prior WITH dropout —
``DiffusionPriorUNet(cond_dim=1024, dropout=0.1)`` in the reference's
``1x1024_reconstruct_sdxl.ipynb`` / ``EEGNetV4_Generation_metrics_sub8.ipynb``
— but the round-5 trajectory-parity proof (shared noise/timesteps/cond-
dropout) necessarily runs the MLP dropout OFF because the frameworks' PRNGs
are incompatible. What CAN be pinned exactly is *placement*: draw every
keep-mask once in numpy and feed the same pre-scaled masks to

- the reference's OWN ``DiffusionPriorUNet`` (imported from
  ``/root/reference/Generation/diffusion_prior.py``), its 2(n-1)
  ``nn.Dropout`` modules (``encode_layers[i][3]`` / ``decode_layers[i][3]``,
  ref ``:140,159``) swapped for mask-multipliers, and
- the flax model through its ``dropout_masks`` hook,

then assert forward AND gradients agree. A mask applied before the
LayerNorm, after the skip-add, or silently dropped fails here; the
dropout-off trajectory test cannot see any of that. Same recipe as the
ATM-S seven-site test (``test_dropout_placement_parity.py``).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from eeg_image_decode_tpu.models.diffusion_prior import (  # noqa: E402
    DiffusionPriorUNet,
    export_diffusion_prior,
)
from tests._reference_import import (  # noqa: E402
    import_reference_diffusion_prior,
)

B = 5
DIMS = (64, 48, 32)
E, C_DIM, T_DIM = 32, 24, 16


class _MaskMul(torch.nn.Module):
    def __init__(self, mask: np.ndarray):
        super().__init__()
        self.register_buffer("mask", torch.tensor(mask))

    def forward(self, x):
        return x * self.mask


def test_prior_dropout_placement_forward_and_grad_parity(rng):
    ref = import_reference_diffusion_prior()

    flax_model = DiffusionPriorUNet(
        embed_dim=E, cond_dim=C_DIM, hidden_dims=DIMS,
        time_embed_dim=T_DIM, dropout=0.1,
    )
    x = rng.normal(size=(B, E)).astype(np.float32)
    c = rng.normal(size=(B, C_DIM)).astype(np.float32)
    t = np.array([0, 7, 123, 500, 999], np.int64)
    params = flax_model.init(
        jax.random.key(0), jnp.asarray(x), jnp.asarray(t), jnp.asarray(c)
    )["params"]

    # pre-scaled keep-masks at the notebook rate (p=0.1) for all 2(n-1)
    # sites; enc_i output is DIMS[i+1], dec_j output is DIMS[n-1-j-1]
    def keep(shape, p=0.1):
        return ((rng.random(shape) >= p).astype(np.float32) / (1.0 - p))

    n = len(DIMS)
    masks = {f"enc_{i}": keep((B, DIMS[i + 1])) for i in range(n - 1)}
    masks.update(
        {f"dec_{j}": keep((B, DIMS[i - 1]))
         for j, i in enumerate(range(n - 1, 0, -1))}
    )
    probe = rng.normal(size=(B, E)).astype(np.float32)

    # — torch side: the reference's own class, Dropouts swapped for masks —
    model = ref.DiffusionPriorUNet(
        embed_dim=E, cond_dim=C_DIM, hidden_dim=list(DIMS),
        time_embed_dim=T_DIM, dropout=0.1,
    )
    model.load_state_dict(
        {k: torch.tensor(v) for k, v in export_diffusion_prior(params).items()},
        strict=True,
    )
    for i in range(n - 1):
        assert isinstance(model.encode_layers[i][3], torch.nn.Dropout)
        model.encode_layers[i][3] = _MaskMul(masks[f"enc_{i}"])
        assert isinstance(model.decode_layers[i][3], torch.nn.Dropout)
        model.decode_layers[i][3] = _MaskMul(masks[f"dec_{i}"])
    model.train()  # dropout-active mode; masks are deterministic anyway

    xt = torch.tensor(x, requires_grad=True)
    out_t = model(xt, torch.tensor(t), torch.tensor(c))
    loss_t = (out_t * torch.tensor(probe)).sum()
    loss_t.backward()
    want = out_t.detach().numpy()
    want_dx = xt.grad.numpy()
    want_dw = model.input_layer[0].weight.grad.numpy()

    # — jax side: the dropout_masks hook —
    def loss_fn(p, xx):
        out = flax_model.apply(
            {"params": p}, xx, jnp.asarray(t), jnp.asarray(c),
            deterministic=False,
            dropout_masks={k: jnp.asarray(v) for k, v in masks.items()},
        )
        return jnp.sum(out * jnp.asarray(probe)), out

    (_, got), (gp, gx) = jax.value_and_grad(loss_fn, argnums=(0, 1),
                                            has_aux=True)(
        params, jnp.asarray(x)
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gx), want_dx, atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(gp["input_dense"]["kernel"]).T, want_dw,
        atol=2e-5, rtol=1e-4,
    )
    # the masks actually bit: dropout-off output must differ
    off = flax_model.apply({"params": params}, jnp.asarray(x),
                           jnp.asarray(t), jnp.asarray(c))
    assert float(jnp.max(jnp.abs(off - got))) > 1e-3
