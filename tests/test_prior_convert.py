"""Torch-oracle parity for the reference diffusion-prior checkpoint converter.

Builds a torch module with EXACTLY the reference's parameter layout
(``Generation/diffusion_prior.py:92-203``: ``input_layer.{0,1}``,
``encode/decode_time_embedding.{i}.linear_{1,2}``,
``encode/decode_cond_embedding.{i}``, ``encode/decode_layers.{i}.{0,1}``,
``output_layer``) and the reference's forward (diffusers
``Timesteps(dim, flip_sin_to_cos=True, downscale_freq_shift=0)`` +
per-stage additive time/cond injections + U-skips), converts its state dict
with ``convert_diffusion_prior``, and asserts forward parity with
:class:`DiffusionPriorUNet` — cond and uncond branches.
"""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from eeg_image_decode_tpu.models.diffusion_prior import (
    DiffusionPriorUNet,
    convert_diffusion_prior,
)

EMBED, COND, TDIM = 24, 20, 16
DIMS = (24, 16, 8)


def _timesteps(t: torch.Tensor, dim: int) -> torch.Tensor:
    """diffusers Timesteps(dim, True, 0): [cos | sin] halves."""
    half = dim // 2
    freqs = torch.exp(
        -math.log(10000.0) * torch.arange(half, dtype=torch.float32) / half
    )
    args = t.float()[:, None] * freqs[None]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


class _TimestepEmbedding(torch.nn.Module):
    def __init__(self, in_dim, out_dim):
        super().__init__()
        self.linear_1 = torch.nn.Linear(in_dim, out_dim)
        self.act = torch.nn.SiLU()
        self.linear_2 = torch.nn.Linear(out_dim, out_dim)

    def forward(self, x):
        return self.linear_2(self.act(self.linear_1(x)))


class _RefPriorUNet(torch.nn.Module):
    """Reference-layout torch oracle (state-dict-key compatible)."""

    def __init__(self, embed_dim=EMBED, cond_dim=COND, hidden_dim=DIMS,
                 time_embed_dim=TDIM):
        super().__init__()
        self.time_embed_dim = time_embed_dim
        hd = list(hidden_dim)
        self.input_layer = torch.nn.Sequential(
            torch.nn.Linear(embed_dim, hd[0]),
            torch.nn.LayerNorm(hd[0]),
            torch.nn.SiLU(),
        )
        n = len(hd)
        self.num_layers = n
        self.encode_time_embedding = torch.nn.ModuleList(
            [_TimestepEmbedding(time_embed_dim, hd[i]) for i in range(n - 1)]
        )
        self.encode_cond_embedding = torch.nn.ModuleList(
            [torch.nn.Linear(cond_dim, hd[i]) for i in range(n - 1)]
        )
        self.encode_layers = torch.nn.ModuleList(
            [torch.nn.Sequential(
                torch.nn.Linear(hd[i], hd[i + 1]),
                torch.nn.LayerNorm(hd[i + 1]),
                torch.nn.SiLU(),
                torch.nn.Dropout(0.0),
            ) for i in range(n - 1)]
        )
        self.decode_time_embedding = torch.nn.ModuleList(
            [_TimestepEmbedding(time_embed_dim, hd[i])
             for i in range(n - 1, 0, -1)]
        )
        self.decode_cond_embedding = torch.nn.ModuleList(
            [torch.nn.Linear(cond_dim, hd[i]) for i in range(n - 1, 0, -1)]
        )
        self.decode_layers = torch.nn.ModuleList(
            [torch.nn.Sequential(
                torch.nn.Linear(hd[i], hd[i - 1]),
                torch.nn.LayerNorm(hd[i - 1]),
                torch.nn.SiLU(),
                torch.nn.Dropout(0.0),
            ) for i in range(n - 1, 0, -1)]
        )
        self.output_layer = torch.nn.Linear(hd[0], embed_dim)

    def forward(self, x, t, c=None):
        t = _timesteps(t, self.time_embed_dim)
        x = self.input_layer(x)
        skips = []
        for i in range(self.num_layers - 1):
            skips.append(x)
            c_emb = self.encode_cond_embedding[i](c) if c is not None else 0
            x = x + self.encode_time_embedding[i](t) + c_emb
            x = self.encode_layers[i](x)
        for i in range(self.num_layers - 1):
            c_emb = self.decode_cond_embedding[i](c) if c is not None else 0
            x = x + self.decode_time_embedding[i](t) + c_emb
            x = self.decode_layers[i](x)
            x = x + skips[-1 - i]
        return self.output_layer(x)


@pytest.fixture(scope="module")
def oracle():
    torch.manual_seed(0)
    ref = _RefPriorUNet().eval()
    params = convert_diffusion_prior(
        {k: v.numpy() for k, v in ref.state_dict().items()}
    )
    model = DiffusionPriorUNet(embed_dim=EMBED, cond_dim=COND,
                               hidden_dims=DIMS, time_embed_dim=TDIM)
    return ref, model, params


def test_forward_parity_conditioned(oracle):
    ref, model, params = oracle
    rng = np.random.default_rng(1)
    x = rng.normal(size=(5, EMBED)).astype(np.float32)
    c = rng.normal(size=(5, COND)).astype(np.float32)
    t = np.array([0, 1, 10, 500, 999], np.int64)
    with torch.no_grad():
        want = ref(torch.tensor(x), torch.tensor(t), torch.tensor(c)).numpy()
    got = model.apply({"params": params}, jnp.asarray(x),
                      jnp.asarray(t, jnp.int32), jnp.asarray(c),
                      jnp.ones((5,), jnp.float32))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4, rtol=1e-4)


def test_forward_parity_unconditioned_via_mask(oracle):
    """cond_mask=0 must reproduce the reference's c=None branch exactly —
    that is what makes batched CFG equivalent to two reference calls."""
    ref, model, params = oracle
    rng = np.random.default_rng(2)
    x = rng.normal(size=(4, EMBED)).astype(np.float32)
    c = rng.normal(size=(4, COND)).astype(np.float32)
    t = np.array([3, 30, 300, 900], np.int64)
    with torch.no_grad():
        want = ref(torch.tensor(x), torch.tensor(t), None).numpy()
    got = model.apply({"params": params}, jnp.asarray(x),
                      jnp.asarray(t, jnp.int32), jnp.asarray(c),
                      jnp.zeros((4,), jnp.float32))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4, rtol=1e-4)


def test_converter_infers_stage_count(oracle):
    ref, _, params = oracle
    assert "enc_layer_1" in params and "enc_layer_2" not in params
    assert "dec_layer_1" in params and "dec_layer_2" not in params


def test_export_roundtrip_prior(oracle):
    """export_diffusion_prior is the exact inverse of the importer: every
    reference tensor reproduced bit-for-bit, AND the exported dict loads
    back into the torch reference module with an identical forward — the
    reverse-migration guarantee for trained priors."""
    from eeg_image_decode_tpu.models.diffusion_prior import (
        export_diffusion_prior,
    )

    ref, model, params = oracle
    sd0 = {k: v.numpy() for k, v in ref.state_dict().items()}
    sd1 = export_diffusion_prior(params)
    assert set(sd1) == set(sd0), set(sd1) ^ set(sd0)
    for k in sd0:
        np.testing.assert_array_equal(sd1[k], sd0[k], err_msg=k)

    ref2 = _RefPriorUNet()
    ref2.load_state_dict({k: torch.tensor(v) for k, v in sd1.items()})
    ref2.eval()
    rng = np.random.default_rng(5)
    x = torch.tensor(rng.normal(size=(3, EMBED)).astype(np.float32))
    c = torch.tensor(rng.normal(size=(3, COND)).astype(np.float32))
    t = torch.tensor([1, 400, 900])
    with torch.no_grad():
        np.testing.assert_array_equal(
            ref2(x, t, c).numpy(), ref(x, t, c).numpy()
        )
