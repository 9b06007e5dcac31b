"""Diffusion prior: EEG embedding → CLIP image-embedding space.

Rebuilds ``Generation/diffusion_prior.py:12-203``:

- ``DiffusionPriorMLP`` — the flat resblock variant (``DiffusionPrior``,
  ref ``:12-89``).
- ``DiffusionPriorUNet`` — the one actually used (ref ``:92-203``): an MLP
  "U-Net" over widths (1024, 512, 256, 128, 64); every encoder/decoder stage
  injects a stage-specific timestep embedding + conditional projection
  additively, decoder stages add U-skips from the encoder.

Time embedding matches diffusers' ``Timesteps(512, flip_sin_to_cos=True,
downscale_freq_shift=0)`` + per-stage ``TimestepEmbedding`` (Linear→SiLU→
Linear), which the reference imports (``:8,29,110``).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from eeg_image_decode_tpu.models.layers import MLPBlock


def timestep_embedding(
    t: jax.Array, dim: int, *, max_period: float = 10000.0
) -> jax.Array:
    """Sinusoidal features, diffusers layout: [cos | sin] halves
    (flip_sin_to_cos=True, downscale_freq_shift=0)."""
    half = dim // 2
    freqs = jnp.exp(
        -np.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


class TimestepMLP(nn.Module):
    """diffusers ``TimestepEmbedding``: Linear → SiLU → Linear."""

    out_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, t_feats: jax.Array) -> jax.Array:
        h = nn.Dense(self.out_dim, dtype=self.dtype, name="fc1")(t_feats)
        h = nn.silu(h)
        return nn.Dense(self.out_dim, dtype=self.dtype, name="fc2")(h)


class DiffusionPriorUNet(nn.Module):
    embed_dim: int = 1024
    cond_dim: int = 1024
    hidden_dims: tuple[int, ...] = (1024, 512, 256, 128, 64)
    time_embed_dim: int = 512
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        t: jax.Array,
        cond: jax.Array | None = None,
        cond_mask: jax.Array | None = None,
        *,
        deterministic: bool = True,
        dropout_masks: dict | None = None,
    ) -> jax.Array:
        """``cond_mask`` (B,) ∈ {0,1} gates the conditional injections per
        sample — mask 0 is *exactly* the reference's ``c=None`` branch (the
        cond Linear, bias included, contributes nothing), which makes
        classifier-free guidance a single batched forward and the 10%
        cond-dropout (ref ``:303-305``) a traced op instead of Python
        branching.

        ``dropout_masks``: optional externally drawn pre-scaled keep-masks
        (keys ``enc_{i}``/``dec_{j}``) for the 2(n-1) Dropout sites the
        reference places after each hidden block's activation
        (``diffusion_prior.py:140,159``) — the placement-parity test hook
        (PRNGs are framework-incompatible; placement is pinnable)."""
        dims = self.hidden_dims
        n = len(dims)
        t_feats = timestep_embedding(t, self.time_embed_dim)
        if cond is not None and cond_mask is not None:
            gate = cond_mask.astype(self.dtype)[:, None]
        else:
            gate = None

        def inject_cond(h, width, name):
            if cond is None:
                return h
            proj = nn.Dense(width, dtype=self.dtype, name=name)(
                cond.astype(self.dtype)
            )
            if gate is not None:
                proj = proj * gate
            return h + proj

        x = x.astype(self.dtype)
        h = nn.Dense(dims[0], dtype=self.dtype, name="input_dense")(x)
        h = nn.LayerNorm(dtype=jnp.float32, name="input_ln")(h)
        h = nn.silu(h)

        skips = []
        for i in range(n - 1):
            skips.append(h)
            t_emb = TimestepMLP(dims[i], dtype=self.dtype,
                                name=f"enc_time_{i}")(t_feats)
            h = inject_cond(h + t_emb, dims[i], f"enc_cond_{i}")
            h = MLPBlock(dims[i + 1], dropout=self.dropout, dtype=self.dtype,
                         name=f"enc_layer_{i}")(
                h, deterministic=deterministic,
                dropout_mask=(dropout_masks or {}).get(f"enc_{i}"))

        for j, i in enumerate(range(n - 1, 0, -1)):
            t_emb = TimestepMLP(dims[i], dtype=self.dtype,
                                name=f"dec_time_{j}")(t_feats)
            h = inject_cond(h + t_emb, dims[i], f"dec_cond_{j}")
            h = MLPBlock(dims[i - 1], dropout=self.dropout, dtype=self.dtype,
                         name=f"dec_layer_{j}")(
                h, deterministic=deterministic,
                dropout_mask=(dropout_masks or {}).get(f"dec_{j}"))
            h = h + skips[-1 - j]

        return nn.Dense(self.embed_dim, dtype=self.dtype, name="output_dense")(h)


def _pt_linear(sd: dict, p: str) -> dict:
    return {"kernel": np.asarray(sd[f"{p}.weight"], np.float32).T,
            "bias": np.asarray(sd[f"{p}.bias"], np.float32)}


def _pt_ln(sd: dict, p: str) -> dict:
    return {"scale": np.asarray(sd[f"{p}.weight"], np.float32),
            "bias": np.asarray(sd[f"{p}.bias"], np.float32)}


def convert_diffusion_prior(sd: dict, *, n_stages: int | None = None) -> dict:
    """Reference ``diffusion_prior.pt`` state dict → :class:`DiffusionPriorUNet`
    params.

    Torch layout (ref ``Generation/diffusion_prior.py:92-203``):
    ``input_layer.{0,1}`` Linear+LayerNorm, per-stage
    ``encode_time_embedding.{i}.linear_{1,2}`` (diffusers
    ``TimestepEmbedding``), ``encode_cond_embedding.{i}`` Linear,
    ``encode_layers.{i}.{0,1}`` Linear+LayerNorm, the ``decode_*`` mirrors,
    and ``output_layer``. ``time_proj`` (``Timesteps``) has no parameters and
    is matched by :func:`timestep_embedding`.
    """
    sd = {k: np.asarray(v) for k, v in sd.items()}
    if n_stages is None:
        n_stages = sum(
            1 for k in sd if k.startswith("encode_layers.")
            and k.endswith(".0.weight")
        )
    params = {
        "input_dense": _pt_linear(sd, "input_layer.0"),
        "input_ln": _pt_ln(sd, "input_layer.1"),
        "output_dense": _pt_linear(sd, "output_layer"),
    }
    for side, enc in (("enc", "encode"), ("dec", "decode")):
        for i in range(n_stages):
            params[f"{side}_time_{i}"] = {
                "fc1": _pt_linear(sd, f"{enc}_time_embedding.{i}.linear_1"),
                "fc2": _pt_linear(sd, f"{enc}_time_embedding.{i}.linear_2"),
            }
            params[f"{side}_cond_{i}"] = _pt_linear(
                sd, f"{enc}_cond_embedding.{i}")
            params[f"{side}_layer_{i}"] = {
                "Dense_0": _pt_linear(sd, f"{enc}_layers.{i}.0"),
                "LayerNorm_0": _pt_ln(sd, f"{enc}_layers.{i}.1"),
            }
    return params


def export_diffusion_prior(params: dict) -> dict:
    """:class:`DiffusionPriorUNet` params → reference ``diffusion_prior.pt``
    state-dict layout (numpy values) — the exact inverse of
    :func:`convert_diffusion_prior` (every tensor a transpose/copy), so a
    prior trained HERE loads straight into the reference's
    ``Pipe(diffusion_prior=DiffusionPriorUNet(...))`` via
    ``load_state_dict`` (``Generation/diffusion_prior.py:92-203``)."""
    import jax

    params = jax.tree_util.tree_map(np.asarray, params)
    sd: dict = {}

    def lin(p: str, leaf: dict):
        sd[f"{p}.weight"] = np.ascontiguousarray(leaf["kernel"].T)
        sd[f"{p}.bias"] = np.asarray(leaf["bias"])

    def ln(p: str, leaf: dict):
        sd[f"{p}.weight"] = np.asarray(leaf["scale"])
        sd[f"{p}.bias"] = np.asarray(leaf["bias"])

    lin("input_layer.0", params["input_dense"])
    ln("input_layer.1", params["input_ln"])
    lin("output_layer", params["output_dense"])
    n_stages = sum(1 for k in params if k.startswith("enc_layer_"))
    for side, enc in (("enc", "encode"), ("dec", "decode")):
        for i in range(n_stages):
            lin(f"{enc}_time_embedding.{i}.linear_1",
                params[f"{side}_time_{i}"]["fc1"])
            lin(f"{enc}_time_embedding.{i}.linear_2",
                params[f"{side}_time_{i}"]["fc2"])
            lin(f"{enc}_cond_embedding.{i}", params[f"{side}_cond_{i}"])
            lin(f"{enc}_layers.{i}.0",
                params[f"{side}_layer_{i}"]["Dense_0"])
            ln(f"{enc}_layers.{i}.1",
               params[f"{side}_layer_{i}"]["LayerNorm_0"])
    return sd


class DiffusionPriorMLP(nn.Module):
    """Flat residual-MLP variant (ref ``DiffusionPrior``, :12-89)."""

    embed_dim: int = 1024
    cond_dim: int = 1024
    hidden_dim: int = 1024
    layers_per_block: int = 4
    time_embed_dim: int = 512
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, t, cond=None, *, deterministic: bool = True):
        t_feats = timestep_embedding(t, self.time_embed_dim)
        t_emb = TimestepMLP(self.hidden_dim, dtype=self.dtype,
                            name="time_mlp")(t_feats)
        c_emb = (
            nn.Dense(self.hidden_dim, dtype=self.dtype, name="cond_dense")(
                cond.astype(self.dtype)
            )
            if cond is not None
            else 0.0
        )
        h = nn.Dense(self.hidden_dim, dtype=self.dtype, name="input_dense")(
            x.astype(self.dtype)
        )
        h = nn.LayerNorm(dtype=jnp.float32, name="input_ln")(h)
        h = nn.silu(h)
        for i in range(self.layers_per_block):
            h = h + t_emb + c_emb
            h = (
                MLPBlock(self.hidden_dim, dropout=self.dropout,
                         dtype=self.dtype, name=f"block_{i}")(
                    h, deterministic=deterministic
                )
                + h
            )
        return nn.Dense(self.embed_dim, dtype=self.dtype, name="output_dense")(h)
