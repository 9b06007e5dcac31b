"""Shared building blocks for the EEG encoder zoo.

The tsconv + projector pair below is the common trunk of ATM-S and NICE
(ref ``Retrieval/ATMS_retrieval.py:97-167`` and
``Retrieval/contrast_retrieval.py:37-103`` — both are the same ShallowNet
derivative). Layout is TPU-friendly NHWC so XLA tiles the convolutions
straight onto the MXU; see ``ops/tsconv.py`` for the fused Pallas kernel that
replaces the first conv+pool stage on the hot path.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn


def sinusoidal_position_embedding(n_positions: int, d_model: int) -> np.ndarray:
    """Interleaved sin/cos table (ref ``models/subject_layers/Embed.py:8-26``)."""
    position = np.arange(n_positions, dtype=np.float64)[:, None]
    div_term = np.exp(
        np.arange(0, d_model, 2, dtype=np.float64) * -(np.log(10000.0) / d_model)
    )
    pe = np.zeros((n_positions, d_model), dtype=np.float64)
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term[: d_model // 2])
    return pe.astype(np.float32)


class TSConv(nn.Module):
    """Temporal→spatial conv stack (ShallowNet-style ``tsconv``).

    (B, C=63, T) → (B, n_tokens, emb_size) tokens then flattened by callers.
    Stage 1: temporal conv (1, k_t) VALID + avg-pool (1, pool) stride s +
    BN + ELU. Stage 2: spatial conv across all 63 electrodes + BN + ELU +
    dropout. Stage 3: 1x1 conv to ``emb_size``.
    Ref ``Retrieval/ATMS_retrieval.py:97-125``.
    """

    filters: int = 40
    temporal_kernel: int = 25
    pool_size: int = 51
    pool_stride: int = 5
    emb_size: int = 40
    dropout: float = 0.5
    spatial_extent: int = 63  # electrodes covered by the spatial conv
    #: fuse conv+avg-pool into one dense MXU matmul (see ops/tsconv.py —
    #: fastest of the three formulations); 'auto' → on for TPU, off elsewhere
    fused_stage1: bool | str = "auto"
    dtype: jnp.dtype = jnp.float32

    def _use_fused(self) -> bool:
        if self.fused_stage1 == "auto":
            import jax

            return jax.default_backend() == "tpu"
        return bool(self.fused_stage1)

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool) -> jax.Array:
        if self._use_fused():
            from eeg_image_decode_tpu.ops.tsconv import tsconv_stage1

            # no conv bias ahead of BatchNorm (see below)
            w = self.param(
                "temporal_conv_kernel",
                nn.initializers.lecun_normal(),
                (self.temporal_kernel, self.filters),
            )
            x = tsconv_stage1(
                x.astype(self.dtype),
                w.astype(self.dtype),
                pool_size=self.pool_size,
                stride=self.pool_stride,
            )  # (B, C, P, F) — same layout the unfused path produces
        else:
            # (B, C, T) → NHWC (B, C, T, 1)
            x = x[..., None].astype(self.dtype)
            # no conv bias ahead of BatchNorm: BN's mean-subtraction makes it
            # a functional no-op whose ~0 gradient only injects optimizer noise
            x = nn.Conv(
                self.filters,
                kernel_size=(1, self.temporal_kernel),
                padding="VALID",
                use_bias=False,
                dtype=self.dtype,
                name="temporal_conv",
            )(x)
            x = nn.avg_pool(
                x, window_shape=(1, self.pool_size), strides=(1, self.pool_stride)
            )
        # BN activations stay in the compute dtype — flax always promotes the
        # mean/var REDUCTIONS to fp32 (force_float32_reductions) and keeps
        # running stats fp32, so only storage precision changes. Materializing
        # the (B, 63, P, F) activation in fp32 here cost ~35% of the train
        # step on v5e (bf16→fp32 copies + fp32 layout copies, seen in the
        # profiler); elementwise normalize fuses either way.
        x = nn.BatchNorm(
            use_running_average=deterministic, momentum=0.9, dtype=self.dtype,
            name="bn1",
        )(x)
        x = nn.elu(x)
        x = nn.Conv(
            self.filters,
            kernel_size=(self.spatial_extent, 1),
            padding="VALID",
            use_bias=False,
            dtype=self.dtype,
            name="spatial_conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=deterministic, momentum=0.9, dtype=self.dtype,
            name="bn2",
        )(x)
        x = nn.elu(x)
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        x = nn.Conv(self.emb_size, kernel_size=(1, 1), dtype=self.dtype,
                    name="proj_conv")(x)
        # (B, 1, n_tokens, emb) → (B, n_tokens, emb)
        return x.reshape(x.shape[0], -1, self.emb_size)


class ProjectionHead(nn.Module):
    """Flatten → Dense → residual(GELU→Dense→Dropout) → LayerNorm
    (ref ``Proj_eeg``, ``Retrieval/ATMS_retrieval.py:157-167``)."""

    proj_dim: int = 1024
    dropout: float = 0.5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool) -> jax.Array:
        x = x.reshape(x.shape[0], -1).astype(self.dtype)
        x = nn.Dense(self.proj_dim, dtype=self.dtype, name="in_proj")(x)
        h = nn.gelu(x, approximate=False)
        h = nn.Dense(self.proj_dim, dtype=self.dtype, name="res_proj")(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        x = x + h
        return nn.LayerNorm(dtype=jnp.float32, name="ln")(x)


class LogitScale(nn.Module):
    """Trainable temperature. Reference quirk preserved: the raw parameter
    (init ln(1/0.07) ≈ 2.659) multiplies the logits directly — it is never
    exponentiated (``Retrieval/ATMS_retrieval.py:179,227-229``). Set
    ``apply_exp=True`` for standard CLIP behavior."""

    init_value: float = float(np.log(1 / 0.07))
    apply_exp: bool = False

    @nn.compact
    def __call__(self) -> jax.Array:
        s = self.param(
            "logit_scale", lambda _: jnp.asarray(self.init_value, jnp.float32)
        )
        return jnp.exp(s) if self.apply_exp else s


class MLPBlock(nn.Module):
    """Dense→LayerNorm→activation→Dropout, the recurring hidden block of the
    diffusion prior (ref ``Generation/diffusion_prior.py:135-161``)."""

    features: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool) -> jax.Array:
        x = nn.Dense(self.features, dtype=self.dtype)(x)
        x = nn.LayerNorm(dtype=jnp.float32)(x)
        x = nn.silu(x)
        return nn.Dropout(self.dropout, deterministic=deterministic)(x)
