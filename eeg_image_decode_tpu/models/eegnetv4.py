"""EEGNetV4 encoder, re-implemented natively in JAX.

The reference wraps ``braindecode.models.EEGNetv4`` with the non-default
hyperparameters F1=8, D=20, F2=160, kernel_length=4, pool_mode='mean',
drop_prob=0.25, n_classes=1024 (``Retrieval/contrast_retrieval.py:122-147``).
Braindecode is a torch dependency, so the architecture (EEGNet v4, Lawhern et
al. 2018) is rebuilt here from its published structure:

  temporal conv (1, k) SAME-ish pad k//2 → BN
  → depthwise spatial conv (C, 1), ch-mult D, max-norm 1 → BN → ELU
  → avg-pool (1, 4) → dropout
  → separable conv [(1, 16) depthwise pad 8 → (1, 1) pointwise F2] → BN → ELU
  → avg-pool (1, 8) → dropout
  → final conv (1, T_rem) → (B, out_dim)

All convs map onto the MXU as batched matmuls; the whole net is a single
XLA fusion chain (no host syncs).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


def _max_norm(w: jax.Array, max_norm: float, axes: tuple[int, ...]) -> jax.Array:
    """Project conv weights onto the L2 ball per output filter (the
    ``Conv2dWithConstraint`` renorm braindecode applies every forward)."""
    norm = jnp.sqrt(jnp.sum(jnp.square(w), axis=axes, keepdims=True))
    return w * jnp.minimum(1.0, max_norm / jnp.maximum(norm, 1e-12))


class EEGNetV4(nn.Module):
    n_channels: int = 63
    n_times: int = 250
    out_dim: int = 1024
    f1: int = 8
    depth_mult: int = 20  # D
    f2: int = 160
    kernel_length: int = 4
    sep_kernel_length: int = 16
    pool1: int = 4
    pool2: int = 8
    dropout: float = 0.25
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        subject_ids: jax.Array | None = None,
        *,
        deterministic: bool = True,
    ) -> jax.Array:
        del subject_ids
        # (B, C, T) → NHWC (B, C, T, 1)
        h = x[..., None].astype(self.dtype)

        # block 1: temporal conv, torch padding (0, k//2)
        pad = self.kernel_length // 2
        h = nn.Conv(
            self.f1,
            kernel_size=(1, self.kernel_length),
            padding=((0, 0), (pad, pad)),
            use_bias=False,
            dtype=self.dtype,
            name="temporal_conv",
        )(h)
        h = nn.BatchNorm(
            use_running_average=deterministic, momentum=0.99, epsilon=1e-3,
            dtype=jnp.float32, name="bn1",
        )(h)

        # depthwise spatial conv across all electrodes with max-norm 1
        w = self.param(
            "spatial_depthwise_kernel",
            nn.initializers.lecun_normal(),
            (self.n_channels, 1, 1, self.f1 * self.depth_mult),
        )
        w = _max_norm(w, 1.0, axes=(0, 1, 2))
        h = jax.lax.conv_general_dilated(
            h.astype(self.dtype),
            w.astype(self.dtype),
            window_strides=(1, 1),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.f1,
            preferred_element_type=jnp.float32,
        ).astype(self.dtype)
        h = nn.BatchNorm(
            use_running_average=deterministic, momentum=0.99, epsilon=1e-3,
            dtype=jnp.float32, name="bn2",
        )(h)
        h = nn.elu(h)
        h = nn.avg_pool(h, (1, self.pool1), strides=(1, self.pool1))
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)

        # block 2: separable conv = depthwise temporal + pointwise
        ch = self.f1 * self.depth_mult
        sep_pad = self.sep_kernel_length // 2
        wd = self.param(
            "sep_depthwise_kernel",
            nn.initializers.lecun_normal(),
            (1, self.sep_kernel_length, 1, ch),
        )
        h = jax.lax.conv_general_dilated(
            h.astype(self.dtype),
            wd.astype(self.dtype),
            window_strides=(1, 1),
            padding=((0, 0), (sep_pad, sep_pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=ch,
            preferred_element_type=jnp.float32,
        ).astype(self.dtype)
        h = nn.Conv(
            self.f2, kernel_size=(1, 1), use_bias=False, dtype=self.dtype,
            name="pointwise_conv",
        )(h)
        h = nn.BatchNorm(
            use_running_average=deterministic, momentum=0.99, epsilon=1e-3,
            dtype=jnp.float32, name="bn3",
        )(h)
        h = nn.elu(h)
        h = nn.avg_pool(h, (1, self.pool2), strides=(1, self.pool2))
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)

        # final conv over the remaining time extent ('auto' length), → out_dim
        t_rem = h.shape[2]
        h = nn.Conv(
            self.out_dim,
            kernel_size=(1, t_rem),
            padding="VALID",
            dtype=self.dtype,
            name="final_conv",
        )(h)
        return h.reshape(h.shape[0], self.out_dim)
