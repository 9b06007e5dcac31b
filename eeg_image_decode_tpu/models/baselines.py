"""Baseline encoder zoo (ref ``Retrieval/contrast_retrieval.py:210-491``).

The reference pulls most of these from braindecode (torch); they are rebuilt
here natively in JAX from their published architectures with the exact
hyperparameters the reference passes. All map ``(B, 63, 250) → (B, 1024)``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from eeg_image_decode_tpu.models.layers import sinusoidal_position_embedding


def _safe_log(x: jax.Array, eps: float = 1e-6) -> jax.Array:
    return jnp.log(jnp.maximum(x, eps))


class MLPProjector(nn.Module):
    """The pure-MLP ``Projector`` baseline (ref ``contrast_retrieval.py:210-281``):
    alternating per-time and per-channel Dense blocks with LayerNorm/GELU/
    Dropout, output flattened to (B, 1024) and L2-normalized in forward."""

    n_channels: int = 63
    seq_len: int = 250
    h_c: int = 64
    h_l: int = 1024
    n_hidden: int = 2
    out_dim: int = 1024
    dropout: float = 0.25
    dtype: jnp.dtype = jnp.float32

    def _block(self, x, c_dim, l_dim, *, deterministic, name):
        # x: (B, C, L) → Dense over L, then Dense over C
        x = nn.LayerNorm(dtype=jnp.float32, name=f"{name}_ln_l")(x)
        x = nn.Dense(l_dim, dtype=self.dtype, name=f"{name}_fc_l")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        x = jnp.swapaxes(x, 1, 2)
        x = nn.LayerNorm(dtype=jnp.float32, name=f"{name}_ln_c")(x)
        x = nn.Dense(c_dim, dtype=self.dtype, name=f"{name}_fc_c")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return jnp.swapaxes(x, 1, 2)

    @nn.compact
    def __call__(self, x, subject_ids=None, *, deterministic: bool = True):
        del subject_ids
        x = x.astype(self.dtype)
        h = self._block(x, self.h_c, self.h_l, deterministic=deterministic,
                        name="input")
        for i in range(self.n_hidden):
            h = self._block(h, self.h_c, self.h_l, deterministic=deterministic,
                            name=f"hidden_{i}")
        h = self._block(h, 1, self.out_dim, deterministic=deterministic,
                        name="output")
        h = h.reshape(h.shape[0], -1)  # (B, 1*1024)
        return h / jnp.linalg.norm(h, axis=-1, keepdims=True).clip(1e-12)


class ShallowFBCSPNet(nn.Module):
    """Shallow ConvNet (Schirrmeister 2017) with the reference's params
    (``contrast_retrieval.py:286-313``): 20 temporal filters k=20, 20 spatial
    filters, square → mean-pool(25, stride 5) → log, dropout 0.5, final conv
    'auto' → 1024."""

    n_channels: int = 63
    n_times: int = 250
    out_dim: int = 1024
    n_filters: int = 20
    filter_time_length: int = 20
    pool_len: int = 25
    pool_stride: int = 5
    dropout: float = 0.5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, subject_ids=None, *, deterministic: bool = True):
        del subject_ids
        h = x[..., None].astype(self.dtype)  # (B, C, T, 1)
        h = nn.Conv(self.n_filters, kernel_size=(1, self.filter_time_length),
                    padding="VALID", dtype=self.dtype, name="conv_time")(h)
        h = nn.Conv(self.n_filters, kernel_size=(self.n_channels, 1),
                    padding="VALID", use_bias=False, dtype=self.dtype,
                    name="conv_spat")(h)
        h = nn.BatchNorm(use_running_average=deterministic, momentum=0.9,
                         dtype=jnp.float32, name="bn")(h)
        h = jnp.square(h)
        h = nn.avg_pool(h, (1, self.pool_len), strides=(1, self.pool_stride))
        h = _safe_log(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        t_rem = h.shape[2]
        h = nn.Conv(self.out_dim, kernel_size=(1, t_rem), padding="VALID",
                    dtype=self.dtype, name="conv_classifier")(h)
        return h.reshape(h.shape[0], self.out_dim)


class _ConformerBlock(nn.Module):
    d_model: int = 40
    n_heads: int = 1
    dropout: float = 0.5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool):
        a = nn.LayerNorm(dtype=jnp.float32)(x)
        a = nn.MultiHeadDotProductAttention(
            num_heads=self.n_heads, dtype=self.dtype, dropout_rate=self.dropout,
            deterministic=deterministic)(a, a)
        x = x + nn.Dropout(self.dropout, deterministic=deterministic)(a)
        y = nn.LayerNorm(dtype=jnp.float32)(x)
        y = nn.Dense(self.d_model * 4, dtype=self.dtype)(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dropout(self.dropout, deterministic=deterministic)(y)
        y = nn.Dense(self.d_model, dtype=self.dtype)(y)
        return x + nn.Dropout(self.dropout, deterministic=deterministic)(y)


class EEGConformer(nn.Module):
    """EEG-Conformer (Song 2022) with the reference's params
    (``contrast_retrieval.py:152-182``): 40 temporal filters k=10, pool 25/5,
    2 attention layers 1 head, fc head 1760→256→32→1024."""

    n_channels: int = 63
    n_times: int = 250
    out_dim: int = 1024
    n_filters: int = 40
    filter_time_length: int = 10
    pool_len: int = 25
    pool_stride: int = 5
    att_depth: int = 2
    att_heads: int = 1
    dropout: float = 0.25
    att_dropout: float = 0.5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, subject_ids=None, *, deterministic: bool = True):
        del subject_ids
        h = x[..., None].astype(self.dtype)
        h = nn.Conv(self.n_filters, kernel_size=(1, self.filter_time_length),
                    padding="VALID", dtype=self.dtype, name="conv_time")(h)
        h = nn.Conv(self.n_filters, kernel_size=(self.n_channels, 1),
                    padding="VALID", dtype=self.dtype, name="conv_spat")(h)
        h = nn.BatchNorm(use_running_average=deterministic, momentum=0.9,
                         dtype=jnp.float32, name="bn")(h)
        h = nn.elu(h)
        h = nn.avg_pool(h, (1, self.pool_len), strides=(1, self.pool_stride))
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.Conv(self.n_filters, kernel_size=(1, 1), dtype=self.dtype,
                    name="proj_conv")(h)
        tokens = h.reshape(h.shape[0], -1, self.n_filters)  # (B, T', 40)
        for i in range(self.att_depth):
            tokens = _ConformerBlock(
                d_model=self.n_filters, n_heads=self.att_heads,
                dropout=self.att_dropout, dtype=self.dtype, name=f"block_{i}",
            )(tokens, deterministic=deterministic)
        h = tokens.reshape(tokens.shape[0], -1)
        h = nn.Dense(256, dtype=self.dtype, name="fc1")(h)
        h = nn.elu(h)
        h = nn.Dropout(0.5, deterministic=deterministic)(h)
        h = nn.Dense(32, dtype=self.dtype, name="fc2")(h)
        h = nn.elu(h)
        h = nn.Dropout(0.3, deterministic=deterministic)(h)
        return nn.Dense(self.out_dim, dtype=self.dtype, name="fc_out")(h)


class EEGITNet(nn.Module):
    """EEG-ITNet (Salami 2022), reference params ``contrast_retrieval.py:187-205``:
    3 inception branches (temporal conv k=16/32/64, 2 filters each + depthwise
    spatial), pooled, 4 dilated temporal-conv blocks, pooled, dense to 1024."""

    n_channels: int = 63
    n_times: int = 250
    out_dim: int = 1024
    dropout: float = 0.4
    dtype: jnp.dtype = jnp.float32

    def _branch(self, h, k, name, deterministic):
        b = nn.Conv(2, kernel_size=(1, k), padding=((0, 0), (k // 2, k // 2)),
                    use_bias=False, dtype=self.dtype, name=f"{name}_time")(h)
        b = nn.BatchNorm(use_running_average=deterministic, momentum=0.9,
                         dtype=jnp.float32, name=f"{name}_bn1")(b)
        w = self.param(f"{name}_dw", nn.initializers.lecun_normal(),
                       (self.n_channels, 1, 1, 2))
        b = jax.lax.conv_general_dilated(
            b.astype(self.dtype), w.astype(self.dtype), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=2,
            preferred_element_type=jnp.float32).astype(self.dtype)
        b = nn.BatchNorm(use_running_average=deterministic, momentum=0.9,
                         dtype=jnp.float32, name=f"{name}_bn2")(b)
        return nn.elu(b)

    @nn.compact
    def __call__(self, x, subject_ids=None, *, deterministic: bool = True):
        del subject_ids
        h = x[..., None].astype(self.dtype)  # (B, C, T, 1)
        branches = [
            self._branch(h, k, f"branch{i}", deterministic)
            for i, k in enumerate((16, 32, 64))
        ]
        # branches have different time lengths from padding parity; crop to min
        t_min = min(b.shape[2] for b in branches)
        h = jnp.concatenate([b[:, :, :t_min] for b in branches], axis=-1)
        h = nn.avg_pool(h, (1, 4), strides=(1, 4))
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        ch = h.shape[-1]
        for i, dil in enumerate((1, 2, 4, 8)):
            y = nn.Conv(ch, kernel_size=(1, 4), kernel_dilation=(1, dil),
                        padding="SAME", use_bias=False, dtype=self.dtype,
                        name=f"tc{i}_conv1")(h)
            y = nn.BatchNorm(use_running_average=deterministic, momentum=0.9,
                             dtype=jnp.float32, name=f"tc{i}_bn1")(y)
            y = nn.elu(y)
            y = nn.Conv(ch, kernel_size=(1, 4), kernel_dilation=(1, dil),
                        padding="SAME", use_bias=False, dtype=self.dtype,
                        name=f"tc{i}_conv2")(y)
            y = nn.BatchNorm(use_running_average=deterministic, momentum=0.9,
                             dtype=jnp.float32, name=f"tc{i}_bn2")(y)
            y = nn.elu(y)
            h = h + y
        h = nn.Conv(14, kernel_size=(1, 1), dtype=self.dtype, name="reduce")(h)
        h = nn.avg_pool(h, (1, 4), strides=(1, 4))
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = h.reshape(h.shape[0], -1)
        return nn.Dense(self.out_dim, dtype=self.dtype, name="fc_out")(h)


class _TCNBlock(nn.Module):
    filters: int = 16
    kernel: int = 4
    dilation: int = 1
    dropout: float = 0.3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool):
        # x: (B, T, F); causal dilated convs
        pad = (self.kernel - 1) * self.dilation
        y = nn.Conv(self.filters, kernel_size=(self.kernel,),
                    kernel_dilation=(self.dilation,), padding=[(pad, 0)],
                    dtype=self.dtype, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=deterministic, momentum=0.9,
                         dtype=jnp.float32, name="bn1")(y)
        y = nn.elu(y)
        y = nn.Dropout(self.dropout, deterministic=deterministic)(y)
        y = nn.Conv(self.filters, kernel_size=(self.kernel,),
                    kernel_dilation=(self.dilation,), padding=[(pad, 0)],
                    dtype=self.dtype, name="conv2")(y)
        y = nn.BatchNorm(use_running_average=deterministic, momentum=0.9,
                         dtype=jnp.float32, name="bn2")(y)
        y = nn.elu(y)
        y = nn.Dropout(self.dropout, deterministic=deterministic)(y)
        if x.shape[-1] != self.filters:
            x = nn.Dense(self.filters, dtype=self.dtype, name="res_proj")(x)
        return nn.elu(x + y)


class ATCNet(nn.Module):
    """ATCNet (Altaheri 2022), reference params ``contrast_retrieval.py:318-357``:
    EEGNet-style conv block (8 filters k=32, depth-mult 2, pools 4 and 3) →
    5 sliding windows, each passed through 2-head attention + a 2-block TCN,
    outputs averaged (concat=False) → dense 1024."""

    n_channels: int = 63
    n_times: int = 250
    out_dim: int = 1024
    conv_filters: int = 8
    conv_kernel: int = 32
    depth_mult: int = 2
    pool1: int = 4
    pool2: int = 3
    conv_dropout: float = 0.3
    n_windows: int = 5
    att_heads: int = 2
    att_dropout: float = 0.5
    tcn_depth: int = 2
    tcn_kernel: int = 4
    tcn_filters: int = 16
    tcn_dropout: float = 0.3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, subject_ids=None, *, deterministic: bool = True):
        del subject_ids
        h = x[..., None].astype(self.dtype)  # (B, C, T, 1)
        k = self.conv_kernel
        h = nn.Conv(self.conv_filters, kernel_size=(1, k),
                    padding=((0, 0), (k // 2, k // 2)), use_bias=False,
                    dtype=self.dtype, name="conv_time")(h)
        h = nn.BatchNorm(use_running_average=deterministic, momentum=0.9,
                         dtype=jnp.float32, name="bn1")(h)
        ch = self.conv_filters * self.depth_mult
        w = self.param("spatial_dw", nn.initializers.lecun_normal(),
                       (self.n_channels, 1, 1, ch))
        h = jax.lax.conv_general_dilated(
            h.astype(self.dtype), w.astype(self.dtype), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.conv_filters,
            preferred_element_type=jnp.float32).astype(self.dtype)
        h = nn.BatchNorm(use_running_average=deterministic, momentum=0.9,
                         dtype=jnp.float32, name="bn2")(h)
        h = nn.elu(h)
        h = nn.avg_pool(h, (1, self.pool1), strides=(1, self.pool1))
        h = nn.Dropout(self.conv_dropout, deterministic=deterministic)(h)
        h = nn.Conv(ch, kernel_size=(1, 16), padding=((0, 0), (8, 8)),
                    use_bias=False, dtype=self.dtype, name="conv2")(h)
        h = nn.BatchNorm(use_running_average=deterministic, momentum=0.9,
                         dtype=jnp.float32, name="bn3")(h)
        h = nn.elu(h)
        h = nn.avg_pool(h, (1, self.pool2), strides=(1, self.pool2))
        h = nn.Dropout(self.conv_dropout, deterministic=deterministic)(h)
        seq = h.reshape(h.shape[0], -1, ch)  # (B, Tc, ch)
        tc = seq.shape[1]
        win_len = tc - self.n_windows + 1
        outs = []
        for i in range(self.n_windows):
            wnd = seq[:, i : i + win_len, :]
            a = nn.MultiHeadDotProductAttention(
                num_heads=self.att_heads, dtype=self.dtype,
                dropout_rate=self.att_dropout, deterministic=deterministic,
                name=f"attn_{i}")(wnd, wnd)
            wnd = nn.LayerNorm(dtype=jnp.float32, name=f"attn_ln_{i}")(wnd + a)
            t = wnd
            for d in range(self.tcn_depth):
                t = _TCNBlock(filters=self.tcn_filters, kernel=self.tcn_kernel,
                              dilation=2 ** d, dropout=self.tcn_dropout,
                              dtype=self.dtype, name=f"tcn_{i}_{d}")(
                    t, deterministic=deterministic)
            outs.append(t[:, -1, :])  # last time step
        h = jnp.mean(jnp.stack(outs, axis=0), axis=0)
        return nn.Dense(self.out_dim, dtype=self.dtype, name="fc_out")(h)


class _MetaConvBlock(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: (B, C, L) conv1d over L (ref ``contrast_retrieval.py:438-470``)
        res = nn.Conv(self.features, kernel_size=(1,), dtype=self.dtype,
                      name="res")(jnp.swapaxes(x, 1, 2))
        h = jnp.swapaxes(x, 1, 2)  # (B, L, C) with features last for nn.Conv
        for i in range(3):
            h = nn.Conv(self.features, kernel_size=(3,), padding="SAME",
                        dtype=self.dtype, name=f"conv{i+1}")(h)
            h = nn.gelu(h, approximate=False)
            h = nn.LayerNorm(dtype=jnp.float32, name=f"ln{i+1}")(h)
        return jnp.swapaxes(h + res, 1, 2)


class MetaEEG(nn.Module):
    """MetaEEG baseline (ref ``contrast_retrieval.py:362-491``): time-axis
    transformer (1 head), subject-wise linear, conv blocks, projection to
    num_latents, temporal aggregation, MLP clip head."""

    n_channels: int = 63
    seq_len: int = 250
    num_latents: int = 1024
    num_blocks: int = 1
    dropout: float = 0.25
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, subject_ids=None, *, deterministic: bool = True):
        del subject_ids
        h = jnp.swapaxes(x, 1, 2).astype(self.dtype)  # (B, T, C)
        pe = sinusoidal_position_embedding(self.seq_len, self.n_channels)
        h = h + jnp.asarray(pe, self.dtype)[None]
        a = nn.MultiHeadDotProductAttention(
            num_heads=1, dtype=self.dtype, name="attn")(h, h)
        h = nn.LayerNorm(dtype=jnp.float32, name="attn_ln")(h + a)
        h = jnp.swapaxes(h, 1, 2)  # (B, C, T)
        h = nn.Dense(self.seq_len, dtype=self.dtype, name="subject_linear")(h)
        for i in range(self.num_blocks):
            h = _MetaConvBlock(self.seq_len, dtype=self.dtype,
                               name=f"conv_block_{i}")(h)
        h = nn.Dense(self.num_latents, dtype=self.dtype, name="projection")(h)
        # temporal aggregation: Linear over the channel-token axis → 1
        h = jnp.swapaxes(h, 1, 2)  # (B, latents, C_tokens)
        h = nn.Dense(1, dtype=self.dtype, name="temporal_agg")(h)
        h = jnp.swapaxes(h, 1, 2)  # (B, 1, latents)
        h = nn.LayerNorm(dtype=jnp.float32, name="head_ln")(h)
        h = nn.Dense(self.num_latents, dtype=self.dtype, name="clip_head")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        return h.reshape(h.shape[0], -1)
