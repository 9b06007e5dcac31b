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


class GramStage1BN(nn.Module):
    """BatchNorm for the fused stage-1 output whose BATCH STATS are computed
    from the matmul INPUTS instead of reduction passes over the output.

    With ``y = x2 @ E`` ((B·C, T) × (T, P·F)), per-column sums and second
    moments are exact (bi)linear functions of the inputs:

        Σ_r y[r, c]  = (1ᵀ x2) @ E                      — one (T)·(T, P·F) matvec
        Σ_r y[r, c]² = Σ_t E[t, c] · (x2ᵀx2 @ E)[t, c]  — Gram (T, T) + one matmul

    so the per-feature mean/var over (B, C, P) cost small (T×T)/(T×P·F)
    operands instead of two reduction passes over the (B·C, P·F) activation
    (~372 MB fp32 at the flagship batch). The normalize itself stays a
    dtype-preserving elementwise op that XLA fuses into the neighbors.
    Gradients are exact: the stats are the same mathematical function of
    (x2, E), just evaluated without materializing y's reductions.

    Param/variable names match ``nn.BatchNorm`` (scale/bias; batch_stats
    mean/var), so checkpoints are tree-compatible with the flax variant.
    """

    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, y: jax.Array | None, x2: jax.Array, e: jax.Array, *,
                 use_running_average: bool,
                 n_pos: int | None = None,
                 return_affine: bool = False):
        """``y`` is the stage-1 output either as the 4-D (B, C, P, F)
        activation or still on the 2-D (B·C, P·F) matmul layout (pass
        ``n_pos`` then); the 2-D form lets the affine fuse ahead of the
        relayout. With ``return_affine`` the per-feature ``(mul, add)``
        fp32 vectors are returned instead of a normalized ``y`` (pass
        ``y=None``) — the caller folds them into the matmul itself
        (``bn1_impl='gramfold'``: E's columns absorb ``mul`` and ``add``
        becomes the matmul bias, so no normalize pass ever touches the
        activation)."""
        if y is None:
            assert n_pos is not None and return_affine
            p, f = n_pos, e.shape[-1] // n_pos
        elif y.ndim == 2:
            assert n_pos is not None
            p, f = n_pos, y.shape[-1] // n_pos
        else:
            p, f = y.shape[-2], y.shape[-1]
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((f,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((f,), jnp.float32)
        )
        scale = self.param("scale", nn.initializers.ones, (f,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (f,), jnp.float32)
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            n = x2.shape[0] * p
            x32 = x2.astype(jnp.float32)
            e32 = e.astype(jnp.float32)
            colsum = jnp.dot(x32.sum(axis=0), e32,
                             preferred_element_type=jnp.float32)
            gram = jnp.dot(x32.T, x32, preferred_element_type=jnp.float32)
            m2_col = jnp.sum(
                jnp.dot(gram, e32, preferred_element_type=jnp.float32) * e32,
                axis=0,
            )
            mean = colsum.reshape(p, f).sum(axis=0) / n
            var = jnp.maximum(
                m2_col.reshape(p, f).sum(axis=0) / n - mean * mean, 0.0
            )
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * jax.lax.stop_gradient(mean)
                ra_var.value = m * ra_var.value + (1 - m) * jax.lax.stop_gradient(var)
        mul = scale * jax.lax.rsqrt(var + self.epsilon)
        add = bias - mean * mul
        if return_affine:
            return mul, add
        if y.ndim == 2:
            # normalize on the 2-D matmul output (columns c = p·F + f): the
            # per-feature factors tile across the P positions, so the whole
            # affine fuses into the matmul epilogue before the 4-D relayout
            mul = jnp.tile(mul, p)
            add = jnp.tile(add, p)
        return y * mul.astype(y.dtype) + add.astype(y.dtype)


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
    #: 'flax' (nn.BatchNorm), 'gram' (stats from the stage-1 matmul inputs
    #: via :class:`GramStage1BN`), 'gram2d' (gram stats + normalize/ELU on
    #: the 2-D matmul layout), or 'gramfold' (gram stats folded INTO the
    #: stage-1 matmul: E columns absorb the scale, the shift rides as the
    #: matmul bias — no normalize pass over the activation at all); the
    #: gram variants require the fused path
    bn1_impl: str = "flax"
    dtype: jnp.dtype = jnp.float32

    def _use_fused(self) -> bool:
        if self.fused_stage1 == "auto":
            import jax

            return jax.default_backend() == "tpu"
        return bool(self.fused_stage1)

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        *,
        deterministic: bool,
        dropout_mask: jax.Array | None = None,
    ) -> jax.Array:
        gram_bn = self._use_fused() and self.bn1_impl in (
            "gram", "gram2d", "gramfold"
        )
        if gram_bn:
            # same math as tsconv_stage1(impl='matmul'), kept open so the
            # matmul inputs (x2, E) feed GramStage1BN's input-side stats
            from eeg_image_decode_tpu.ops.tsconv import (
                _out_positions,
                expand_folded_kernel,
                fold_pool_into_kernel,
            )

            w = self.param(
                "temporal_conv_kernel",
                nn.initializers.lecun_normal(),
                (self.temporal_kernel, self.filters),
            )
            b_, c_, t_ = x.shape
            w_tilde = fold_pool_into_kernel(
                w.astype(self.dtype), self.pool_size
            )
            e = expand_folded_kernel(
                w_tilde, t_, self.pool_stride
            ).astype(self.dtype)
            n_pos = _out_positions(
                t_, self.temporal_kernel + self.pool_size - 1,
                self.pool_stride,
            )
            x2 = x.reshape(b_ * c_, t_).astype(self.dtype)
            if self.bn1_impl == "gramfold":
                # stats first (small Gram matmuls on x2/E), then fold the
                # affine into the big matmul: columns of E absorb `mul`,
                # `add` rides as the bias in the epilogue — the stage-1
                # output comes out of the MXU already normalized
                mul, add = GramStage1BN(
                    momentum=0.9, dtype=jnp.float32, name="bn1"
                )(None, x2, e, use_running_average=deterministic,
                  n_pos=n_pos, return_affine=True)
                mul_col = jnp.tile(mul, n_pos)
                add_col = jnp.tile(add, n_pos)
                e_eff = (e.astype(jnp.float32)
                         * mul_col[None, :]).astype(self.dtype)
                y = jnp.dot(x2, e_eff, preferred_element_type=jnp.float32)
                y = y + add_col[None, :]
                x = y.reshape(
                    b_, c_, n_pos, self.filters
                ).astype(self.dtype)
                x = nn.elu(x)
            elif self.bn1_impl == "gram2d":
                y = jnp.dot(x2, e, preferred_element_type=jnp.float32)
                # BN + ELU while still on the matmul layout: the affine and
                # the activation fuse into the matmul epilogue, and the 4-D
                # relayout moves bf16 instead of fp32
                y = GramStage1BN(momentum=0.9, dtype=jnp.float32,
                                 name="bn1")(
                    y, x2, e, use_running_average=deterministic,
                    n_pos=n_pos,
                )
                y = nn.elu(y)
                x = y.reshape(b_, c_, n_pos, self.filters).astype(self.dtype)
            else:  # 'gram': BN applied on the 4-D activation below
                y = jnp.dot(x2, e, preferred_element_type=jnp.float32)
                x = y.reshape(b_, c_, n_pos, self.filters).astype(self.dtype)
        elif self._use_fused():
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
        if self.bn1_impl not in ("gram2d", "gramfold") or not self._use_fused():
            if gram_bn:
                x = GramStage1BN(momentum=0.9, dtype=self.dtype, name="bn1")(
                    x, x2, e, use_running_average=deterministic
                )
            else:
                x = nn.BatchNorm(
                    use_running_average=deterministic, momentum=0.9,
                    dtype=self.dtype, name="bn1",
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
        # ref ATMS_retrieval.py:110: Dropout(0.5) closes the tsconv stack,
        # before the 1x1 projection conv. ``dropout_mask`` injects a
        # pre-drawn pre-scaled keep-mask (dropout-placement parity hook).
        if dropout_mask is not None:
            x = x * dropout_mask.astype(x.dtype)
        else:
            x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        x = nn.Conv(self.emb_size, kernel_size=(1, 1), dtype=self.dtype,
                    name="proj_conv")(x)
        # (B, 1, n_tokens, emb) → (B, n_tokens, emb)
        return x.reshape(x.shape[0], -1, self.emb_size)


class _DenseParams(nn.Module):
    """Raw kernel/bias at the same tree path ``nn.Dense`` would use, so the
    fused-kernel and XLA paths share one checkpoint layout (same pattern as
    ``models/atm_s.py``)."""

    d_in: int
    d_out: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (self.d_in, self.d_out))
        b = self.param("bias", nn.initializers.zeros, (self.d_out,))
        return k, b


class _LNParams(nn.Module):
    dim: int

    @nn.compact
    def __call__(self):
        s = self.param("scale", nn.initializers.ones, (self.dim,))
        b = self.param("bias", nn.initializers.zeros, (self.dim,))
        return s, b


class ProjectionHead(nn.Module):
    """Flatten → Dense → residual(GELU→Dense→Dropout) → LayerNorm
    (ref ``Proj_eeg``, ``Retrieval/ATMS_retrieval.py:157-167``).

    ``fused=True`` runs the whole head as one VMEM-resident Pallas kernel
    (``ops/projection.py``: both directions native, in-kernel PRNG dropout,
    tanh GELU — |Δ| ≲ 1e-3 vs the XLA path's exact erf). Measured on chip
    (scripts/bench_projection.py, interleaved A/B ×3): the XLA chain wins
    94.4k vs 95.3k samples/s — these matmuls are already MXU-bound and XLA
    fuses the elementwise tail, so 'auto' resolves to False (docs/PERF.md
    ledger)."""

    proj_dim: int = 1024
    dropout: float = 0.5
    dtype: jnp.dtype = jnp.float32
    #: False | True | 'auto' — 'auto' resolves to False per the on-chip A/B
    #: (scripts/bench_projection.py, docs/PERF.md): fused ~94.4k vs XLA
    #: ~95.3k samples/s on the flagship step
    fused: bool | str = "auto"

    def _use_fused(self) -> bool:
        if self.fused == "auto":
            return False  # measured: XLA chain wins (docs/PERF.md)
        return bool(self.fused)

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        *,
        deterministic: bool,
        dropout_mask: jax.Array | None = None,
    ) -> jax.Array:
        import jax as _jax

        dt = self.dtype
        x = x.reshape(x.shape[0], -1).astype(dt)
        wi, bi = _DenseParams(x.shape[-1], self.proj_dim, name="in_proj")()
        wr, br = _DenseParams(self.proj_dim, self.proj_dim, name="res_proj")()
        ln_s, ln_b = _LNParams(self.proj_dim, name="ln")()

        no_dropout = deterministic or self.dropout == 0.0
        on_tpu = _jax.default_backend() == "tpu"
        if self._use_fused() and dropout_mask is None and (
            no_dropout or on_tpu
        ):
            from eeg_image_decode_tpu.ops.projection import (
                fused_projection_head,
            )

            params = {"wi": wi, "bi": bi, "wr": wr, "br": br,
                      "ln_s": ln_s, "ln_b": ln_b}
            params = jax.tree_util.tree_map(lambda p: p.astype(dt), params)
            seed = None
            p_drop = 0.0
            if not no_dropout:
                seed = jax.random.randint(
                    self.make_rng("dropout"), (), 0, 2**31 - 1, jnp.int32
                )
                p_drop = self.dropout
            return fused_projection_head(
                x, params, None, p_drop, not on_tpu, seed
            )

        def dense(h, w, b):
            return jnp.dot(h, w.astype(dt)) + b.astype(dt)

        x = dense(x, wi, bi)
        h = nn.gelu(x, approximate=False)
        h = dense(h, wr, br)
        # ref Proj_eeg (ATMS_retrieval.py:157-167): dropout after the second
        # Linear, inside the residual branch
        if dropout_mask is not None:
            h = h * dropout_mask.astype(h.dtype)
        else:
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        # LayerNorm in fp32, fast-variance — identical math to
        # nn.LayerNorm(dtype=jnp.float32) over the params above
        r = (x + h).astype(jnp.float32)
        mu = jnp.mean(r, axis=-1, keepdims=True)
        var = jnp.maximum(
            jnp.mean(jnp.square(r), axis=-1, keepdims=True) - mu * mu, 0.0
        )
        xhat = (r - mu) * jax.lax.rsqrt(var + 1e-6)
        return xhat * ln_s.astype(jnp.float32) + ln_b.astype(jnp.float32)


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
    def __call__(self, x: jax.Array, *, deterministic: bool,
                 dropout_mask: jax.Array | None = None) -> jax.Array:
        x = nn.Dense(self.features, dtype=self.dtype)(x)
        x = nn.LayerNorm(dtype=jnp.float32)(x)
        x = nn.silu(x)
        if dropout_mask is not None:
            # externally drawn pre-scaled keep-mask — the placement-parity
            # hook (tests/test_prior_dropout_placement.py), same mechanism
            # as ATMS's dropout_masks
            return x * dropout_mask.astype(x.dtype)
        return nn.Dropout(self.dropout, deterministic=deterministic)(x)
