"""Subject-conditioned embedding of EEG channel tokens.

Rebuilds ``models/subject_layers/Embed.py:109-162`` (``SubjectEmbedding`` +
``DataEmbedding``): each of the C electrode channels becomes a token embedding
of its full time course, a sinusoidal positional code is added, and a learned
per-subject token is prepended so one model can serve many subjects.

TPU notes: the joint-train per-subject value embedding — a torch ModuleDict
indexed by a Python loop over the batch (``Embed.py:142-144``, a host-side
per-sample dispatch) — becomes a single gather of per-subject weight tensors
followed by one batched einsum, which XLA maps onto the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from eeg_image_decode_tpu.models.layers import sinusoidal_position_embedding


class SubjectToken(nn.Module):
    """Per-subject learned token with a shared fallback
    (ref ``Embed.py:109-121``). The reference falls back to the shared token
    for the whole batch whenever *any* id is out of range (its subjects are
    numbered 1..10 against a table of size 10, so ``sub-10`` always hits the
    fallback) — reproduced bit-for-bit, but as a traced select."""

    num_subjects: int
    d_model: int

    @nn.compact
    def __call__(self, subject_ids: jax.Array) -> jax.Array:
        table = self.param(
            "subject_embedding",
            nn.initializers.normal(1.0),
            (self.num_subjects, self.d_model),
        )
        shared = self.param(
            "shared_embedding", nn.initializers.normal(1.0), (1, self.d_model)
        )
        any_oor = jnp.any(subject_ids >= self.num_subjects)
        safe_ids = jnp.clip(subject_ids, 0, self.num_subjects - 1)
        per_subject = table[safe_ids]  # (B, d_model)
        tok = jnp.where(any_oor, shared, per_subject)
        return tok[:, None, :]  # (B, 1, d_model)


class ChannelTokenEmbedding(nn.Module):
    """DataEmbedding for channel-token transformers (ref ``Embed.py:124-162``).

    (B, C, T) EEG → (B, C+1, d_model): per-channel Dense over time (shared, or
    per-subject when ``joint_train``), + positional code, + subject token
    prepended at position 0.
    """

    seq_len: int = 250
    d_model: int = 250
    num_subjects: int = 10
    dropout: float = 0.25
    joint_train: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        subject_ids: jax.Array | None,
        *,
        deterministic: bool,
        dropout_mask: jax.Array | None = None,
    ) -> jax.Array:
        x = x.astype(self.dtype)
        if self.joint_train:
            if subject_ids is None:
                raise ValueError("joint_train requires subject_ids")
            w = self.param(
                "subject_value_w",
                nn.initializers.lecun_normal(),
                (self.num_subjects, self.seq_len, self.d_model),
            )
            b = self.param(
                "subject_value_b",
                nn.initializers.zeros,
                (self.num_subjects, self.d_model),
            )
            ids = jnp.clip(subject_ids, 0, self.num_subjects - 1)
            # one gather + one batched matmul instead of a per-sample loop
            x = (
                jnp.einsum(
                    "bct,btd->bcd",
                    x,
                    w[ids].astype(self.dtype),
                    preferred_element_type=jnp.float32,
                ).astype(self.dtype)
                + b[ids][:, None, :].astype(self.dtype)
            )
        else:
            x = nn.Dense(self.d_model, dtype=self.dtype, name="value_embedding")(x)

        pe = sinusoidal_position_embedding(x.shape[1], self.d_model)
        x = x + jnp.asarray(pe, self.dtype)[None]

        if subject_ids is not None:
            tok = SubjectToken(self.num_subjects, self.d_model, name="subject_token")(
                subject_ids
            ).astype(self.dtype)
            x = jnp.concatenate([tok, x], axis=1)

        # ref Embed.py:162: one dropout on the full token sequence (subject
        # token included). ``dropout_mask`` injects an externally drawn
        # pre-scaled keep-mask — the dropout-PLACEMENT parity hook
        # (tests/test_dropout_placement_parity.py)
        if dropout_mask is not None:
            return x * dropout_mask.astype(x.dtype)
        return nn.Dropout(self.dropout, deterministic=deterministic)(x)
