"""Convert reference torch checkpoints into this framework's param trees.

The reference ships trained ATM-S ``state_dict`` files
(``torch.save(eeg_model.state_dict())``, ``Retrieval/ATMS_retrieval.py:386``).
``convert_atms_state_dict`` maps them onto the flax ATMS tree so a user of
the reference can evaluate/resume here without retraining.

Conventions handled:
- torch ``Linear.weight`` is (out, in) → flax ``kernel`` (in, out)
- torch ``Conv2d.weight`` is (O, I, kH, kW) → flax (kH, kW, I, O)
- our conv-before-BN layers drop the redundant torch conv bias; the bias is
  folded into the BN running mean instead (exactly equivalent at inference:
  BN(x + b) = BN'(x) with mean' = mean − b)
- the reference's unused ``subject_wise_linear`` stack (forward-commented,
  ``ATMS_retrieval.py:187``) and ``loss_func`` buffers are ignored.

Input: a mapping name → numpy array (load ``.pth`` with
``torch.load(..., map_location='cpu')`` and call ``.numpy()`` per tensor, or
pass any dict of arrays).
"""

from __future__ import annotations

import numpy as np


def linear_to_kernel(w: np.ndarray) -> np.ndarray:
    """(out, in) torch Linear weight → (in, out) flax kernel."""
    return np.ascontiguousarray(np.asarray(w).T)


def conv2d_to_hwio(w: np.ndarray) -> np.ndarray:
    """(O, I, kH, kW) → (kH, kW, I, O)."""
    return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 3, 1, 0)))


def _bn(sd: dict, prefix: str, mean_shift: np.ndarray | None = None):
    mean = np.asarray(sd[f"{prefix}.running_mean"])
    if mean_shift is not None:
        mean = mean - np.asarray(mean_shift)
    return (
        {"scale": np.asarray(sd[f"{prefix}.weight"]),
         "bias": np.asarray(sd[f"{prefix}.bias"])},
        {"mean": mean, "var": np.asarray(sd[f"{prefix}.running_var"])},
    )


def _ln(sd: dict, prefix: str):
    return {"scale": np.asarray(sd[f"{prefix}.weight"]),
            "bias": np.asarray(sd[f"{prefix}.bias"])}


def _torch_positional_pe(d_model: int, max_len: int = 5000) -> np.ndarray:
    """The reference ``PositionalEmbedding``'s persistent ``pe`` buffer
    (``models/subject_layers/Embed.py:8-23``), reproduced exactly: torch
    registers it with ``persistent=True`` so a ``strict=True`` load
    REQUIRES the key even though it is deterministic."""
    pe = np.zeros((max_len, d_model), np.float32)
    position = np.arange(max_len, dtype=np.float32)[:, None]
    div_term = np.exp(
        np.arange(0, d_model, 2, dtype=np.float32)
        * -(np.log(10000.0) / d_model)
    )
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return pe[None]  # (1, max_len, d_model)


def export_atms_state_dict(variables: dict, *, num_subjects: int = 2) -> dict:
    """Flax ATMS variables → a reference-format torch ``state_dict``
    (numpy values) — the INVERSE of :func:`convert_atms_state_dict`, so a
    user can take a model trained here back to the reference codebase
    (``Retrieval/ATMS_retrieval.py`` loads it with
    ``eeg_model.load_state_dict(torch.load(...))``, default strict).

    All linear/attention/LayerNorm/embedding tensors are exact inverses
    (transposes). The one representation difference: on import, the
    conv-before-BatchNorm biases are folded into the BN running means
    (``BN(x + b) = BN'(x)`` with ``mean' = mean − b``); the export emits
    zero conv biases with the current means, which is the SAME function —
    behavioral equivalence is pinned by
    ``tests/test_convert.py::test_export_roundtrip_behavioral`` and a
    ``strict=True`` load into the reference's OWN ``ATMS`` class by
    ``tests/test_reference_reverse_migration.py``.

    The reference module carries parameters its forward never touches —
    ``subject_wise_linear.{i}`` (forward-commented,
    ``ATMS_retrieval.py:187``; ``num_subjects`` sizes the ModuleList, 2 in
    the retrieval script, 10 in the joint script), the unused
    ``temporal_embedding`` / ``mask_token`` / ``mask_embedding``, and the
    deterministic ``position_embedding.pe`` buffer. ``strict=True``
    requires all of them, so they are emitted here (zeros for the unused
    learnables, the exact sinusoid for ``pe``).

    Joint-trained models (``subject_value_w/b`` per-subject value
    embeddings) export to the joint script's ModuleDict layout
    ``value_embedding.{sid}.weight/bias``
    (``ATMS_retrieval_joint_train.py`` / ``Embed.py:128-131``).
    """
    import jax

    p = jax.tree_util.tree_map(np.asarray, variables["params"])["encoder"]
    stats = jax.tree_util.tree_map(
        np.asarray, variables.get("batch_stats", {})
    ).get("encoder", {})
    ls = variables["params"]["logit_scale"]["logit_scale"]
    sd: dict = {"logit_scale": np.asarray(ls)}

    def put_linear(name, leaf):
        sd[f"{name}.weight"] = linear_to_kernel(leaf["kernel"])  # involution
        sd[f"{name}.bias"] = np.asarray(leaf["bias"])

    def put_ln(name, leaf):
        sd[f"{name}.weight"] = np.asarray(leaf["scale"])
        sd[f"{name}.bias"] = np.asarray(leaf["bias"])

    def put_bn(name, affine, running):
        sd[f"{name}.weight"] = np.asarray(affine["scale"])
        sd[f"{name}.bias"] = np.asarray(affine["bias"])
        sd[f"{name}.running_mean"] = np.asarray(running["mean"])
        sd[f"{name}.running_var"] = np.asarray(running["var"])
        sd[f"{name}.num_batches_tracked"] = np.asarray(0, np.int64)

    def hwio_to_conv2d(k):
        # (kH, kW, I, O) → (O, I, kH, kW)
        return np.ascontiguousarray(np.transpose(np.asarray(k), (3, 2, 0, 1)))

    emb = p["embedding"]
    if "value_embedding" in emb:
        put_linear("encoder.enc_embedding.value_embedding",
                   emb["value_embedding"])
    else:  # joint-trained: per-subject ModuleDict layout
        w = np.asarray(emb["subject_value_w"])  # (S, seq_len, d_model)
        b = np.asarray(emb["subject_value_b"])  # (S, d_model)
        for sid in range(w.shape[0]):
            sd[f"encoder.enc_embedding.value_embedding.{sid}.weight"] = (
                linear_to_kernel(w[sid])  # (seq_len,d_model) → (d,seq) torch
            )
            sd[f"encoder.enc_embedding.value_embedding.{sid}.bias"] = b[sid]
    sd["encoder.enc_embedding.subject_embedding.subject_embedding.weight"] = (
        emb["subject_token"]["subject_embedding"]
    )
    sd["encoder.enc_embedding.subject_embedding.shared_embedding"] = (
        emb["subject_token"]["shared_embedding"]
    )
    d_model = int(np.asarray(
        emb["subject_token"]["shared_embedding"]).shape[-1])
    # unused-by-forward keys the reference module still registers —
    # strict=True load requires them (see docstring)
    sd["encoder.enc_embedding.subject_embedding.mask_embedding"] = np.zeros(
        (1, d_model), np.float32)
    sd["encoder.enc_embedding.mask_token"] = np.zeros((1, d_model),
                                                      np.float32)
    sd["encoder.enc_embedding.position_embedding.pe"] = _torch_positional_pe(
        d_model)
    # timeF temporal embedding (freq 'h' → 4 inputs), never fed (x_mark=None)
    sd["encoder.enc_embedding.temporal_embedding.embed.weight"] = np.zeros(
        (d_model, 4), np.float32)

    i = 0
    while f"encoder_layer_{i}" in p:
        layer = p[f"encoder_layer_{i}"]
        q = f"encoder.encoder.attn_layers.{i}"
        put_linear(f"{q}.attention.query_projection", layer["q_proj"])
        put_linear(f"{q}.attention.key_projection", layer["k_proj"])
        put_linear(f"{q}.attention.value_projection", layer["v_proj"])
        put_linear(f"{q}.attention.out_projection", layer["out_proj"])
        # Dense kernel (in, out) → 1x1 Conv1d weight (out, in, 1)
        sd[f"{q}.conv1.weight"] = linear_to_kernel(
            layer["ffn_in"]["kernel"]
        )[:, :, None]
        sd[f"{q}.conv1.bias"] = np.asarray(layer["ffn_in"]["bias"])
        sd[f"{q}.conv2.weight"] = linear_to_kernel(
            layer["ffn_out"]["kernel"]
        )[:, :, None]
        sd[f"{q}.conv2.bias"] = np.asarray(layer["ffn_out"]["bias"])
        put_ln(f"{q}.norm1", layer["norm1"])
        put_ln(f"{q}.norm2", layer["norm2"])
        i += 1
    put_ln("encoder.encoder.norm", p["encoder_norm"])

    # forward-commented subject_wise_linear stack (ATMS_retrieval.py:177,187)
    # — nn.Linear(d_model, sequence_length) × num_subjects, never applied;
    # zeros keep strict=True loads happy without affecting any output
    seq_len = (
        int(np.asarray(emb["value_embedding"]["kernel"]).shape[0])
        if "value_embedding" in emb
        else int(np.asarray(emb["subject_value_w"]).shape[1])
    )
    for s in range(num_subjects):
        sd[f"subject_wise_linear.{s}.weight"] = np.zeros(
            (seq_len, d_model), np.float32)
        sd[f"subject_wise_linear.{s}.bias"] = np.zeros((seq_len,), np.float32)

    enc = p["enc_eeg"]
    if "temporal_conv_kernel" in enc:  # fused layout: (k_t, filters)
        w_t = np.asarray(enc["temporal_conv_kernel"])
        sd["enc_eeg.0.tsconv.0.weight"] = np.ascontiguousarray(
            w_t.T[:, None, None, :]
        )  # (filters, 1, 1, k_t)
    else:
        sd["enc_eeg.0.tsconv.0.weight"] = hwio_to_conv2d(
            enc["temporal_conv"]["kernel"]
        )
    n_f = sd["enc_eeg.0.tsconv.0.weight"].shape[0]
    # bias was folded into bn1's running mean at import (or never existed
    # for a model trained here) — zero bias + current mean is identical
    sd["enc_eeg.0.tsconv.0.bias"] = np.zeros((n_f,), np.float32)
    put_bn("enc_eeg.0.tsconv.2", enc["bn1"], stats["enc_eeg"]["bn1"])
    sd["enc_eeg.0.tsconv.4.weight"] = hwio_to_conv2d(
        enc["spatial_conv"]["kernel"]
    )
    sd["enc_eeg.0.tsconv.4.bias"] = np.zeros(
        (sd["enc_eeg.0.tsconv.4.weight"].shape[0],), np.float32
    )
    put_bn("enc_eeg.0.tsconv.5", enc["bn2"], stats["enc_eeg"]["bn2"])
    sd["enc_eeg.0.projection.0.weight"] = hwio_to_conv2d(
        enc["proj_conv"]["kernel"]
    )
    sd["enc_eeg.0.projection.0.bias"] = np.asarray(
        enc["proj_conv"]["bias"]
    )

    proj = p["proj_eeg"]
    put_linear("proj_eeg.0", proj["in_proj"])
    put_linear("proj_eeg.1.fn.1", proj["res_proj"])
    put_ln("proj_eeg.2", proj["ln"])
    return sd


def reference_atms_config(**overrides):
    """ATMSConfig preset for CONVERTED reference checkpoints.

    The reference encoder's attention FFN uses exact-erf GELU
    (``models/subject_layers/Transformer_EncDec.py:33-41``, torch ``F.gelu``
    default); this framework's default is tanh GELU so the XLA path and the
    fused Pallas kernel (which cannot lower erf) agree. When evaluating a
    checkpoint trained by the reference, use this config so inference is
    activation-for-activation faithful (the parity oracle pins it at
    atol 2e-4 — ``tests/test_atms_torch_parity.py``).
    """
    from eeg_image_decode_tpu.core.config import ATMSConfig

    overrides.setdefault("exact_gelu", True)
    return ATMSConfig(**overrides)


def convert_atms_state_dict(
    sd: dict, *, fused_tsconv: bool = False
) -> dict:
    """torch ATMS state_dict → {'params': ..., 'batch_stats': ...} for the
    wrapped ``build_encoder('atms')`` model."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params: dict = {}
    stats: dict = {}

    # — embedding (DataEmbedding, Embed.py:124-162) —
    emb = {
        "value_embedding": {
            "kernel": linear_to_kernel(sd["encoder.enc_embedding.value_embedding.weight"]),
            "bias": sd["encoder.enc_embedding.value_embedding.bias"],
        },
        "subject_token": {
            "subject_embedding": sd[
                "encoder.enc_embedding.subject_embedding.subject_embedding.weight"
            ],
            "shared_embedding": sd[
                "encoder.enc_embedding.subject_embedding.shared_embedding"
            ],
        },
    }
    params["embedding"] = emb

    # — attention encoder layers (Transformer_EncDec.py:27-51) —
    i = 0
    while f"encoder.encoder.attn_layers.{i}.attention.query_projection.weight" in sd:
        p = f"encoder.encoder.attn_layers.{i}"
        layer = {
            "q_proj": {
                "kernel": linear_to_kernel(sd[f"{p}.attention.query_projection.weight"]),
                "bias": sd[f"{p}.attention.query_projection.bias"],
            },
            "k_proj": {
                "kernel": linear_to_kernel(sd[f"{p}.attention.key_projection.weight"]),
                "bias": sd[f"{p}.attention.key_projection.bias"],
            },
            "v_proj": {
                "kernel": linear_to_kernel(sd[f"{p}.attention.value_projection.weight"]),
                "bias": sd[f"{p}.attention.value_projection.bias"],
            },
            "out_proj": {
                "kernel": linear_to_kernel(sd[f"{p}.attention.out_projection.weight"]),
                "bias": sd[f"{p}.attention.out_projection.bias"],
            },
            # the FFN is two 1x1 Conv1d: (d_ff, d_model, 1) → Dense
            "ffn_in": {
                "kernel": linear_to_kernel(sd[f"{p}.conv1.weight"][:, :, 0]),
                "bias": sd[f"{p}.conv1.bias"],
            },
            "ffn_out": {
                "kernel": linear_to_kernel(sd[f"{p}.conv2.weight"][:, :, 0]),
                "bias": sd[f"{p}.conv2.bias"],
            },
            "norm1": _ln(sd, f"{p}.norm1"),
            "norm2": _ln(sd, f"{p}.norm2"),
        }
        params[f"encoder_layer_{i}"] = layer
        i += 1
    params["encoder_norm"] = _ln(sd, "encoder.encoder.norm")

    # — tsconv (PatchEmbedding, ATMS_retrieval.py:97-125) —
    w_t = sd["enc_eeg.0.tsconv.0.weight"]  # (40, 1, 1, 25)
    b_t = sd["enc_eeg.0.tsconv.0.bias"]
    enc = {}
    bn1_p, bn1_s = _bn(sd, "enc_eeg.0.tsconv.2", mean_shift=b_t)
    if fused_tsconv:
        enc["temporal_conv_kernel"] = np.ascontiguousarray(
            w_t[:, 0, 0, :].T
        )  # (25, 40)
    else:
        enc["temporal_conv"] = {"kernel": conv2d_to_hwio(w_t)}
    enc["bn1"] = bn1_p
    w_s = sd["enc_eeg.0.tsconv.4.weight"]  # (40, 40, 63, 1)
    b_s = sd["enc_eeg.0.tsconv.4.bias"]
    bn2_p, bn2_s = _bn(sd, "enc_eeg.0.tsconv.5", mean_shift=b_s)
    enc["spatial_conv"] = {"kernel": conv2d_to_hwio(w_s)}
    enc["bn2"] = bn2_p
    enc["proj_conv"] = {
        "kernel": conv2d_to_hwio(sd["enc_eeg.0.projection.0.weight"]),
        "bias": sd["enc_eeg.0.projection.0.bias"],
    }
    params["enc_eeg"] = enc
    stats["enc_eeg"] = {"bn1": bn1_s, "bn2": bn2_s}

    # — projector (Proj_eeg, :157-167) —
    params["proj_eeg"] = {
        "in_proj": {
            "kernel": linear_to_kernel(sd["proj_eeg.0.weight"]),
            "bias": sd["proj_eeg.0.bias"],
        },
        "res_proj": {
            "kernel": linear_to_kernel(sd["proj_eeg.1.fn.1.weight"]),
            "bias": sd["proj_eeg.1.fn.1.bias"],
        },
        "ln": _ln(sd, "proj_eeg.2"),
    }

    return {
        "params": {
            "encoder": params,
            "logit_scale": {"logit_scale": np.asarray(sd["logit_scale"])},
        },
        "batch_stats": {"encoder": stats},
    }
