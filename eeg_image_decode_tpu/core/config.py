"""Configuration tree for the framework.

The reference spreads configuration over per-script argparse flags plus a
hard-coded ``Config`` class (``Retrieval/ATMS_retrieval.py:44-59``) and a JSON
path file (``Retrieval/data_config.json``). Here everything is a frozen
dataclass so configs are hashable, can be closed over by ``jax.jit``, and can
be serialized for experiment tracking. Defaults reproduce the reference's
hyperparameters (SURVEY.md §2.3).
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Sequence


def _freeze(obj: Any) -> Any:
    if isinstance(obj, dict):
        return tuple(sorted((k, _freeze(v)) for k, v in obj.items()))
    if isinstance(obj, (list, tuple)):
        return tuple(_freeze(v) for v in obj)
    return obj


@dataclass(frozen=True)
class DataConfig:
    """THINGS-EEG dataset layout (ref ``Retrieval/eegdatasets_leaveone.py``)."""

    data_path: str = ""
    img_directory_training: str = ""
    img_directory_test: str = ""
    #: training set: 1654 classes x 10 images x 4 EEG repetitions
    n_train_classes: int = 1654
    images_per_train_class: int = 10
    train_reps: int = 4
    #: test set: 200 classes x 1 image x 80 repetitions (averaged by default,
    #: ref ``eegdatasets_leaveone.py:220``; kept un-averaged by the VAE latent
    #: pipeline, ``eegdatasets_leaveone_latent_vae_no_average.py:215-236``)
    n_test_classes: int = 200
    test_reps: int = 80
    average_test_reps: bool = True
    n_channels: int = 63
    n_timepoints: int = 250
    time_window: tuple[float, float] = (0.0, 1.0)
    #: clip-space embedding width (OpenCLIP ViT-H/14)
    clip_dim: int = 1024
    #: retrieval trains on L2-normalized CLIP image features; reconstruction
    #: on unnormalized (ref ``Retrieval/...:318`` vs ``Generation/...:318``)
    normalize_img_features: bool = True
    text_prompt_template: str = "This picture is {description}"

    @classmethod
    def from_json(cls, path: str) -> "DataConfig":
        """Load the reference's ``data_config.json`` path file."""
        with open(path) as f:
            raw = json.load(f)
        return cls(
            data_path=raw.get("data_path", ""),
            img_directory_training=raw.get("img_directory_training", ""),
            img_directory_test=raw.get("img_directory_test", ""),
        )


@dataclass(frozen=True)
class ATMSConfig:
    """ATM-S flagship encoder (ref ``Retrieval/ATMS_retrieval.py:44-59,171-191``).

    Channel-token iTransformer: each of the 63 EEG channels becomes a token of
    its 250-sample time course; a subject token is prepended; one post-norm
    attention layer mixes channels; a ShallowNet-style temporal-spatial conv
    stack plus a projector maps to the 1024-d CLIP space.
    """

    n_channels: int = 63
    seq_len: int = 250
    d_model: int = 250
    n_heads: int = 4
    n_layers: int = 1
    d_ff: int = 256
    dropout: float = 0.25
    num_subjects: int = 10
    #: per-subject value embeddings (joint training, ref ``Embed.py:127-130``)
    joint_train: bool = False
    # tsconv stage (ref ``ATMS_retrieval.py:97-125``)
    conv_filters: int = 40
    temporal_kernel: int = 25
    pool_size: int = 51
    pool_stride: int = 5
    conv_dropout: float = 0.5
    emb_size: int = 40
    proj_dim: int = 1024
    proj_dropout: float = 0.5
    #: exact-erf GELU in the attention FFN, matching the reference's
    #: ``F.gelu`` default (``Transformer_EncDec.py:33-41``). The default
    #: (False → tanh GELU) matches the fused Pallas kernel, which Mosaic
    #: cannot lower erf for; set True when serving a checkpoint CONVERTED
    #: from the reference so inference is activation-for-activation faithful
    #: (|Δ| ≲ 1e-3 per activation otherwise, measured end-task delta in
    #: docs/PARITY.md). True forces the plain-XLA attention path.
    exact_gelu: bool = False
    #: fused Pallas attention layer when dropout inactive ('auto' → TPU only)
    fused_attention: bool | str = "auto"
    #: fused Pallas tsconv stage-1 ('auto' → TPU only)
    fused_tsconv: bool | str = "auto"
    #: stage-1 BatchNorm: 'gram' computes batch stats from the stage-1 matmul
    #: INPUTS (models/layers.py::GramStage1BN — exact-parity-tested vs flax,
    #: checkpoint-compatible tree, measured +3% flagship throughput on v5e);
    #: only active on the fused TPU path, 'flax' elsewhere and on demand
    tsconv_bn1: str = "gram"
    #: fused Pallas projection head (ops/projection.py); 'auto' currently
    #: resolves to OFF pending the on-chip A/B (scripts/bench_projection.py)
    fused_projection: bool | str = "auto"


@dataclass(frozen=True)
class ContrastiveTrainConfig:
    """Contrastive retrieval training (ref ``Retrieval/ATMS_retrieval.py:516-586``)."""

    encoder: str = "atms"
    batch_size: int = 1024
    epochs: int = 40
    lr: float = 3e-4
    weight_decay: float = 1e-2  # AdamW default (torch), applied decoupled
    #: loss = alpha*img_clip + (1-alpha)*text_clip (ref ``:206,234``)
    alpha: float = 0.99
    #: reconstruction variant: alpha*MSE*10 + (1-alpha)*img_clip*10
    #: (ref ``Generation/ATMS_reconstruction.py:198,227-228``)
    recon_loss: bool = False
    recon_alpha: float = 0.90
    logit_scale_init: float = 2.6592600225  # ln(1/0.07)
    seed: int = 0
    ckpt_every_epochs: int = 5
    eval_ks: tuple[int, ...] = (2, 4, 10, 50, 100, 200)
    #: dtype for activations on the compute path; params stay fp32
    compute_dtype: str = "bfloat16"
    #: streaming mode only: store/stream the host-side EEG in this dtype
    #: ("bfloat16" halves gather + host→device bytes on the transfer-bound
    #: beyond-HBM path; None keeps fp32). The device step upcasts as usual.
    host_dtype: str | None = None
    data_axis: str = "dp"


@dataclass(frozen=True)
class PriorConfig:
    """Diffusion prior (ref ``Generation/diffusion_prior.py:92-203,268-338``)."""

    embed_dim: int = 1024
    cond_dim: int = 1024
    hidden_dims: tuple[int, ...] = (1024, 512, 256, 128, 64)
    time_embed_dim: int = 512
    dropout: float = 0.0
    # training
    num_train_timesteps: int = 1000
    batch_size: int = 1024
    epochs: int = 150
    lr: float = 1e-3
    warmup_steps: int = 500
    grad_clip_norm: float = 1.0
    cond_dropout_prob: float = 0.1
    # sampling
    num_inference_steps: int = 50
    guidance_scale: float = 5.0
    seed: int = 0

    @staticmethod
    def tiny() -> "PriorConfig":
        """Dims matched to ``SDXLUNetConfig.tiny()``'s 64-d image embeds —
        the CLI's ``--tiny`` smoke chain (prior → generator) end-to-end."""
        return PriorConfig(
            embed_dim=64, cond_dim=64, hidden_dims=(64, 32),
            time_embed_dim=32, batch_size=8, epochs=2, warmup_steps=2,
            num_inference_steps=4,
        )


@dataclass(frozen=True)
class LowLevelConfig:
    """VAE-latent low-level encoder training
    (ref ``Generation/train_vae_latent_512_low_level_no_average.py:219-260,490-545``)."""

    n_channels: int = 63
    seq_len: int = 250
    time_proj_dim: int = 128
    latent_shape: tuple[int, int, int] = (4, 64, 64)
    batch_size: int = 30
    epochs: int = 200
    lr: float = 1e-3


@dataclass(frozen=True)
class MeshConfig:
    """Device mesh layout. The reference's only parallelism is an optional
    NCCL all-gather inside ClipLoss (``models/loss.py:20-75``); here data
    parallelism over the ``dp`` axis is first-class, with embeddings gathered
    over ICI inside the loss."""

    data_axis: str = "dp"
    model_axis: str = "mp"
    data_parallel: int = -1  # -1 → all devices
    model_parallel: int = 1


def asdict(cfg: Any) -> dict:
    return dataclasses.asdict(cfg)


def replace(cfg: Any, **kw: Any) -> Any:
    return dataclasses.replace(cfg, **kw)


@dataclass(frozen=True)
class ExperimentConfig:
    """Top-level bundle used by the CLI."""

    data: DataConfig = field(default_factory=DataConfig)
    model: ATMSConfig = field(default_factory=ATMSConfig)
    train: ContrastiveTrainConfig = field(default_factory=ContrastiveTrainConfig)
    prior: PriorConfig = field(default_factory=PriorConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    output_dir: str = "./runs"
    insubject: bool = True
    subjects: Sequence[str] = tuple(f"sub-{i:02d}" for i in range(1, 11))
