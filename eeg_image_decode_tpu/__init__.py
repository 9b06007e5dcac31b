"""eeg_image_decode_tpu — a TPU-native JAX framework for EEG→image decoding.

From-scratch rebuild of the capabilities of dongyangli-del/EEG_Image_decode
(NeurIPS 2024, arXiv 2403.07721) designed for TPU hardware:

- jit/pjit + `jax.sharding.Mesh` data parallelism with ICI collectives for the
  CLIP-space contrastive alignment (InfoNCE with grad-preserving embedding
  all-gather — the reference's `models/loss.py:20-75` NCCL path, done the SPMD way).
- An EEG encoder zoo (ATM-S channel-token transformer, ATM-E, EEGNetV4, NICE and
  braindecode-style baselines) as flax modules with Pallas kernels on the hot path.
- Whole-dataset-in-HBM training: one `lax.scan` per epoch, donated buffers,
  no per-step host round trips (the reference's per-batch `.item()` syncs are gone).
- A vectorized, seeded k-way zero-shot retrieval evaluator (one matmul + masked
  top-k instead of the reference's per-sample Python loop,
  `Retrieval/ATMS_retrieval.py:296-357`).
- A two-stage generation path: diffusion prior (DDPM ε-prediction, CFG) sampled
  with `lax.scan`, then an SDXL-style UNet with IP-Adapter image-embedding
  cross-attention, all in JAX.
"""

__version__ = "0.1.0"

from eeg_image_decode_tpu.core.config import (  # noqa: F401
    ATMSConfig,
    ContrastiveTrainConfig,
    DataConfig,
    PriorConfig,
)
