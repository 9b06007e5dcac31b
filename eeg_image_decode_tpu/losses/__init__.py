from eeg_image_decode_tpu.losses.clip_loss import (  # noqa: F401
    clip_loss,
    clip_loss_distributed,
    retrieval_loss,
    reconstruction_loss,
    symmetric_infonce,
)
