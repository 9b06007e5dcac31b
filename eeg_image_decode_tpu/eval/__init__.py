from eeg_image_decode_tpu.eval.recon_metrics import (  # noqa: F401
    pixcorr,
    ssim,
    two_way_identification,
    feature_distance,
    reconstruction_metrics,
)
