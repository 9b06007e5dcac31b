from eeg_image_decode_tpu.parallel.collectives import (  # noqa: F401
    gather_features,
    pmean_tree,
)
