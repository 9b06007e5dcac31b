from eeg_image_decode_tpu.parallel.collectives import (  # noqa: F401
    gather_features,
    pmean_tree,
)
from eeg_image_decode_tpu.parallel.multihost import (  # noqa: F401
    initialize as initialize_multihost,
    is_multiprocess,
    process_local_slice,
    replicate_global,
    shard_global_batch,
)
