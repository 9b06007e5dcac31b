from eeg_image_decode_tpu.preprocess.mvnn import (  # noqa: F401
    ledoit_wolf_cov,
    matrix_inverse_sqrt,
    mvnn_whiten,
)
from eeg_image_decode_tpu.preprocess.epoching import (  # noqa: F401
    CHANNEL_ORDER,
    epoch_session,
    find_events,
)
