from eeg_image_decode_tpu.core.config import (  # noqa: F401
    ATMSConfig,
    ContrastiveTrainConfig,
    DataConfig,
    PriorConfig,
)
from eeg_image_decode_tpu.core.mesh import (  # noqa: F401
    batch_sharding,
    create_mesh,
    replicated_sharding,
)
