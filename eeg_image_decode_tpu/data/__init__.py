from eeg_image_decode_tpu.data.things_eeg import (  # noqa: F401
    EEGRetrievalData,
    load_things_eeg_subject,
)
from eeg_image_decode_tpu.data.loader import PrefetchLoader  # noqa: F401
from eeg_image_decode_tpu.data.native_loader import (  # noqa: F401
    GatherPool,
    NpyMmap,
    native_available,
)
from eeg_image_decode_tpu.data.synthetic import make_synthetic_retrieval_data  # noqa: F401
from eeg_image_decode_tpu.data.tokenizers import (  # noqa: F401
    CLIPBPETokenizer,
    WordPieceTokenizer,
)
