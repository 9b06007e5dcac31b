from eeg_image_decode_tpu.gen.sdxl import (  # noqa: F401
    Generator4Embeds,
    SDXLUNetConfig,
)
from eeg_image_decode_tpu.gen.text_encoder import (  # noqa: F401
    SDXLTextEncoder,
    SDXLTextEncoderConfig,
    convert_sdxl_text_encoders,
)
