from eeg_image_decode_tpu.gen.sdxl import (  # noqa: F401
    Generator4Embeds,
    SDXLUNetConfig,
)
