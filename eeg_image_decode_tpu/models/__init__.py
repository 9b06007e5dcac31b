from eeg_image_decode_tpu.models.registry import build_encoder, ENCODERS  # noqa: F401
from eeg_image_decode_tpu.models.atm_s import ATMS  # noqa: F401
from eeg_image_decode_tpu.models.nice import NICE  # noqa: F401
from eeg_image_decode_tpu.models.eegnetv4 import EEGNetV4  # noqa: F401
