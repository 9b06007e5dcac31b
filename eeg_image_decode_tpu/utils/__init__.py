from eeg_image_decode_tpu.utils.convert import (  # noqa: F401
    convert_atms_state_dict,
    linear_to_kernel,
)
