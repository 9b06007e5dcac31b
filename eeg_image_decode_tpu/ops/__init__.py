from eeg_image_decode_tpu.ops.ddpm import DDPMSchedule  # noqa: F401
