from genima_tpu.kernels.flash_attention import flash_attention  # noqa: F401
