from unibev_tpu.core import bbox  # noqa: F401
