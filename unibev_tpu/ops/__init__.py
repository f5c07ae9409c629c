from unibev_tpu.ops import losses  # noqa: F401 (registration)
