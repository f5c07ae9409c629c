from unibev_tpu.data import pipelines, nuscenes_dataset  # noqa: F401 (registration)
