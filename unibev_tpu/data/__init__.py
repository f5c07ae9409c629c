from unibev_tpu.data import pipelines, nuscenes_dataset, radar  # noqa: F401 (registration)
