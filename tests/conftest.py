import os
import sys

# Force a deterministic 8-device CPU mesh for all tests (the TPU chip is
# reserved for benching; sharding tests need multiple devices).
# NOTE: the axon sitecustomize imports jax and registers the TPU backend
# before any user code runs, so env vars alone cannot force CPU here — only
# jax.config.update('jax_platforms', ...) (or JAX_PLATFORM_NAME before python
# starts) takes effect.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
