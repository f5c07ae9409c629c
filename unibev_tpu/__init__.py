"""unibev_tpu — TPU-native (JAX/XLA/Pallas) rebuild of UniBEV.

Importing the package populates every registry, mirroring the reference
plugin's import-time registration (/root/reference/projects/UniBEV/
unibev_plugin/__init__.py).
"""

__version__ = "0.1.0"

from unibev_tpu import core  # noqa: F401
from unibev_tpu import models  # noqa: F401
from unibev_tpu import ops  # noqa: F401
from unibev_tpu import data  # noqa: F401
