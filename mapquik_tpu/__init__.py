"""mapquik_tpu: TPU-native HiFi read mapper (JAX/XLA/Pallas)."""

__version__ = "0.1.0"

from .params import Params  # noqa: F401
from .utils.runtime import enable_compilation_cache

# Persistent XLA compile cache — opt-in via MAPQUIK_JAX_CACHE=<dir>; no-op otherwise
# (cached-executable reads hang on this environment's tunneled TPU backend).
enable_compilation_cache()
