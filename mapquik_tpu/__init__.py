"""mapquik_tpu: TPU-native HiFi read mapper (JAX/XLA/Pallas)."""

__version__ = "0.1.0"

from .params import Params  # noqa: F401
from .utils.runtime import enable_compilation_cache

# Persistent XLA compile cache: load-bearing under remote-compile backends
# (first compile of the big seeding program costs minutes; cached it is instant).
enable_compilation_cache()
