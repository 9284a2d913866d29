"""mapquik_tpu: TPU-native HiFi read mapper (JAX/XLA/Pallas)."""

__version__ = "0.1.0"

from .params import Params  # noqa: F401
