"""Model-level configurations: named parameter presets for the reference's
published run configurations (human/ecoli/maize/default)."""

from . import presets  # noqa: F401
