"""Chain configuration presets (reference: src/config/)."""

from . import blockchain  # noqa: F401
