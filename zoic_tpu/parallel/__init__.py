"""Multi-chip scaling: data-parallel ray sharding over a device mesh."""

from . import sharding  # noqa: F401
