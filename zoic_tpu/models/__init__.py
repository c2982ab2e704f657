"""Camera ray-generation models (thin-lens and raytraced/Kolb)."""

from . import common, raytraced, thinlens  # noqa: F401
