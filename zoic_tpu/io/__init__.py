"""Serialization: compiled-camera state save/load and the on-disk compile
cache."""

from . import state  # noqa: F401
