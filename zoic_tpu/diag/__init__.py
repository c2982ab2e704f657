"""Diagnostics: ray tapes, draw.zoic dumps, diagrams, pupil comparisons.

TPU-native replacements for the reference's _DRAW debug subsystem
(SURVEY.md C19-C22): the per-ray dump hooks become one batched tape trace,
the Python2/PIL renderers become matplotlib, and the dump format stays
byte-compatible so artifacts interchange with the reference plugin.
"""

from . import draw, dump, pupilplot, session, tape  # noqa: F401
