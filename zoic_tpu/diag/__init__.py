"""Diagnostics: ray diagrams, pupil comparisons, stats reporting."""
