"""Application runners — the framework's CLI layer.

Mirrors the reference's ``examples/`` entry points (its de-facto CLI,
SURVEY.md §2.3): single-folder inference, the canonical project runner with
ROI gating, the classical OpenCV pipeline, scatter plotting, and
training-data prep.
"""
