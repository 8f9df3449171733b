"""Data layer: host IO, session layouts, metadata schemas, dataset pipelines."""

from .io import extract_red, load_gray, load_image, save_png
from .sessions import (
    CENTER_SHIFT_FILES,
    CORNER_LABELS,
    CORNER_SHIFTS_LR,
    SessionData,
    discover_sessions,
    load_center_shift_session,
    load_corner_rep_sessions,
    metadata_shifts,
)

__all__ = [
    "extract_red", "load_gray", "load_image", "save_png",
    "CENTER_SHIFT_FILES", "CORNER_LABELS", "CORNER_SHIFTS_LR", "SessionData",
    "discover_sessions", "load_center_shift_session",
    "load_corner_rep_sessions", "metadata_shifts",
]
