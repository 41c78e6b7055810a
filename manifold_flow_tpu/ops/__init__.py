"""Field-analysis ops over velocity movies — all vmap/jit-friendly.

Each module replaces one analysis stage of the reference pipeline
(SURVEY.md §2): singularity (C6/C7), svd (C9/C10), wavespeed (C11/C12),
streamline (C13), winding (C14), interpolate (C17/C18), phase (C18/S5),
validation (C8). Ragged results use fixed-capacity masked arrays on device
with host-side compaction helpers.
"""

from manifold_flow_tpu.ops import (
    interpolate,
    phase,
    singularity,
    streamline,
    svd,
    validation,
    wavespeed,
    winding,
)
from manifold_flow_tpu.ops.recombine import velocity_to_world, velocity_to_complex

__all__ = [
    "interpolate",
    "phase",
    "singularity",
    "streamline",
    "svd",
    "validation",
    "wavespeed",
    "winding",
    "velocity_to_world",
    "velocity_to_complex",
]
