"""Classical multi-frame SR solvers, workload configs, and the session pipeline."""

from .classical import (
    IBP_STEP_SIZE,
    PSF_HALFWIDTH,
    PSF_SIGMA,
    PSF_SIZE,
    UPSAMPLE_FACTOR,
    back_project,
    forward_model,
    ibp,
    make_gaussian_psf,
    native_upsample,
    shift_and_add,
    solve,
    to_uint8,
)
from .config import WORKLOADS, WorkloadConfig

__all__ = [
    "IBP_STEP_SIZE", "PSF_HALFWIDTH", "PSF_SIGMA", "PSF_SIZE",
    "UPSAMPLE_FACTOR", "back_project", "forward_model", "ibp",
    "make_gaussian_psf", "native_upsample", "shift_and_add", "solve",
    "to_uint8", "WORKLOADS", "WorkloadConfig",
]
