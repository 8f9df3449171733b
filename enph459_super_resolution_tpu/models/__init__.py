"""Neural SR model zoo (SRCNN, ESPCN, FSRCNN, EDSR, RRDB/ESRGAN)."""

from .common import DIV2K_RGB_MEAN, MeanShift, ResBlock, Upsampler, pixel_shuffle
from .zoo import (
    EDSR,
    ESPCN,
    FSRCNN,
    MODELS,
    RRDB,
    RRDBNet,
    SRCNN,
    VGGStyleDiscriminator,
    create_model,
)

__all__ = [
    "DIV2K_RGB_MEAN", "MeanShift", "ResBlock", "Upsampler", "pixel_shuffle",
    "EDSR", "ESPCN", "FSRCNN", "MODELS", "RRDB", "RRDBNet", "SRCNN",
    "VGGStyleDiscriminator", "create_model",
]
