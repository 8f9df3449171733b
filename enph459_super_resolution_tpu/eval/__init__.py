"""Evaluation: PSNR/SSIM, slanted-edge MTF, contrast, decode confidence."""

from . import ean13
from .decode import (
    HAVE_ZXING,
    decode_confidence,
    jitter_offsets,
    jittered_crops,
)
from .metrics import local_contrast, psnr, shave_border, ssim, y_channel
from .slanted_edge import esf_to_mtf, slanted_edge_esf, slanted_edge_mtf

__all__ = [
    "ean13",
    "HAVE_ZXING", "decode_confidence", "jitter_offsets", "jittered_crops",
    "local_contrast", "psnr", "shave_border", "ssim", "y_channel",
    "esf_to_mtf", "slanted_edge_esf", "slanted_edge_mtf",
]
