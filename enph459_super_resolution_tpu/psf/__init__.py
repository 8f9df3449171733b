"""PSF/MTF characterization toolkit."""

from .kernels import load_measured_psf, make_gaussian_psf

__all__ = ["load_measured_psf", "make_gaussian_psf"]
