"""enph459_super_resolution_tpu — TPU-native multi-frame super-resolution framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
benedikthoward/ENPH459-Super-Resolution (classical multi-frame SR for
beam-shifted captures: Shift-and-Add + Iterative Back-Projection, PSF/MTF
characterization, calibration + collection orchestration, evaluation), plus
the neural-SR north-star stack (SRCNN/ESPCN/FSRCNN/EDSR/ESRGAN) it motivates.

Design stance (see SURVEY.md §7):
  * functional core — pure jit-compiled functions over stacked ``f32[N, H, W]``
    frame tensors; no Python loops over pixels anywhere on the compute path.
  * scipy.ndimage parity via exact-to-fp truncated FIR spline prefilters and
    matmul/conv samplers (MXU-friendly), not IIR recursions.
  * hardware behind ``hw`` protocols with a simulator default, so every layer
    of the reference (calibration, collection, SR, analysis) runs hermetically.
  * scaling via ``jax.sharding`` meshes: batch data-parallel across
    sessions/reps, spatial tiling with halo exchange for large grids.

Subpackages
-----------
ops       resampling / convolution / fft primitives (the foundation)
sr        classical SR solvers (SAA, IBP) + workload configs + pipeline
data      session loaders, metadata schemas, Bayer ops, dataset pipelines
psf       PSF/MTF characterization toolkit
eval      metrics: PSNR/SSIM, slanted-edge MTF, contrast, decode confidence
hw        hardware protocols (camera / beam steering / stage) + simulator
parallel  mesh utilities, tiled halo-exchange inference, DP/TP shardings
models    neural SR model zoo (SRCNN, ESPCN, FSRCNN, EDSR, RRDB/ESRGAN)
train     losses, EMA, train step, checkpointing
utils     config system, timing/tracing, registry
native    C++ host-side runtime pieces (threaded PNG loader) via ctypes
"""

__version__ = "0.1.0"
