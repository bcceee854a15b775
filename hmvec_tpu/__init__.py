"""hmvec_tpu: a TPU-native JAX halo-model / HOD / kSZ-forecasting framework.

A ground-up rebuild of the capabilities of simonsobs/hmvec (mounted read-only
at /root/reference in this workspace) designed for TPU execution:

* pure staged functions over immutable pytrees (background -> mass function
  -> profiles/HOD -> spectra -> projections), jit- and grad-compatible
  end-to-end (the "Fisher flowdown" of reference hmvec.py:50-64 made
  explicit);
* all integrals are static-weight contractions (MXU/VPU friendly);
* the numeric profile transform is a batched sine-DFT **matmul** plus a
  closed-form gather resample -- replacing the reference's rfft + python
  (z, m) interpolation double loop (fft.py:97-115);
* optional sharding of the mass axis over a device mesh
  (hmvec_tpu.parallel).

Importing this package enables JAX x64 by default (see utils/config.py).
"""

from .utils import config as _config  # noqa: F401  (enables x64 first)

from .params import default_params, battaglia_defaults, merge_params  # noqa: F401,E402

__version__ = "0.1.0"
