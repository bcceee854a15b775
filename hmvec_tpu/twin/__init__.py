"""Pure-numpy twin of the hmvec_tpu pipeline.

This is the parity oracle and CPU baseline: a from-scratch float64 numpy
implementation of the same math (NOT a copy of the reference -- the
reference cannot even be imported here since CAMB is absent).  Tests assert
the JAX pipeline matches this twin to <=1e-5 relative error (it matches to
~1e-12 in f64), and bench.py times it as the "numpy reference" baseline.

No jax imports allowed in this subpackage.
"""
