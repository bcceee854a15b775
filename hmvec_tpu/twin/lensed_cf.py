"""Independent numpy/scipy oracle for the resummed flat-sky lensed Cls.

Same equations as models/lensed_cf.py derived in its docstring, but
evaluated with scipy.special.jn (no shared Bessel code: the jax side
uses the in-repo Chebyshev J0 + autodiff J1 + upward recurrence) and
plain numpy einsum/matmul over fully materialized (l, theta) grids.
"""

from __future__ import annotations

import numpy as np
from scipy.special import jn


def lens_cls_flat_sky_resummed(cl_unlensed, clpp, lmax_out=None,
                               n_theta=8192, theta_max=np.pi):
    cl = np.asarray(cl_unlensed, dtype=np.float64)
    clpp = np.asarray(clpp, dtype=np.float64)
    lmax_in = cl.shape[0] - 1
    if lmax_out is None:
        lmax_out = lmax_in

    t, w = np.polynomial.legendre.leggauss(n_theta)
    th = 0.5 * theta_max * (t + 1.0)
    wth = 0.5 * theta_max * w

    # displacement correlations
    lpp = np.arange(clpp.shape[0], dtype=np.float64)
    wpp = lpp**3 * clpp / (2.0 * np.pi)
    xpp = np.outer(lpp, th)
    sig2 = wpp @ (1.0 - jn(0, xpp))
    cgl2 = wpp @ jn(2, xpp)

    ls = np.arange(lmax_in + 1, dtype=np.float64)
    lw = np.where(ls >= 2.0, ls / (2.0 * np.pi), 0.0)
    x = np.outer(ls, th)
    j0, j2, j4, j6 = (jn(n, x) for n in (0, 2, 4, 6))
    damp = np.exp(-0.5 * ls[:, None] ** 2 * sig2[None, :])
    q = 0.25 * ls[:, None] ** 2 * cgl2[None, :]
    k0 = damp * (j0 + 2.0 * q * j2) - j0
    k4 = damp * (j4 + q * (j2 + j6)) - j4
    k2 = damp * (j2 + q * (j0 + j4)) - j2

    d_t = (lw * cl[:, 0]) @ k0
    d_p = (lw * (cl[:, 1] + cl[:, 2])) @ k0
    d_m = (lw * (cl[:, 1] - cl[:, 2])) @ k4
    d_x = (lw * cl[:, 3]) @ k2

    lo = np.arange(lmax_out + 1, dtype=np.float64)
    xo = np.outer(lo, th)
    tw = th * wth
    dct = 2.0 * np.pi * (jn(0, xo) @ (tw * d_t))
    dcp = 2.0 * np.pi * (jn(0, xo) @ (tw * d_p))
    dcm = 2.0 * np.pi * (jn(4, xo) @ (tw * d_m))
    dcx = 2.0 * np.pi * (jn(2, xo) @ (tw * d_x))

    out = np.zeros((lmax_out + 1, 4))
    base = cl[:lmax_out + 1]
    out[:, 0] = base[:, 0] + dct
    out[:, 1] = base[:, 1] + 0.5 * (dcp + dcm)
    out[:, 2] = base[:, 2] + 0.5 * (dcp - dcm)
    out[:, 3] = base[:, 3] + dcx
    out[:2] = 0.0
    return out
