"""Numpy twin of the numeric profile transform (reference fft.py:35-115).

Implements the same algorithm shape as the reference -- batched rfft over
(z, m, x) plus per-(z, m) np.interp onto the target ks -- to serve as the
parity oracle for the TPU sine-DFT + gather kernel, and as the timed CPU
baseline for the Battaglia benchmark config.
"""

from __future__ import annotations

import numpy as np


def fft_integral(x, y):
    """int dx x sin(kx) y(x) via rfft (reference fft.py:35-51 semantics,
    including its step = extent/N convention)."""
    assert x.ndim == 1
    extent = x[-1] - x[0]
    n = x.size
    step = extent / n
    integrand = x * y
    uk = -np.fft.rfft(integrand, axis=-1).imag * step
    ks = np.fft.rfftfreq(n, step) * 2.0 * np.pi
    return ks, uk


def generic_profile_fft(rhofunc_x, cmaxs, rss, zs, ks, xmax, nxs,
                        do_mass_norm=True):
    """Reference-equivalent numeric transform (fft.py:56-115)."""
    xs = np.linspace(0.0, xmax, nxs + 1)[1:]
    rhos = rhofunc_x(xs)
    if rhos.ndim == 1:
        rhos = np.broadcast_to(rhos[None, None, :],
                               cmaxs.shape + (nxs,)).copy()
    theta = np.ones(rhos.shape)
    theta[np.abs(xs) > cmaxs[..., None]] = 0
    integrand = theta * rhos * xs**2
    if do_mass_norm:
        mnorm = np.trapezoid(integrand, xs)
    else:
        mnorm = np.ones(rhos.shape[:-1])
    integrand = rhos * theta
    kts, ukts = fft_integral(xs, integrand)
    with np.errstate(divide="ignore", invalid="ignore"):
        uk = ukts / kts[None, None, :] / mnorm[..., None]
    kouts = kts / rss[..., None] / (1.0 + zs[:, None, None])
    nz, nm = uk.shape[:2]
    out = np.zeros((nz, nm, ks.size))
    for i in range(nz):
        for j in range(nm):
            pks = kouts[i, j][1:]   # drop kt=0
            puks = uk[i, j][1:]
            out[i, j] = np.interp(ks, pks, puks, left=puks[0], right=0.0)
    return ks, out
