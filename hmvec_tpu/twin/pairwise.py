"""Explicit-loop numpy oracle for the pairwise-kSZ ingredients
(models/pairwise.py).  Independent quadrature (dense Simpson on a
uniform x grid per (z, m), scipy.integrate.simpson) and independent
formula assembly; shares only the published Battaglia-16 fit constants.
"""

import numpy as np
from scipy.integrate import simpson

from .halo_ext import battaglia_fit

SIGMA_T_SI = 6.6524e-29
M_PROTON_SI = 1.673e-27
MSUN_KG = 1.989e30
METER_TO_MPC = 3.241e-23
XH = 0.76


def rho_gas_battaglia(x, m200, z, omb, omm, rhocritz, gamma, fp):
    """Battaglia-16 gas density at x = 2r/R200 (plain numpy powers)."""
    rho0 = battaglia_fit(m200, z, fp["rho0_A0"], fp["rho0_alpham"],
                         fp["rho0_alphaz"])
    alpha = battaglia_fit(m200, z, fp["alpha_A0"], fp["alpha_alpham"],
                          fp["alpha_alphaz"])
    beta = battaglia_fit(m200, z, fp["beta_A0"], fp["beta_alpham"],
                         fp["beta_alphaz"])
    return ((omb / omm) * rhocritz * rho0 * x**gamma
            * (1.0 + x**alpha) ** (-(beta + gamma) / alpha))


def shell_fraction(r, R):
    if r <= R:
        return 1.0
    return 1.0 - np.sqrt(1.0 - (R / r) ** 2)


def tau_aperture(zs, m200, r200, cmax, rhocritz, omb, omm, R_ap, gamma,
                 fp, n=4097):
    """tau_bar(z, m): explicit (i, j) loops, uniform-grid Simpson in x."""
    zs = np.asarray(zs, dtype=float)
    nz, nm = np.asarray(m200).shape
    out = np.zeros((nz, nm))
    R_ap = np.asarray(R_ap, dtype=float)
    if R_ap.ndim == 0:
        R_ap = np.full(nz, float(R_ap))
    for i in range(nz):
        for j in range(nm):
            c = float(cmax[i, j])
            rg = float(r200[i, j]) / 2.0

            def _f(xs):
                rho = rho_gas_battaglia(xs, float(m200[i, j]), zs[i],
                                        omb, omm, float(rhocritz[i]),
                                        gamma, fp)
                ne = rho * (MSUN_KG / M_PROTON_SI) * (1.0 + XH) / 2.0
                w = np.array([shell_fraction(x * rg, R_ap[i])
                              for x in xs])
                return xs**2 * ne * w

            # split at the aperture-edge kink (like the jax quadrature);
            # panel 2 under u^2 = x - e, which removes the sqrt endpoint
            # singularity of the shell fraction
            e = min(R_ap[i] / rg, c)
            xs1 = np.linspace(0.0, e, n)[1:]
            I1 = simpson(_f(xs1), x=xs1) if e > 0 else 0.0
            if c > e:
                us = np.linspace(0.0, np.sqrt(c - e), n)
                I2 = simpson(2.0 * us * _f(e + us**2), x=us)
            else:
                I2 = 0.0
            Ne = 4.0 * np.pi * rg**3 * (I1 + I2)
            out[i, j] = (SIGMA_T_SI * METER_TO_MPC**2 * Ne
                         / (np.pi * R_ap[i] ** 2))
    return out
