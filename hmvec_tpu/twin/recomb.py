"""Independent scipy oracle for the recombination history.

Same physical model as models/recomb.py (coupled H+He Saha -> Peebles
three-level atom with the RECFAST case-B fudge, tanh reionization) but
an independent implementation:
integrated in redshift (not ln a) with adaptive `solve_ivp` (not fixed
RK4), and every dimensional prefactor is DERIVED here from
scipy.constants rather than hard-coded -- so a unit or transcription
slip in models/recomb.py's numeric constants is caught by the parity
test (the same pattern that caught the Battaglia G-constant bug).

The reference delegates all ionization history to CAMB
(/root/reference/hmvec/cosmology.py:67-81); nothing here mirrors
reference code.
"""

from __future__ import annotations

import numpy as np
import scipy.constants as sc
from scipy.integrate import solve_ivp
from scipy.optimize import brentq

# derived constants (SI unless noted)
_E0_J = sc.physical_constants["Rydberg constant times hc in J"][0]
_E0_EV = sc.physical_constants["Rydberg constant times hc in eV"][0]
_LAMBDA_2S1S = 8.227                      # s^-1 (published 2s->1s rate)
_MPC_M = 3.0856775814913673e22
_RHO_CRIT_H2 = 3.0 * (1e5 / _MPC_M) ** 2 / (8.0 * np.pi * sc.G)  # kg/m^3
_LBAR_C = sc.hbar / (sc.m_e * sc.c)       # reduced Compton wavelength [m]
_ALPHA2_PREF = (64.0 * np.pi / np.sqrt(27.0 * np.pi)
                * sc.alpha**2 * _LBAR_C**2 * sc.c)       # m^3/s
_THERM = (sc.m_e * sc.k / (2.0 * np.pi * sc.hbar**2)) ** 1.5  # * T^1.5 -> m^-3
_LYA = (3.0 * _E0_J / (sc.hbar * sc.c)) ** 3 / (8.0 * np.pi) ** 2  # m^-3
_H0_SI = 1e3 / _MPC_M                     # (km/s/Mpc) -> 1/s
_FUDGE_B = 1.14                           # RECFAST case-B fudge (SSS 1999)
_CHI_HE1_J = 24.587387 * sc.e             # He I ionization [J] (NIST)
_CHI_HE2_J = 54.417760 * sc.e             # He II ionization [J] (NIST)


def _e_of_z(z, omm, omr, omk, oml, w0, wa):
    a = 1.0 / (1.0 + z)
    de = a ** (-3.0 * (1.0 + w0 + wa)) * np.exp(-3.0 * wa * (1.0 - a))
    return np.sqrt(omr * (1 + z) ** 4 + omm * (1 + z) ** 3
                   + omk * (1 + z) ** 2 + oml * de)


def _saha_xe(nh_m3, t_k):
    s = _THERM * t_k**1.5 * np.exp(-_E0_J / (sc.k * t_k)) / nh_m3
    return 2.0 / (1.0 + np.sqrt(1.0 + 4.0 / max(s, 1e-300)))


def _saha_coupled(nh_m3, t_k, f_he):
    """Coupled H+He Saha: root-solve for x_e = n_e/n_H in [eps, 1+2f_He].

    Independent method from models/recomb.py's damped fixed point: the
    scalar residual x_e - [x_H(x_e) + f_He (y1 + 2 y2)(x_e)] is bracketed
    and solved with brentq.  Returns (x_e, x_H).
    """
    kt = sc.k * t_k
    therm = _THERM * t_k**1.5 / nh_m3
    s1 = max(therm * np.exp(-_E0_J / kt), 1e-300)
    s2 = 4.0 * therm * np.exp(-min(_CHI_HE1_J / kt, 650.0))
    s3 = therm * np.exp(-min(_CHI_HE2_J / kt, 650.0))

    def parts(xe):
        xh = s1 / (s1 + xe)
        y1 = s2 / (xe + s2 * (1.0 + s3 / xe))
        y2 = y1 * s3 / xe
        return xh, y1, y2

    def resid(xe):
        xh, y1, y2 = parts(xe)
        return xe - (xh + f_he * (y1 + 2.0 * y2))

    hi = 1.0 + 2.0 * f_he
    if resid(1e-12) > 0.0:          # fully recombined limit
        xe = 1e-12
    else:
        xe = brentq(resid, 1e-12, hi, xtol=1e-15, rtol=1e-14)
    return xe, parts(xe)[0]


def twin_recombination(H0, ombh2, omm, omr, omk, oml, Yp, T_cmb,
                       w0=-1.0, wa=0.0, zre=7.7, dz_re=0.5):
    """Return dict with callables/arrays: xe(z) on a dense grid, tau_reio,
    visibility-peak redshift, and freeze-out xe.

    omm here includes massive neutrinos as matter (same convention the
    background module uses for H(z)).
    """
    h = H0 / 100.0
    nh0 = (1.0 - Yp) * ombh2 * _RHO_CRIT_H2 / (sc.m_p + sc.m_e)  # m^-3
    f_he = Yp / (4.0 * (1.0 - Yp))

    def h_si(z):
        return H0 * _H0_SI * _e_of_z(z, omm, omr, omk, oml, w0, wa)

    def nh(z):
        return nh0 * (1.0 + z) ** 3

    def tgas(z):
        return T_cmb * (1.0 + z)

    # Saha handoff: the z where the HYDROGEN Saha fraction crosses 0.985
    z_hand = brentq(
        lambda z: _saha_coupled(nh(z), tgas(z), f_he)[1] - 0.985,
        900.0, 2500.0)

    def dxe_dz(z, y):
        xe = y[0]
        t_k = tgas(z)
        t_ev_ratio = _E0_J / (sc.k * t_k)
        phi2 = 0.448 * np.log(t_ev_ratio)
        alpha2 = _FUDGE_B * _ALPHA2_PREF * np.sqrt(t_ev_ratio) * phi2  # m^3/s
        therm = _THERM * t_k**1.5
        beta = alpha2 * therm * np.exp(-t_ev_ratio)
        beta2 = alpha2 * therm * np.exp(-0.25 * t_ev_ratio)
        n1s = max((1.0 - xe) * nh(z), 1e-30)
        lam_a = h_si(z) * _LYA / n1s
        cr = (_LAMBDA_2S1S + lam_a) / (_LAMBDA_2S1S + lam_a + beta2)
        dxe_dt = cr * (beta * (1.0 - xe) - nh(z) * alpha2 * xe**2)
        return [-dxe_dt / ((1.0 + z) * h_si(z))]

    sol = solve_ivp(dxe_dz, (z_hand, 0.0), [0.985], method="LSODA",
                    rtol=1e-9, atol=1e-12, dense_output=True)
    assert sol.success

    def xe_of_z(z):
        z = np.asarray(z, dtype=float)
        xe = np.where(
            z >= z_hand,
            np.vectorize(
                lambda zz: _saha_coupled(nh(zz), tgas(zz), f_he)[0])(
                np.maximum(z, z_hand)),
            sol.sol(np.minimum(z, z_hand))[0])
        # reionization floor (CAMB-style tanh in y=(1+z)^1.5)
        y = (1.0 + z) ** 1.5
        yre = (1.0 + zre) ** 1.5
        dy = 1.5 * np.sqrt(1.0 + zre) * dz_re
        xre = 0.5 * (1.0 + f_he) * (1.0 + np.tanh((yre - y) / dy))
        return np.maximum(xe, xre)

    # optical depth dtau/dz = sigma_T n_e c / ((1+z) H)
    zs = np.linspace(0.0, 1800.0, 40001)
    integrand = (sc.physical_constants["Thomson cross section"][0]
                 * xe_of_z(zs) * nh(zs) * sc.c / ((1.0 + zs) * h_si(zs)))
    tau = np.concatenate([[0.0], np.cumsum(
        0.5 * (integrand[1:] + integrand[:-1]) * np.diff(zs))])
    gvis = integrand * np.exp(-tau)
    hi = zs > 500.0       # exclude the reionization bump of g
    z_vis_peak = zs[hi][np.argmax(gvis[hi])]
    tau_reio = float(np.interp(30.0, zs, tau))
    return {"xe_of_z": xe_of_z, "zs": zs, "tau_of_z": tau,
            "z_vis_peak": float(z_vis_peak), "tau_reio": tau_reio,
            "xe_freeze": float(xe_of_z(np.array(50.0)))}
