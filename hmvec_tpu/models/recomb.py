"""Recombination history: Saha + Peebles x_e(a), optical depth, visibility.

Engine-free ionization history for the boltzlite reduced Boltzmann solver
(the reference delegates all of this to CAMB/CLASS inside
``get_cmb_cls``, /root/reference/hmvec/cosmology.py:67-81; nothing in the
reference computes recombination itself).  Physics: hydrogen Saha
equilibrium while x_e > ~0.99, then the Peebles three-level-atom ODE
(Peebles 1968; Ma & Bertschinger 1995 eq. 68-70) integrated with a
fixed-step RK4 `lax.scan` in x = ln a, plus a CAMB-style tanh
reionization.  The Peebles case-B coefficient carries the standard
RECFAST fudge factor F = 1.14 (Seager, Sasselov & Scott 1999) that
reproduces the multi-level-atom speed-up of hydrogen recombination.
Helium enters through coupled Saha equilibrium at early times (both
ionization stages; He recombination dynamics at z ~ 1800-6000 is
Saha-accurate to the percent level because He recombines while still
tightly Thomson-coupled), through the (1 - Yp) hydrogen fraction, and
through the reionization plateau 1 + f_He.

Accuracy: ~percent in x_e around z ~ 1100 vs RECFAST-class codes
(Saha helium, no matter-temperature evolution, T_b = T_gamma) --
consistent with the few-percent C_l target of boltzlite.  An
independent scipy `solve_ivp` twin lives in twin/recomb.py.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import background as bgmod

# --- constants (CGS + eV) -------------------------------------------------
EPS0_EV = 13.605693122994      # hydrogen ionization energy [eV]
KB_EV_PER_K = 8.617333262e-5   # Boltzmann [eV/K]
MPC_CM = 3.0856775814913673e24
SIGMA_T_CM2 = 6.6524587321e-25
M_H_G = 1.6735575e-24          # hydrogen atom mass [g]
RHO_CRIT_H2 = 1.878341616e-29  # rho_crit0/h^2 [g/cm^3]
LAMBDA_2S1S = 8.227            # 2s->1s two-photon rate [1/s]
# alpha^(2)(T) = 64 pi/sqrt(27 pi) * (alpha*lambdabar_C)^2 c * phi2
#   (alpha*lambdabar_C)^2 c = r_e^2 c = 2.3809e-15 cm^3/s
_ALPHA2_PREF = 21.8252 * 2.380865e-15   # cm^3/s
# (m_e c^2 / (2 pi (hbar c)^2))^{3/2} = 3.01921e21 cm^-3 eV^-3/2
_THERMAL_PREF = 3.019213e21
# (3 eps0 / hbar c)^3 / (8 pi)^2  [cm^-3] for Lambda_alpha
_LYA_PREF = 1.40129e16
_H0_UNIT = 3.2407792700e-20    # (km/s/Mpc) -> 1/s
_FUDGE = 1.14                  # RECFAST case-B correction (SSS 1999)
CHI_HE1_EV = 24.587387         # He I  first-ionization energy [eV]
CHI_HE2_EV = 54.417760         # He II second-ionization energy [eV]


class RecombTable(NamedTuple):
    """Ionization/visibility history on a uniform x = ln a grid."""

    xs: jnp.ndarray        # (n,) ln a, uniform, ascending to 0
    xe: jnp.ndarray        # (n,) n_e / n_H (reionization included)
    tau: jnp.ndarray       # (n,) Thomson optical depth to x=0
    tau_x: jnp.ndarray     # (n,) d tau / dx  (negative)
    gvis: jnp.ndarray      # (n,) visibility g = -tau_x * exp(-tau)
    eta: jnp.ndarray       # (n,) conformal time [Mpc]
    eta0: jnp.ndarray      # scalar: conformal age [Mpc]


def _peebles_rates(xe, nh_cm3, tb_ev, h_s):
    """dx_e/dx from the Peebles ODE (x = ln a, H in 1/s, n_H in cm^-3)."""
    lnratio = jnp.log(EPS0_EV / tb_ev)
    phi2 = 0.448 * lnratio
    alpha2 = _FUDGE * _ALPHA2_PREF * jnp.sqrt(EPS0_EV / tb_ev) * phi2  # cm^3/s
    therm = _THERMAL_PREF * tb_ev ** 1.5
    beta = alpha2 * therm * jnp.exp(-EPS0_EV / tb_ev)                 # 1/s
    # beta2 = beta * e^{3 eps0/4T} computed directly (avoids overflow)
    beta2 = alpha2 * therm * jnp.exp(-0.25 * EPS0_EV / tb_ev)
    n1s = jnp.maximum((1.0 - xe) * nh_cm3, 1e-30)
    lam_alpha = h_s * _LYA_PREF / n1s
    cr = (LAMBDA_2S1S + lam_alpha) / (LAMBDA_2S1S + lam_alpha + beta2)
    dxe_dt = cr * (beta * (1.0 - xe) - nh_cm3 * alpha2 * xe**2)
    return dxe_dt / h_s


def _saha_xe(nh_cm3, tb_ev):
    """Hydrogen-only Saha x_e: x^2/(1-x) = S, solved stably."""
    s = _THERMAL_PREF * tb_ev**1.5 * jnp.exp(-EPS0_EV / tb_ev) / nh_cm3
    s = jnp.maximum(s, 1e-30)
    return 2.0 / (1.0 + jnp.sqrt(1.0 + 4.0 / s))


def _saha_coupled(nh_cm3, tb_ev, f_he, n_iter: int = 40):
    """Coupled H + He Saha equilibrium sharing one electron bath.

    Solves (x_e = n_e/n_H; y1, y2 = singly/doubly ionized He fractions):
        x_H x_e / (1 - x_H)       = s1          (chi = 13.6 eV, g-ratio 1)
        y1  x_e / (1 - y1 - y2)   = s2          (chi = 24.59 eV, g-ratio 4)
        y2  x_e / y1              = s3          (chi = 54.42 eV, g-ratio 1)
        x_e = x_H + f_he (y1 + 2 y2)
    by damped fixed-point iteration (monotone in x_e; ~40 trips converge
    to f64 roundoff over the whole table range).  Returns (x_e, x_H).
    """
    therm = _THERMAL_PREF * tb_ev**1.5 / nh_cm3
    s1 = jnp.maximum(therm * jnp.exp(-EPS0_EV / tb_ev), 1e-300)
    s2 = 4.0 * therm * jnp.exp(-jnp.minimum(CHI_HE1_EV / tb_ev, 650.0))
    s3 = therm * jnp.exp(-jnp.minimum(CHI_HE2_EV / tb_ev, 650.0))

    def body(_, xe):
        xe = jnp.maximum(xe, 1e-12)
        xh = s1 / (s1 + xe)
        y1 = s2 / (xe + s2 * (1.0 + s3 / xe))
        y2 = y1 * s3 / xe
        xe_new = xh + f_he * (y1 + 2.0 * y2)
        return 0.5 * (xe + xe_new)

    xe = jax.lax.fori_loop(0, n_iter, body, jnp.ones_like(s1) + 2.0 * f_he)
    xe = jnp.maximum(xe, 1e-12)
    return xe, s1 / (s1 + xe)


def _reio_xe(z, zre, f_he, dz=0.5):
    """CAMB-style tanh reionization in y = (1+z)^1.5 (+He single ion.)."""
    y = (1.0 + z) ** 1.5
    yre = (1.0 + zre) ** 1.5
    dy = 1.5 * jnp.sqrt(1.0 + zre) * dz
    return 0.5 * (1.0 + f_he) * (1.0 + jnp.tanh((yre - y) / dy))


def recombination(bg: bgmod.BackgroundParams, n: int = 16384,
                  x_init: float = -18.0, zre: float = 7.7,
                  massive_nu: bool = False) -> RecombTable:
    """Full ionization history on a uniform ln-a grid (RK4 scan).

    Saha is used while its x_e > 0.985 (blended smoothly); the Peebles
    ODE takes over through recombination and freeze-out.

    massive_nu=True integrates with the EXACT Fermi-Dirac neutrino
    background (boltzlite.e_of_z_fd) instead of the mnu-as-matter
    bookkeeping -- the FD-consistent H(z) for the massive_nu=True
    hierarchy (ADVICE r4: with mnu > 0 the species is semi-relativistic
    at recombination, so counting it as matter misstates H there by the
    relativistic excess; exactly identical at mnu = 0).
    """
    if massive_nu:
        from .boltzlite import e_of_z_fd as _e_of_z
    else:
        _e_of_z = bgmod.e_of_z
    h = bg.H0 / 100.0
    nh0 = (1.0 - bg.Yp) * bg.ombh2 * RHO_CRIT_H2 / M_H_G    # cm^-3 at a=1
    f_he = bg.Yp / (4.0 * (1.0 - bg.Yp))
    tcmb_ev = bg.T_cmb_k * KB_EV_PER_K

    xs = jnp.linspace(x_init, 0.0, n)
    dx = xs[1] - xs[0]

    def h_of_x(x):
        z = jnp.exp(-x) - 1.0
        return bg.H0 * _e_of_z(bg, z) * _H0_UNIT / 100.0 * 100.0

    def rhs(x, xe):
        a = jnp.exp(x)
        nh = nh0 * a**-3
        tb = tcmb_ev / a
        hs = h_of_x(x)
        _, saha_xh = _saha_coupled(nh, tb, f_he)
        pee = _peebles_rates(xe, nh, tb, hs)
        # while HYDROGEN Saha predicts near-full ionization, pin to the
        # coupled Saha solution (its d xe/dx is what the ODE would give
        # in equilibrium anyway); by the handoff (z ~ 1630) helium is
        # neutral, so the Peebles branch stays hydrogen-only
        use_saha = saha_xh > 0.985
        return jnp.where(use_saha, 0.0, pee), saha_xh, use_saha

    def step(xe, x):
        # RK4 on the Peebles branch; hard-assign the Saha value while
        # in equilibrium (stiff-free: equilibrium tracks exactly)
        k1, saha, use_saha = rhs(x, xe)
        k2, _, _ = rhs(x + 0.5 * dx, xe + 0.5 * dx * k1)
        k3, _, _ = rhs(x + 0.5 * dx, xe + 0.5 * dx * k2)
        k4, _, _ = rhs(x + dx, xe + dx * k3)
        xe_new = xe + (dx / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)
        xe_new = jnp.where(use_saha, _saha_next(x + dx), xe_new)
        return xe_new, xe_new

    def _saha_next(x):
        a = jnp.exp(x)
        xe_tot, _ = _saha_coupled(nh0 * a**-3, tcmb_ev / a, f_he)
        return xe_tot

    xe0 = jnp.asarray(1.0 + 2.0 * f_he)
    _, xe_hist = jax.lax.scan(step, xe0, xs[:-1])
    xe = jnp.concatenate([xe0[None], xe_hist])

    zs = jnp.exp(-xs) - 1.0
    xe = jnp.maximum(xe, _reio_xe(zs, zre, f_he))

    # d tau/dx = n_e sigma_T c / H  (dimensionless per e-fold), negative
    a_grid = jnp.exp(xs)
    ne = xe * nh0 * a_grid**-3
    hs = bg.H0 * _e_of_z(bg, zs) * _H0_UNIT
    tau_x = -ne * SIGMA_T_CM2 * 2.99792458e10 / hs

    # tau(x) = -int_x^0 tau_x dx' (trapezoid, exact on the table grid)
    seg = -0.5 * (tau_x[1:] + tau_x[:-1]) * dx
    tau = jnp.concatenate([jnp.cumsum(seg[::-1])[::-1], jnp.zeros(1)])
    gvis = -tau_x * jnp.exp(-tau)

    # conformal time eta(x) = int_0^a c da'/(a'^2 H) (trapezoid in x:
    # d eta/dx = c/(a H) [Mpc])
    detadx = (2.99792458e5 / (bg.H0 * _e_of_z(bg, zs))) / a_grid
    seg_eta = 0.5 * (detadx[1:] + detadx[:-1]) * dx
    eta_rel = jnp.concatenate([jnp.zeros(1), jnp.cumsum(seg_eta)])
    # absolute offset: eta at x_init from the RD closed form a/(H0 sqrt(omr))
    a_i = jnp.exp(xs[0])
    eta_i = (2.99792458e5 / bg.H0) * a_i / jnp.sqrt(bg.omr0)
    eta = eta_i + eta_rel
    eta0 = eta[-1]
    return RecombTable(xs=xs, xe=xe, tau=tau, tau_x=tau_x, gvis=gvis,
                       eta=eta, eta0=eta0)
