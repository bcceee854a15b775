"""boltzlite: a reduced Boltzmann solver for engine-free primary CMB Cls.

The reference obtains TT/EE/TE/lensing Cls from CAMB
(/root/reference/hmvec/cosmology.py:67-81); no Boltzmann code exists in
this environment, so this module solves the linear Einstein-Boltzmann
system directly in JAX: conformal-Newtonian-gauge metric + CDM + baryons
+ photon multipole hierarchy (with polarization) + massless neutrinos,
per wavenumber, with Peebles recombination (models/recomb.py), a
tight-coupling approximation deep in the pre-recombination era, and
line-of-sight (Seljak-Zaldarriaga) integration of the sources.

TPU-native design: one fixed-step RK4 `lax.scan` over x = ln a, vmapped
over the (coarse) k-grid; sources are cubically interpolated onto a fine
k-grid and the LOS projection is a dense (l, k, x) contraction against a
precomputed spherical-Bessel table.  Everything is jit-compatible; no
data-dependent Python control flow (tight-coupling handoff is a
per-step `where`-select).

Equations follow the standard pedagogical formulation (Ma &
Bertschinger 1995; Dodelson ch. 4-8; Callin astro-ph/0606683 for the
x = ln a form and the tight-coupling slip).

Measured accuracy (round 3, evaluated AT the Planck-2018 best-fit
parameters against the published Planck-2018 anchors;
tests/test_boltzlite.py): acoustic-peak POSITIONS to 0.1-0.8%
(l = 221/538/817 vs 220.6/537.5/810.8); TT amplitudes within 1-4% of
the lensed anchors with no systematic sign (first peak -0.3%, first
trough +1.1%, peaks 2/3 -3.3%/+4.0%); EE(l=400) -3%, TE(150/300)
within 2% with correct sign structure and zero-crossings.  NOTE the
anchor cosmology matters: the repo's default fiducial pairs a
2015-style As = 2.2e-9 (calibrated against tau ~ 0.078) with
zre = 7.7 (tau ~ 0.054), which puts As e^-2tau -- and therefore every
acoustic amplitude -- +4.8% above the 2018 anchors; that combination,
not the solver, was the "+4-9% converged excess" documented earlier
(resolution in DEVNOTES.md, "boltzlite convergence study").  The
solver's residuals are numerically CONVERGED (l-node density, RK4
step, hierarchy cut L=8->12, fine-k interpolation each move features
by <= 0.13%).  Explicitly a labeled approximation tier, NOT a CAMB
replacement; the table path (ctor ``cls_table``) remains the
precision tier.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import background as bgmod
from .recomb import RecombTable, recombination

# state layout: [Phi, dc, vc, db, vb, Th0..Th8, ThP0..ThP8, N0..N8, dn, vn]
# (dn, vn) = massive-neutrino FLUID density contrast / velocity (round-4
# extension; exactly inert when mnu = 0 -- their metric feedback carries
# a factor rho_nu = 0, so the massless solution is bit-identical)
_L = 8                       # hierarchy truncation for photons/pol/neutrinos
_NTH = _L + 1
_I_PHI, _I_DC, _I_VC, _I_DB, _I_VB = 0, 1, 2, 3, 4
_I_TH = 5
_I_THP = _I_TH + _NTH
_I_N = _I_THP + _NTH
_I_NM = _I_N + _NTH          # massive-nu fluid: delta, v
_NSTATE = _I_NM + 2

_C_KMS = 299792.458

# --- massive-neutrino Fermi-Dirac integrals (fixed Gauss-Laguerre) --------
#
# rho_nu(a) = (omnu_rel / a^4) I_rho(y)/I_rho(0),  y = y0 a = m a / T_nu0,
# P_nu likewise with I_P; I_rho(0) = 7 pi^4/120, and the nonrelativistic
# limit I_rho -> y * 3 zeta(3)/2 ties omnu_rel to the standard
# omnu0 = mnu/93.14/h^2.  dI_rho/dy = (I_rho - 3 I_P)/y exactly, so
# d(rho_nu)/dx = -3 (1 + w) rho_nu with w = I_P/I_rho -- no extra tables.
_FD_Q, _FD_W = np.polynomial.laguerre.laggauss(64)
_FD_COMMON = _FD_W * _FD_Q**2 / (1.0 + np.exp(-np.minimum(_FD_Q, 500.0)))
_I_RHO0 = 7.0 * np.pi**4 / 120.0
_I_NUM = 1.8030853547393952          # int q^2/(e^q+1) = 3 zeta(3)/2
_KT_NU0_EV = 8.617333262e-5 * 2.7255 * (4.0 / 11.0) ** (1.0 / 3.0)


def _fd_rho_p(y):
    """(I_rho(y), I_P(y)) by 64-node Gauss-Laguerre; exact limits at both
    ends (y=0 radiation, y>>1 matter) to ~1e-10 relative."""
    q = jnp.asarray(_FD_Q)
    c = jnp.asarray(_FD_COMMON)
    s = jnp.sqrt(q * q + y * y)
    i_rho = jnp.sum(c * s)
    i_p = jnp.sum(c * q * q / s) / 3.0
    return i_rho, i_p


def _nu_rho_w(ctx, a):
    """(rho_nu(a)/rho_crit0, w_nu(a)) of the massive species; (0, 1/3)
    when the cosmology has no massive neutrinos."""
    y = ctx.y0_nu * a
    i_rho, i_p = _fd_rho_p(y)
    rho = ctx.omnu_rel / a**4 * i_rho / _I_RHO0
    w = i_p / jnp.maximum(i_rho, 1e-300)
    return rho, w


def _nu_rho_w_cg(ctx, a):
    """(rho, w, c_g^2): adiabatic sound speed c_g^2 = dP/drho along the
    expansion, = w - y w'(y) / (3 (1 + w)); exact 1/3 -> 0 limits."""
    y = ctx.y0_nu * a
    q = jnp.asarray(_FD_Q)
    c = jnp.asarray(_FD_COMMON)
    s = jnp.sqrt(q * q + y * y)
    i_rho = jnp.sum(c * s)
    i_p = jnp.sum(c * q * q / s) / 3.0
    di_rho = jnp.sum(c * y / s)                   # dI_rho/dy = y int q^2/s
    di_p = -(y / 3.0) * jnp.sum(c * q * q / s**3)
    rho = ctx.omnu_rel / a**4 * i_rho / _I_RHO0
    w = i_p / i_rho
    dw = (di_p * i_rho - i_p * di_rho) / i_rho**2
    cg2 = w - y * dw / (3.0 * (1.0 + w))
    return rho, w, cg2


def _nu_fluid_derivs(ctx, x, k, s, psi, dphi, ckh):
    """(d dn/dx, d vn/dx) of the massive-nu fluid (conformal Newtonian,
    this module's v-conventions: theta = -k v, d/dx = (1/Hp) d/deta;
    Ma & Bertschinger eq. 30 with delta P/delta rho = c_g^2, sigma = 0):

        dn' = (1+w)(ckh vn - 3 Phi') - 3 (c_g^2 - w) dn
        vn' = -(1 - 3 c_g^2) vn - ckh [ c_g^2 dn/(1+w) + Psi ]

    Reduces exactly to the CDM equations at (w, c_g^2) = 0 and to a
    shear-free radiation fluid at 1/3.  Accuracy of the omitted shear
    (ADVICE r4): at LATE times, once the species is nonrelativistic,
    the error on the total spectra is second order in f_nu; at EARLY
    times, with the default num_massive_neutrinos=3 the ENTIRE neutrino
    radiation share rides this shear-free fluid, so the radiation-era
    metric loses neutrino anisotropic stress -- a first-order-in-R_nu
    (~few %) effect there.  Set num_massive_neutrinos < 3 to keep the
    remainder in the exact massless hierarchy.  The eta/recombination
    tables are FD-consistent too when built with
    recombination(massive_nu=True) -- compute_cls and
    matter_power_slices do this automatically for mnu > 0 (round 5)."""
    a = jnp.exp(x)
    _, w, cg2 = _nu_rho_w_cg(ctx, a)
    dn = s[_I_NM]
    vn = s[_I_NM + 1]
    ddn = (1.0 + w) * (ckh * vn - 3.0 * dphi) - 3.0 * (cg2 - w) * dn
    dvn = -(1.0 - 3.0 * cg2) * vn - ckh * (cg2 * dn / (1.0 + w) + psi)
    return ddn, dvn


class BoltzCtx(NamedTuple):
    """Static per-cosmology context for the perturbation integration."""

    bg: bgmod.BackgroundParams
    h0m: jnp.ndarray          # H0/c in 1/Mpc
    omg: jnp.ndarray          # photon density parameter
    omnu: jnp.ndarray         # MASSLESS-neutrino density parameter
    omb: jnp.ndarray
    omc: jnp.ndarray
    # recombination tables on the uniform x-grid
    xs_t: jnp.ndarray
    lntaux_t: jnp.ndarray     # ln(-tau_x)
    dlntaux_t: jnp.ndarray    # d ln(-tau_x) / dx (for tau_xx)
    tau_t: jnp.ndarray
    eta_t: jnp.ndarray
    eta0: jnp.ndarray
    # massive-neutrino fluid (0 / inert when mnu = 0)
    omnm0: jnp.ndarray        # nonrelativistic Omega_nu today (mnu/93.14/h^2)
    y0_nu: jnp.ndarray        # m_nu,per-species a / T_nu0 at a = 1
    omnu_rel: jnp.ndarray     # relativistic-limit amplitude of rho_nu a^4


def fd_background_pieces(bg: bgmod.BackgroundParams):
    """(omg, omnu_massless, omnm0, y0, omnu_rel) -- the make_ctx
    bookkeeping for the Fermi-Dirac massive-neutrino background, shared
    with the FD-consistent recombination path (e_of_z_fd)."""
    h2 = (bg.H0 / 100.0) ** 2
    omg = 2.47282e-5 / h2
    omnu_all = bg.omr0 - omg
    omnm0 = bg.omnu0
    has_m = omnm0 > 0.0
    m_per = omnm0 * 93.14 * h2 / jnp.maximum(bg.nnu_m, 1.0)
    y0 = jnp.where(has_m, m_per / _KT_NU0_EV, 1.0)
    omnu_rel = jnp.where(has_m, omnm0 * _I_RHO0 / (y0 * _I_NUM), 0.0)
    f_ml = jnp.where(has_m, jnp.clip(1.0 - bg.nnu_m / 3.0, 0.0, 1.0), 1.0)
    return omg, omnu_all * f_ml, omnm0, y0, omnu_rel


def e_of_z_fd(bg: bgmod.BackgroundParams, z):
    """E(z) = H(z)/H0 with the EXACT Fermi-Dirac massive-neutrino
    density (vectorized in z).

    background.e_of_z counts mnu as pressureless matter at ALL times
    (reference-parity bookkeeping); at recombination the massive species
    are still (semi-)relativistic, so the mnu-as-matter H(z) is
    inconsistent with the FD background the massive_nu=True hierarchy
    integrates (ADVICE r4) -- this is the consistent form for the
    eta/recombination tables.  Exactly e_of_z when mnu = 0."""
    omg, omnu_ml, omnm0, y0, omnu_rel = fd_background_pieces(bg)
    z = jnp.asarray(z)
    scalar = z.ndim == 0
    zp1 = 1.0 + jnp.atleast_1d(z)
    a = 1.0 / zp1
    i_rho = jax.vmap(lambda aa: _fd_rho_p(y0 * aa)[0])(a)
    rho_nu = omnu_rel * zp1**4 * i_rho / _I_RHO0
    de = zp1 ** (3.0 * (1.0 + bg.w0 + bg.wa)) \
        * jnp.exp(-3.0 * bg.wa * (1.0 - 1.0 / zp1))
    e2 = ((omg + omnu_ml) * zp1**4 + bg.omm0 * zp1**3
          + bg.omk0 * zp1**2 + bg.oml0 * de + rho_nu)
    e = jnp.sqrt(e2)
    return e[0] if scalar else e


def make_ctx(bg: bgmod.BackgroundParams, rec: RecombTable,
             massive_nu: bool = True) -> BoltzCtx:
    """massive_nu=False reproduces the round-3 bookkeeping exactly
    (mnu counted as both massless radiation AND extra matter -- the
    documented approximation); True moves the massive species onto the
    exact Fermi-Dirac background + the (dn, vn) fluid.  Identical when
    mnu = 0 either way."""
    h2 = (bg.H0 / 100.0) ** 2
    omg = 2.47282e-5 / h2
    lntaux = jnp.log(-rec.tau_x)
    dx = rec.xs[1] - rec.xs[0]
    dlntaux = jnp.gradient(lntaux) / dx
    omnu_all = bg.omr0 - omg              # all-massless-nu radiation
    omnm0 = bg.omnu0 if massive_nu else jnp.zeros_like(bg.omnu0)
    has_m = omnm0 > 0.0
    # per-species mass in eV: mnu = omnu0 * 93.14 * h^2, split over nnu_m
    m_per = omnm0 * 93.14 * h2 / jnp.maximum(bg.nnu_m, 1.0)
    y0 = jnp.where(has_m, m_per / _KT_NU0_EV, 1.0)
    omnu_rel = jnp.where(has_m, omnm0 * _I_RHO0 / (y0 * _I_NUM), 0.0)
    # the massive species' radiation share leaves the massless pool
    # (equal Neff shares across the 3 species)
    f_ml = jnp.where(has_m,
                     jnp.clip(1.0 - bg.nnu_m / 3.0, 0.0, 1.0), 1.0)
    return BoltzCtx(
        bg=bg, h0m=bg.H0 / _C_KMS,
        omg=jnp.asarray(omg), omnu=omnu_all * f_ml,
        omb=bg.ombh2 / h2, omc=bg.omch2 / h2,
        xs_t=rec.xs, lntaux_t=lntaux, dlntaux_t=dlntaux,
        tau_t=rec.tau, eta_t=rec.eta, eta0=rec.eta0,
        omnm0=omnm0, y0_nu=y0, omnu_rel=omnu_rel)


# --- background closed forms ---------------------------------------------

def _e2_and_slope(ctx: BoltzCtx, x):
    """E^2(x) = (H/H0)^2 and d E^2/dx (closed forms, w0/wa-aware).

    Massless radiation = photons + the massless-nu pool (ctx.omnu may
    exclude massive species); the massive species ride the exact
    Fermi-Dirac rho_nu(a) with d rho_nu/dx = -3 (1 + w) rho_nu.  When
    ctx carries no massive fluid (omnu_rel = 0) this reduces exactly to
    the round-3 form (mnu folded into matter)."""
    bg = ctx.bg
    a = jnp.exp(x)
    de = a ** (-3.0 * (1.0 + bg.w0 + bg.wa)) * jnp.exp(-3.0 * bg.wa * (1.0 - a))
    has_m = ctx.omnu_rel > 0.0
    omr = jnp.where(has_m, ctx.omg + ctx.omnu, bg.omr0)
    omm = jnp.where(has_m, bg.omm0, bg.omm0 + bg.omnu0)
    rho_nu, w_nu = _nu_rho_w(ctx, a)
    e2 = (omr / a**4 + omm / a**3 + bg.omk0 / a**2 + bg.oml0 * de
          + rho_nu)
    de2 = (-4.0 * omr / a**4 - 3.0 * omm / a**3 - 2.0 * bg.omk0 / a**2
           + bg.oml0 * de * (-3.0 * (1.0 + bg.w0 + bg.wa) + 3.0 * bg.wa * a)
           - 3.0 * (1.0 + w_nu) * rho_nu)
    return e2, de2


def _hp(ctx: BoltzCtx, x):
    """Conformal Hubble a'(eta)/a = a H / c in 1/Mpc."""
    e2, _ = _e2_and_slope(ctx, x)
    return ctx.h0m * jnp.exp(x) * jnp.sqrt(e2)


def _dlnhp(ctx: BoltzCtx, x):
    """d ln(Hp) / dx."""
    e2, de2 = _e2_and_slope(ctx, x)
    return 1.0 + 0.5 * de2 / e2


def _taux(ctx: BoltzCtx, x):
    """d tau/dx (negative), interpolated in ln|.| from the recomb table."""
    return -jnp.exp(jnp.interp(x, ctx.xs_t, ctx.lntaux_t))


def _tauxx(ctx: BoltzCtx, x):
    """d^2 tau/dx^2 = tau_x * d ln(-tau_x)/dx."""
    return _taux(ctx, x) * jnp.interp(x, ctx.xs_t, ctx.dlntaux_t)


def _eta(ctx: BoltzCtx, x):
    return jnp.interp(x, ctx.xs_t, ctx.eta_t)


# --- right-hand sides -----------------------------------------------------

def _psi_of(ctx, x, k, phi, th2, n2):
    a = jnp.exp(x)
    return (-phi
            - 12.0 * (ctx.h0m / (k * a)) ** 2 * (ctx.omg * th2 + ctx.omnu * n2))


def _common_metric(ctx, x, k, s):
    """(Psi, Phi') shared by the full and TC right-hand sides.

    Phi' comes from the MOMENTUM constraint (Ma & Bertschinger 1995
    eq. 23b mapped to these variables; phi_MB = -Phi, psi_MB = +Psi,
    theta = -k v, theta_gamma = 3 k Theta_1):

        Phi' = Psi + (3/2)(H0/Hp)^2 (Hp/k)
               [Om_c v_c/a + Om_b v_b/a - 4 Om_g Th1/a^2 - 4 Om_nu N1/a^2]

    The energy-constraint form Phi' = Psi - (k/Hp)^2 Phi/3 + ... is
    analytically equivalent but numerically STIFF subhorizon (decay rate
    (k/Hp)^2/3 blows up explicit RK4); the momentum form's coefficient
    scales as Hp/k and stays O(1).  The unused energy constraint is kept
    as `energy_constraint_residual` for tests.
    """
    a = jnp.exp(x)
    hp = _hp(ctx, x)
    ckh = k / hp
    phi = s[_I_PHI]
    th2 = s[_I_TH + 2]
    n2 = s[_I_N + 2]
    psi = _psi_of(ctx, x, k, phi, th2, n2)
    # massive-nu fluid momentum source: (rho+P) v a^2 with the same
    # normalization as the Om/a matter terms (rho_nu is the full
    # dimensionless rho_nu(a), so the factor is rho_nu (1+w) a^2 v)
    rho_nu, w_nu = _nu_rho_w(ctx, a)
    dphi = (psi + 1.5 * (ctx.h0m / hp) ** 2 * (hp / k)
            * (ctx.omc / a * s[_I_VC] + ctx.omb / a * s[_I_VB]
               - 4.0 * ctx.omg / a**2 * s[_I_TH + 1]
               - 4.0 * ctx.omnu / a**2 * s[_I_N + 1]
               + rho_nu * (1.0 + w_nu) * a**2 * s[_I_NM + 1]))
    return psi, dphi, hp, ckh


def energy_constraint_residual(ctx, x, k, s, dphi):
    """Residual of the (unevolved) energy constraint, for diagnostics:
    Phi' - [Psi - (k/Hp)^2 Phi/3 + (H0/Hp)^2/2 * sum(a^2 rho_i delta_i)].
    """
    a = jnp.exp(x)
    hp = _hp(ctx, x)
    phi = s[_I_PHI]
    psi = _psi_of(ctx, x, k, phi, s[_I_TH + 2], s[_I_N + 2])
    rho_nu, _ = _nu_rho_w(ctx, a)
    rhs = (psi - (k / hp) ** 2 / 3.0 * phi
           + (ctx.h0m / hp) ** 2 / 2.0
           * (ctx.omc / a * s[_I_DC] + ctx.omb / a * s[_I_DB]
              + 4.0 * ctx.omg / a**2 * s[_I_TH]
              + 4.0 * ctx.omnu / a**2 * s[_I_N]
              + rho_nu * a**2 * s[_I_NM]))
    return dphi - rhs


def _hierarchy_derivs(ckh, vals, taux, pi_eq, eta, hp, k, polarization):
    """d Theta_l / dx for l = 2..L (photon) or the same form for others.

    vals: (L+1,) multipoles; returns derivs for l>=2 (photon temperature),
    including the open truncation at l = L (Callin eq. 32).
    """
    derivs = []
    for ell in range(2, _L):
        d = (ckh * ell / (2 * ell + 1) * vals[ell - 1]
             - ckh * (ell + 1) / (2 * ell + 1) * vals[ell + 1]
             + taux * (vals[ell] - (pi_eq / 10.0 if ell == 2 else 0.0)))
        derivs.append(d)
    d_top = (ckh * vals[_L - 1]
             - (_L + 1) / (hp * eta) * vals[_L]
             + taux * vals[_L])
    derivs.append(d_top)
    return derivs


def _rhs_full(ctx: BoltzCtx, k, x, s):
    """Full (post-tight-coupling) Einstein-Boltzmann RHS, d/dx."""
    psi, dphi, hp, ckh = _common_metric(ctx, x, k, s)
    a = jnp.exp(x)
    taux = _taux(ctx, x)
    eta = _eta(ctx, x)

    th = s[_I_TH:_I_TH + _NTH]
    thp = s[_I_THP:_I_THP + _NTH]
    nn = s[_I_N:_I_N + _NTH]
    pi_eq = th[2] + thp[0] + thp[2]

    dvc = -s[_I_VC] - ckh * psi
    ddc = ckh * s[_I_VC] - 3.0 * dphi
    ddb = ckh * s[_I_VB] - 3.0 * dphi
    rb = 4.0 * ctx.omg / (3.0 * ctx.omb * a)
    dvb = -s[_I_VB] - ckh * psi + taux * rb * (3.0 * th[1] + s[_I_VB])

    dth0 = -ckh * th[1] - dphi
    dth1 = (ckh / 3.0) * (th[0] + psi) - (2.0 * ckh / 3.0) * th[2] \
        + taux * (th[1] + s[_I_VB] / 3.0)
    dth_hi = _hierarchy_derivs(ckh, th, taux, pi_eq, eta, hp, k, False)

    dthp0 = -ckh * thp[1] + taux * (thp[0] - pi_eq / 2.0)
    dthp1 = (ckh / 3.0) * thp[0] - (2.0 * ckh / 3.0) * thp[2] + taux * thp[1]
    dthp_hi = _hierarchy_derivs(ckh, thp, taux, pi_eq, eta, hp, k, True)

    dn0 = -ckh * nn[1] - dphi
    dn1 = (ckh / 3.0) * (nn[0] + psi) - (2.0 * ckh / 3.0) * nn[2]
    dn_hi = _hierarchy_derivs(ckh, nn, 0.0, 0.0, eta, hp, k, False)

    ddn_m, dvn_m = _nu_fluid_derivs(ctx, x, k, s, psi, dphi, ckh)
    return jnp.stack(
        [dphi, ddc, dvc, ddb, dvb, dth0, dth1, *dth_hi,
         dthp0, dthp1, *dthp_hi, dn0, dn1, *dn_hi, ddn_m, dvn_m])


def _slaved_multipoles(ctx, k, x, th1):
    """Tight-coupling algebraic multipoles from Theta_1."""
    hp = _hp(ctx, x)
    taux = _taux(ctx, x)
    ckhti = k / (hp * taux)
    th2 = -(8.0 / 15.0) * ckhti * th1
    ths = [th2]
    for ell in range(3, _NTH):
        ths.append(-(ell / (2.0 * ell + 1.0)) * ckhti * ths[-1])
    thp0 = 1.25 * th2
    thp1 = -0.25 * ckhti * th2
    thp2 = 0.25 * th2
    thps = [thp0, thp1, thp2]
    for ell in range(3, _NTH):
        thps.append(-(ell / (2.0 * ell + 1.0)) * ckhti * thps[-1])
    return jnp.stack(ths), jnp.stack(thps)


def _with_slaved(ctx, k, x, s):
    ths, thps = _slaved_multipoles(ctx, k, x, s[_I_TH + 1])
    return s.at[_I_TH + 2:_I_TH + _NTH].set(ths) \
            .at[_I_THP:_I_THP + _NTH].set(thps)


def _rhs_tc(ctx: BoltzCtx, k, x, s):
    """Tight-coupling RHS (Callin eqs. 70-71 slip expansion)."""
    s = _with_slaved(ctx, k, x, s)
    psi, dphi, hp, ckh = _common_metric(ctx, x, k, s)
    a = jnp.exp(x)
    taux = _taux(ctx, x)
    tauxx = _tauxx(ctx, x)
    dlnhp = _dlnhp(ctx, x)
    eta = _eta(ctx, x)

    th0, th1, th2 = s[_I_TH], s[_I_TH + 1], s[_I_TH + 2]
    vb = s[_I_VB]
    rb = 4.0 * ctx.omg / (3.0 * ctx.omb * a)

    dth0 = -ckh * th1 - dphi
    q = (-((1.0 - 2.0 * rb) * taux + (1.0 + rb) * tauxx) * (3.0 * th1 + vb)
         - ckh * psi
         + (1.0 - dlnhp) * ckh * (-th0 + 2.0 * th2)
         - ckh * dth0) / ((1.0 + rb) * taux + dlnhp - 1.0)
    dvb = (-vb - ckh * psi
           + rb * (q + ckh * (-th0 + 2.0 * th2) - ckh * psi)) / (1.0 + rb)
    dth1 = (q - dvb) / 3.0

    dvc = -s[_I_VC] - ckh * psi
    ddc = ckh * s[_I_VC] - 3.0 * dphi
    ddb = ckh * vb - 3.0 * dphi

    nn = s[_I_N:_I_N + _NTH]
    dn0 = -ckh * nn[1] - dphi
    dn1 = (ckh / 3.0) * (nn[0] + psi) - (2.0 * ckh / 3.0) * nn[2]
    dn_hi = _hierarchy_derivs(ckh, nn, 0.0, 0.0, eta, hp, k, False)

    zeros = [jnp.zeros(()) for _ in range(_NTH - 2)]   # slaved Theta_2..L
    zerosp = [jnp.zeros(()) for _ in range(_NTH)]      # slaved polarization
    ddn_m, dvn_m = _nu_fluid_derivs(ctx, x, k, s, psi, dphi, ckh)
    return jnp.stack(
        [dphi, ddc, dvc, ddb, dvb, dth0, dth1, *zeros, *zerosp,
         dn0, dn1, *dn_hi, ddn_m, dvn_m])


def _tc_active(ctx, k, x):
    """Tight coupling while tau_x is large vs both 1 and ck/Hp, and
    before recombination begins (z > ~1630)."""
    taux = _taux(ctx, x)
    hp = _hp(ctx, x)
    return ((jnp.abs(taux) > 10.0)
            & (jnp.abs(taux) > 10.0 * k / hp)
            & (x < jnp.log(1.0 / 1630.0)))


def _initial_state(ctx: BoltzCtx, k, x0):
    """Adiabatic growing-mode ICs deep in radiation domination, Phi = 1."""
    hp = _hp(ctx, x0)
    taux = _taux(ctx, x0)
    ckh = k / hp
    a0 = jnp.exp(x0)

    phi = jnp.asarray(1.0)
    fv = ctx.omnu / (ctx.omg + ctx.omnu)
    psi = -phi / (1.0 + 0.4 * fv)
    dc = -1.5 * psi
    vc = -0.5 * ckh * psi
    th0 = -0.5 * psi
    th1 = ckh * psi / 6.0
    s = jnp.zeros(_NSTATE)
    s = s.at[_I_PHI].set(phi).at[_I_DC].set(dc).at[_I_VC].set(vc)
    s = s.at[_I_DB].set(dc).at[_I_VB].set(vc)
    s = s.at[_I_TH].set(th0).at[_I_TH + 1].set(th1)
    s = s.at[_I_N].set(th0).at[_I_N + 1].set(th1)
    # N2 from the anisotropic-stress closure of Psi (guard: with every
    # species massive the massless pool is empty -- psi + phi = 0 there,
    # but 0/0 must not NaN)
    n2 = jnp.where(ctx.omnu > 0.0,
                   -(psi + phi) * (k * a0 / ctx.h0m) ** 2
                   / (12.0 * jnp.maximum(ctx.omnu, 1e-30)), 0.0)
    s = s.at[_I_N + 2].set(n2)
    # massive-nu fluid: adiabatic, ultra-relativistic at x0
    # (delta_i/(1+w_i) equal across species; w ~ 1/3 to ~1e-11 there)
    _, w0, _ = _nu_rho_w_cg(ctx, a0)
    s = s.at[_I_NM].set(3.0 * (1.0 + w0) * th0).at[_I_NM + 1].set(vc)
    return _with_slaved(ctx, k, x0, s)


# --- integration ----------------------------------------------------------

def _rk4_step(ctx, k, x, dx, s):
    def f(xx, ss):
        tc = _tc_active(ctx, k, xx)
        return jnp.where(tc, _rhs_tc(ctx, k, xx, ss),
                         _rhs_full(ctx, k, xx, ss))

    k1 = f(x, s)
    k2 = f(x + 0.5 * dx, s + 0.5 * dx * k1)
    k3 = f(x + 0.5 * dx, s + 0.5 * dx * k2)
    k4 = f(x + dx, s + dx * k3)
    s_new = s + (dx / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)
    # while tight-coupled, overwrite the slaved multipoles at the new time
    tc_new = _tc_active(ctx, k, x + dx)
    return jnp.where(tc_new, _with_slaved(ctx, k, x + dx, s_new), s_new)


def _integrate_segment(ctx, k, s0, x_start, dx, n_outer, n_inner):
    """n_outer x n_inner RK4 steps; store the state at each outer point."""

    def outer(carry, i_outer):
        s = carry
        x_block = x_start + i_outer * (n_inner * dx)

        def inner(j, ss):
            return _rk4_step(ctx, k, x_block + j * dx, dx, ss)

        s = jax.lax.fori_loop(0, n_inner, inner, s)
        return s, s

    s_end, stored = jax.lax.scan(outer, s0, jnp.arange(n_outer))
    xs = x_start + (jnp.arange(1, n_outer + 1)) * (n_inner * dx)
    return s_end, xs, stored


class PerturbSolution(NamedTuple):
    ks: jnp.ndarray         # (nk,) coarse wavenumbers [1/Mpc]
    xs: jnp.ndarray         # (nx,) LOS x-grid (ln a)
    states: jnp.ndarray     # (nk, nx, NSTATE)
    zeta_unit: jnp.ndarray  # comoving curvature per unit Phi_init


@partial(jax.jit, static_argnames=("n_a", "n_b_outer", "n_b_inner",
                                   "n_c_outer", "n_c_inner"))
def solve_perturbations(ctx: BoltzCtx, ks,
                        n_a: int = 1500,
                        n_b_outer: int = 1050, n_b_inner: int = 4,
                        n_c_outer: int = 380, n_c_inner: int = 11,
                        x0: float = -18.0) -> PerturbSolution:
    """Integrate the hierarchy for each k; store states on the LOS grid.

    Segments (x = ln a): A [x0, -9.2] tight-coupled, smooth, no storage;
    B [-9.2, -5.0] through recombination, stored every n_b_inner steps;
    C [-5.0, 0] ISW era, stored every n_c_inner steps.  Step sizes are
    set by the segment spans and counts; defaults resolve k <= 0.4/Mpc.

    Stability: the free-streaming hierarchy advects with d/dx eigenvalues
    ~ i k/Hp, so explicit RK4 needs k * (dx/Hp) < 2.83; 1/Hp is largest
    today (c/H0 ~ 4475 Mpc), giving the naive edge k ~ 2.83/(4475*dx_c),
    i.e. ~0.53/Mpc for the default n_c_inner=11 (dx_c ~ 1.2e-3).  The
    MEASURED edge is lower, 0.46-0.48/Mpc (metric/baryon coupling widens
    the spectrum; k=0.50 grows to ~1e77 by x=0) -- compute_cls scales
    n_c_inner with its kmax to hold a 35% margin; do the same for any
    direct call with k > ~0.45.
    """
    ks = jnp.asarray(ks)
    xs, states = _solve_ks(ctx, ks, n_a, n_b_outer, n_b_inner,
                           n_c_outer, n_c_inner, x0)
    zeta_unit = _zeta_unit(ctx, n_a, n_b_outer, n_b_inner,
                           n_c_outer, n_c_inner, x0)
    return PerturbSolution(ks=ks, xs=xs, states=states, zeta_unit=zeta_unit)


def _segment_grid(n_a, n_b_outer, n_b_inner, n_c_outer, n_c_inner, x0):
    xa, xb, xc = -9.2, -5.0, 0.0
    dx_a = (xa - x0) / n_a
    dx_b = (xb - xa) / (n_b_outer * n_b_inner)
    dx_c = (xc - xb) / (n_c_outer * n_c_inner)
    return xa, xb, dx_a, dx_b, dx_c


def _solve_ks(ctx, ks, n_a, n_b_outer, n_b_inner, n_c_outer, n_c_inner,
              x0):
    """vmapped hierarchy integration for a batch of k: (xs, states).

    The k axis is embarrassingly parallel -- this is the seam the
    sharded path (parallel.sharding.sharded_solve_perturbations) maps
    over the device mesh."""
    xa, xb, dx_a, dx_b, dx_c = _segment_grid(
        n_a, n_b_outer, n_b_inner, n_c_outer, n_c_inner, x0)

    def one_k(k):
        s = _initial_state(ctx, k, x0)
        s, _, _ = _integrate_segment(ctx, k, s, x0, dx_a, 30, n_a // 30)
        s, xs_b, st_b = _integrate_segment(ctx, k, s, xa, dx_b,
                                           n_b_outer, n_b_inner)
        _, xs_c, st_c = _integrate_segment(ctx, k, s, xb, dx_c,
                                           n_c_outer, n_c_inner)
        return jnp.concatenate([xs_b, xs_c]), \
            jnp.concatenate([st_b, st_c], axis=0)

    xs, states = jax.vmap(one_k)(ks)
    return xs[0], states


def _zeta_unit(ctx, n_a, n_b_outer, n_b_inner, n_c_outer, n_c_inner, x0):
    """Curvature normalization: a dedicated superhorizon mode evaluated
    in matter domination, zeta = (5/3) Phi_MD per unit Phi_init."""
    xa, xb, dx_a, dx_b, dx_c = _segment_grid(
        n_a, n_b_outer, n_b_inner, n_c_outer, n_c_inner, x0)
    k_cal = jnp.asarray(2e-5)
    s = _initial_state(ctx, k_cal, x0)
    s, _, _ = _integrate_segment(ctx, k_cal, s, x0, dx_a, 30, n_a // 30)
    s, _, _ = _integrate_segment(ctx, k_cal, s, xa, dx_b,
                                 n_b_outer, n_b_inner)
    n_md = int(round((-2.3 - xb) / dx_c))
    s, _, _ = _integrate_segment(ctx, k_cal, s, xb, dx_c, n_md, 1)
    return (5.0 / 3.0) * s[_I_PHI]


# --- sources --------------------------------------------------------------

class SourceTable(NamedTuple):
    ks: jnp.ndarray       # (nk,) coarse k
    xs: jnp.ndarray       # (nx,) LOS grid
    chi: jnp.ndarray      # (nx,) comoving distance eta0 - eta(x)
    s_t: jnp.ndarray      # (nk, nx) full TT source (dx measure)
    s_e: jnp.ndarray      # (nk, nx) E-polarization source g*(3/4)*Pi (dx measure)
    zeta_unit: jnp.ndarray
    s_p: jnp.ndarray      # (nk, nx) lensing-potential source (dx measure):
    #                       (Psi - Phi)/Hp * (chi*-chi)/(chi* chi), clamped
    #                       to the chi < chi* support
    chi_star: jnp.ndarray  # () comoving distance to tau = 1


def _fd_x(y, xs):
    """Centered finite difference along the last axis on a nonuniform grid."""
    return jnp.gradient(y, xs, axis=-1)


def compute_sources(ctx: BoltzCtx, sol: PerturbSolution) -> SourceTable:
    """LOS temperature and polarization sources on the stored grid.

    S_T = g(Th0 + Psi + Pi/4) + e^-tau (Psi' - Phi')
          - (1/k) d/dx[Hp g v_b] + (3/(4k^2)) d/dx[Hp d/dx(Hp g Pi)]
    (Callin eq. 76 structure; derivatives evaluated as finite differences
    on the stored LOS grid, local terms from the exact RHS).
    """
    xs = sol.xs
    taux = jax.vmap(lambda x: _taux(ctx, x))(xs)
    tau = jnp.interp(xs, ctx.xs_t, ctx.tau_t)
    emtau = jnp.exp(-tau)
    gvis = -taux * emtau                       # (nx,)
    hp = jax.vmap(lambda x: _hp(ctx, x))(xs)
    eta = jnp.interp(xs, ctx.xs_t, ctx.eta_t)
    chi = ctx.eta0 - eta
    a = jnp.exp(xs)

    def per_kx(k, x, s):
        psi, dphi, hp_, ckh = _common_metric(ctx, x, k, s)
        ds = _rhs_full(ctx, k, x, s)
        th2p = ds[_I_TH + 2]
        n2p = ds[_I_N + 2]
        th2 = s[_I_TH + 2]
        n2 = s[_I_N + 2]
        aa = jnp.exp(x)
        dpsi = (-dphi - 12.0 * (ctx.h0m / (k * aa)) ** 2
                * (ctx.omg * (th2p - 2.0 * th2) + ctx.omnu * (n2p - 2.0 * n2)))
        pi_eq = th2 + s[_I_THP] + s[_I_THP + 2]
        local = s[_I_TH] + psi + pi_eq / 4.0
        return local, dpsi - dphi, s[_I_VB], pi_eq, psi - s[_I_PHI]

    local, isw, vb, pi_eq, weyl2 = jax.vmap(
        jax.vmap(per_kx, in_axes=(None, 0, 0)), in_axes=(0, None, 0)
    )(sol.ks, xs, sol.states)

    doppler = -_fd_x(hp[None, :] * gvis[None, :] * vb, xs) / sol.ks[:, None]
    pol_in = hp[None, :] * gvis[None, :] * pi_eq
    pol = (0.75 / sol.ks[:, None] ** 2
           * _fd_x(hp[None, :] * _fd_x(pol_in, xs), xs))
    s_t = gvis[None, :] * local + emtau[None, :] * isw + doppler + pol
    s_e = gvis[None, :] * 0.75 * pi_eq

    # lensing-potential source: phi_lens = -2 int dchi W(chi) Psi_Weyl,
    # Psi_Weyl = (psi_MB + phi_MB)/2 = (Psi - Phi)/2 in these variables,
    # W = (chi*-chi)/(chi* chi); dchi = -dx/Hp puts it on the dx measure.
    # The -2 * (1/2) = -1 prefactor drops out of the power spectrum.
    x_star = jnp.interp(0.0, -jnp.log(ctx.tau_t), ctx.xs_t)
    eta_star = jnp.interp(x_star, ctx.xs_t, ctx.eta_t)
    chi_star = ctx.eta0 - eta_star
    chi_safe = jnp.maximum(chi, 1e-6)
    w_lens = jnp.maximum(chi_star - chi, 0.0) / (chi_star * chi_safe)
    s_p = weyl2 * (w_lens / hp)[None, :]
    return SourceTable(ks=sol.ks, xs=xs, chi=chi, s_t=s_t, s_e=s_e,
                       zeta_unit=sol.zeta_unit, s_p=s_p,
                       chi_star=chi_star)


# --- spherical Bessel table ----------------------------------------------

_JL_CACHE = {}


def _jl_table(ls, umax, du):
    """Host-precomputed spherical Bessel table j_l(u) on a uniform grid."""
    key = (tuple(int(l) for l in ls), float(umax), float(du))
    if key not in _JL_CACHE:
        from scipy.special import spherical_jn
        us = np.arange(0.0, umax + 2 * du, du)
        tab = np.stack([spherical_jn(int(l), us) for l in ls])
        _JL_CACHE[key] = (jnp.asarray(us), jnp.asarray(tab))
    return _JL_CACHE[key]


def _jl_interp(tab_us, tab, u):
    """Linear interpolation of the (nl, nu) Bessel table at u (any shape),
    returning shape (nl,) + u.shape."""
    du = tab_us[1] - tab_us[0]
    f = jnp.clip(u / du, 0.0, tab.shape[1] - 1.001)
    i0 = jnp.floor(f).astype(jnp.int32)
    w = f - i0
    lo = tab[:, i0]
    hi = tab[:, i0 + 1]
    return lo * (1.0 - w) + hi * w


# --- C_l assembly ---------------------------------------------------------

def _prep_projection(src: SourceTable, ls, ks_fine):
    """Shared source-independent prep for every Bessel projection
    (cls_from_sources, clpp_from_sources, and the l-sharded path in
    parallel.sharding): trapz weights, Bessel table, u-grid gather
    indices/weights, the 1e-6 u floor, and the late-time (x > -5) mask.
    Keeping the numeric constants (1.02 umax margin, 0.05 du, floors)
    in ONE place keeps the three callers in exact lockstep."""
    wx = _trapz_w(src.xs)
    umax = float(ks_fine[-1]) * float(src.chi[0]) * 1.02
    tab_us, tab = _jl_table(ls, umax, 0.05)
    du = tab_us[1] - tab_us[0]
    u = ks_fine[:, None] * src.chi[None, :]              # (nkf, nx)
    uf = jnp.clip(u / du, 0.0, tab.shape[1] - 1.001)
    u_i0 = jnp.floor(uf).astype(jnp.int32)
    dt = src.s_t.dtype
    ls_arr = jnp.asarray(ls, dtype=dt)
    return {
        "wx": wx, "tab": tab, "ls_arr": ls_arr,
        "pref_e": jnp.sqrt((ls_arr + 2) * (ls_arr + 1) * ls_arr
                           * (ls_arr - 1)),
        "u_i0": u_i0, "u_w": (uf - u_i0).astype(dt),
        "u_safe2": jnp.maximum(u, 1e-6) ** 2,
        "late": (src.xs > -5.0).astype(dt),
    }


def _project_l_rows(tab, ls_arr, pref_e_all, st_wx, se_wx, u_i0, u_w,
                    u_safe2, late, lmax_late):
    """Per-l Bessel projection kernel: (th_l, e_l), each (nl, nkf).

    A lax.map over the l rows so only one (nkf, nx) Bessel buffer is
    live at a time.  Pure in its row inputs (tab, ls_arr, pref_e_all) --
    this is the seam parallel.sharding.sharded_cls_from_sources shards
    over the mesh."""

    def _proj_one(args):
        row, l_val, pref_e = args                         # (nu,), (), ()
        jl = row[u_i0] * (1.0 - u_w) + row[u_i0 + 1] * u_w   # (nkf, nx)
        wl_late = jnp.exp(-((l_val / lmax_late) ** 4))
        wl = (1.0 - late + late * wl_late)[None, :]       # (1, nx)
        jw = jl * wl
        th = jnp.sum(st_wx * jw, axis=-1)                 # (nkf,)
        e = pref_e * jnp.sum(se_wx * (jw / u_safe2), axis=-1)
        return th, e

    return jax.lax.map(_proj_one, (tab, ls_arr, pref_e_all))


def _catmull_rom_k(src, ks_coarse, ks_fine):
    """Tensor Catmull-Rom interpolation of src(k, x) onto a fine k grid."""
    lnk_c = jnp.log(ks_coarse)
    lnk_f = jnp.log(ks_fine)
    idx = jnp.clip(jnp.searchsorted(lnk_c, lnk_f) - 1, 1, len(lnk_c) - 3)
    x0 = lnk_c[idx - 1]
    x1 = lnk_c[idx]
    x2 = lnk_c[idx + 1]
    x3 = lnk_c[idx + 2]
    t = (lnk_f - x1) / (x2 - x1)
    p0 = src[idx - 1]
    p1 = src[idx]
    p2 = src[idx + 1]
    p3 = src[idx + 2]
    # nonuniform Catmull-Rom tangents (finite-difference form)
    m1 = (p2 - p0) * ((x2 - x1) / (x2 - x0))[:, None]
    m2 = (p3 - p1) * ((x2 - x1) / (x3 - x1))[:, None]
    tt = t[:, None]
    h00 = 2 * tt**3 - 3 * tt**2 + 1
    h10 = tt**3 - 2 * tt**2 + tt
    h01 = -2 * tt**3 + 3 * tt**2
    h11 = tt**3 - tt**2
    return h00 * p1 + h10 * m1 + h01 * p2 + h11 * m2


def _trapz_w(x):
    w = jnp.zeros_like(x)
    w = w.at[1:].add(0.5 * (x[1:] - x[:-1]))
    w = w.at[:-1].add(0.5 * (x[1:] - x[:-1]))
    return w


def cls_from_sources(src: SourceTable, bg, ls, ks_fine, lmax_late: float = 60.0):
    """Project sources to Theta_l/E_l and assemble raw C_l (muK^2).

    Returns dict with 'ls' (nodes) and TT/EE/TE arrays at the nodes.
    The late-time (post x > -5) part of the LOS integral is restricted
    to l <= lmax_late via a smooth damping of its weight (ISW and
    reionization only matter at low l; this suppresses the aliasing
    noise of coarse late sampling at high l).

    Memory: the Bessel factor j_l(k chi) is (nl, nkf, nx) ~ GBs if
    materialized; the projection runs as a `lax.map` over l nodes so
    only (nkf, nx) buffers (~tens of MB) are live at once.
    """
    s_t_f = _catmull_rom_k(src.s_t, src.ks, ks_fine)     # (nkf, nx)
    s_e_f = _catmull_rom_k(src.s_e, src.ks, ks_fine)
    pp = _prep_projection(src, ls, ks_fine)
    st_wx = s_t_f * pp["wx"][None, :]
    se_wx = s_e_f * pp["wx"][None, :]

    th_l, e_l = _project_l_rows(pp["tab"], pp["ls_arr"], pp["pref_e"],
                                st_wx, se_wx, pp["u_i0"], pp["u_w"],
                                pp["u_safe2"], pp["late"], lmax_late)

    # primordial curvature spectrum
    pzeta = (bg.As * (ks_fine / bg.pivot_scalar) ** (bg.ns - 1.0)
             / src.zeta_unit**2)
    wk = _trapz_w(jnp.log(ks_fine))                      # dlnk weights
    t0_muk = bg.T_cmb_k * 1e6
    norm = 4.0 * jnp.pi * t0_muk**2
    ctt = norm * jnp.einsum("k,lk->l", pzeta * wk, th_l**2)
    cee = norm * jnp.einsum("k,lk->l", pzeta * wk, e_l**2)
    cte = norm * jnp.einsum("k,lk->l", pzeta * wk, th_l * e_l)
    return {"ls": jnp.asarray(ls), "tt": ctt, "ee": cee, "te": cte}


def clpp_from_sources(src: SourceTable, bg, Ls, ks_fine):
    """Exact (non-Limber) lensing-potential power C_phiphi at L nodes.

    Projects the stored Weyl-potential source s_p through the same
    Bessel machinery as the temperature: phi_L(k) = int dx s_p j_L(k chi),
    C_phiphi = 4 pi int dlnk Delta^2_zeta |phi_L / zeta|^2.  No late-time
    damping (the lensing kernel IS late-time); intended for the low-L
    regime (L <~ 150) where the stored LOS grid resolves j_L's chi
    oscillation and where Limber errs -- the class-API blend
    (get_cmb_cls(approx=True)) switches to the nonlinear Limber path
    above that.
    """
    s_p_f = _catmull_rom_k(src.s_p, src.ks, ks_fine)     # (nkf, nx)
    pp = _prep_projection(src, Ls, ks_fine)
    u_i0, u_w = pp["u_i0"], pp["u_w"]
    sp_wx = s_p_f * pp["wx"][None, :]

    def _proj_one(row):
        jl = row[u_i0] * (1.0 - u_w) + row[u_i0 + 1] * u_w   # (nkf, nx)
        return jnp.sum(sp_wx * jl, axis=-1)                  # (nkf,)

    phi_l = jax.lax.map(_proj_one, pp["tab"])                # (nl, nkf)

    pzeta = (bg.As * (ks_fine / bg.pivot_scalar) ** (bg.ns - 1.0)
             / src.zeta_unit**2)
    wk = _trapz_w(jnp.log(ks_fine))
    clpp = 4.0 * jnp.pi * jnp.einsum("k,lk->l", pzeta * wk, phi_l**2)
    return {"ls": jnp.asarray(Ls), "pp": clpp}


# --- high-level orchestration ---------------------------------------------

def default_l_nodes(lmax: int):
    """C_l evaluation nodes: dense through the first peaks, then ~Delta l
    40 (the acoustic period is ~300, so >=7 nodes/period everywhere)."""
    base = [2, 3, 4, 5, 7, 9, 12, 16, 21, 27, 35, 45, 60, 80, 100, 125,
            150, 175, 200, 220, 240, 260, 280, 300]
    ls = [l for l in base if l <= lmax]
    l = 300
    while l < lmax:
        l = min(l + 40, lmax)
        ls.append(l)
    if ls[-1] != lmax:
        ls.append(lmax)
    return np.unique(np.asarray(ls, dtype=np.int64))


def _interp_l_nodes(l_nodes, vals, ells):
    """Cubic-spline interpolation of C_l node values onto integer ells,
    done in ln(l) on D_l = l(l+1)C_l/2pi (the smooth quantity).  Host-side
    (this is table assembly, not a jit path)."""
    from scipy.interpolate import CubicSpline
    d_nodes = vals * (l_nodes * (l_nodes + 1.0)) / (2.0 * np.pi)
    d_all = CubicSpline(np.log(l_nodes), d_nodes)(np.log(ells))
    return d_all * (2.0 * np.pi) / (ells * (ells + 1.0))


def segment_c_inner_steps(kmax, h0_kms, n_c_outer: int = 380,
                          span: float = 5.0, margin: float = 0.65,
                          floor: int = 11) -> int:
    """Segment-C inner step count keeping explicit RK4 stable at kmax.

    The free-streaming advection has |eigenvalues| ~ k/Hp with 1/Hp
    largest today (c/H0), so RK4 needs k * dx_c * (c/H0) < 2*sqrt(2).
    The naive edge for the default n_c_inner=11 is k ~ 0.53/Mpc, but the
    MEASURED edge is 0.46-0.48 (metric/baryon coupling widens the
    spectrum: k=0.48 grows to ~1e12 by x=0, k=0.50 to ~1e77).  At
    lmax >~ 3000 compute_cls's CAMB-style kmax rule reaches that edge
    and the late-time blow-up projects onto LOW l through the ISW term
    (l < 150 came back at ~1e30 muK^2 -- found by
    examples/cmb_forecast.py).  margin=0.65 holds a 35% margin on the
    naive estimate, covering the measured ~12% optimism; the floor keeps
    the default grid (and its goldens) unchanged at default kmax.
    """
    c_over_h0 = 299792.458 / float(h0_kms)
    dx_c_max = margin * 2.0 * np.sqrt(2.0) / (c_over_h0 * float(kmax))
    return max(floor, int(np.ceil(span / (n_c_outer * dx_c_max))))


def compute_cls(params=None, lmax: int = 1500, *, zre: float = 7.7,
                l_nodes=None, nk: int | None = None, nkf: int | None = None,
                kmax: float | None = None, lens_potential: bool = False,
                lmax_pp: int = 150, massive_nu: bool = True):
    """Engine-free unlensed scalar TT/EE/TE to lmax (muK^2, raw_cl).

    The labeled few-percent approximation tier standing in for the
    reference's CAMB call (/root/reference/hmvec/cosmology.py:67-81):
    recombination (models/recomb.py) -> Boltzmann hierarchy
    (solve_perturbations) -> LOS sources -> C_l at ~60 l-nodes ->
    Catmull-Rom in ln(l) onto all integer l.  Returns a CAMB-shaped
    (lmax+1, 4) array [TT, EE, BB, TE]; BB = 0 (no tensors/lensing),
    rows 0-1 are 0 by convention.  With ``lens_potential=True`` it
    returns the PAIR ``(cls, clpp)`` where clpp is the (lmax+1,) raw
    C_phiphi from the exact LOS projection (clpp_from_sources), nonzero
    for 2 <= L <= lmax_pp and zero above (callers blend the Limber tier
    there) -- remember to unpack.

    Grid defaults follow the CAMB-style rule kmax ~ 2.2 lmax/eta0; the
    coarse k-grid is quadratic (resolves the pi/r_s source oscillation),
    the fine LOS grid resolves the 2pi/chi* Bessel oscillation.
    """
    from ..params import merge_params
    p = merge_params(params or {})
    bg = bgmod.background(p)
    # FD-consistent recombination background when the massive fluid is
    # on AND the cosmology has mnu > 0 (identical otherwise; keeps the
    # mnu = 0 tables bit-stable) -- ADVICE r4 consistency item
    fd = bool(massive_nu) and float(np.asarray(bg.omnu0)) > 0.0
    rec = recombination(bg, zre=zre, massive_nu=fd)
    ctx = make_ctx(bg, rec, massive_nu=massive_nu)
    eta0 = float(rec.eta0)

    kmin = 2e-5
    if kmax is None:
        kmax = min(0.5, max(0.22, 2.2 * lmax / eta0))
    if nk is None:
        nk = int(np.ceil(2.0 * (kmax - kmin) / 0.00525))
    if nkf is None:
        nkf = int(np.ceil((kmax - kmin) / 6.7e-5))
    ii = np.linspace(0.0, 1.0, nk)
    ks = kmin + (kmax - kmin) * ii**2

    n_c_inner = segment_c_inner_steps(kmax, float(p["H0"]))
    sol = solve_perturbations(ctx, jnp.asarray(ks), n_c_inner=n_c_inner)
    src = compute_sources(ctx, sol)

    if l_nodes is None:
        l_nodes = default_l_nodes(lmax)
    l_nodes = np.asarray(l_nodes, dtype=np.int64)
    # keep the fine grid inside the coarse Catmull-Rom interior
    ks_fine = np.linspace(kmin, 0.95 * kmax, nkf)
    cl = cls_from_sources(src, bg, l_nodes, jnp.asarray(ks_fine))

    ells = np.arange(2, lmax + 1, dtype=np.float64)
    out = np.zeros((lmax + 1, 4))
    lf = l_nodes.astype(np.float64)
    out[2:, 0] = _interp_l_nodes(lf, np.asarray(cl["tt"]), ells)
    out[2:, 1] = _interp_l_nodes(lf, np.asarray(cl["ee"]), ells)
    out[2:, 3] = _interp_l_nodes(lf, np.asarray(cl["te"]), ells)
    if not lens_potential:
        return out

    # exact (non-Limber) C_phiphi at low L from the same solve; zero
    # above lmax_pp (callers blend the Limber tier there)
    from scipy.interpolate import CubicSpline
    lp_base = np.array([2, 3, 4, 5, 7, 9, 12, 16, 21, 27, 35, 45, 60,
                        80, 100, 120, 150, 200], dtype=np.int64)
    lp = lp_base[lp_base <= min(lmax_pp, lmax)]
    clpp_nodes = np.asarray(
        clpp_from_sources(src, bg, lp, jnp.asarray(ks_fine))["pp"])
    lmax_p = int(lp[-1])
    ells_p = np.arange(2, lmax_p + 1, dtype=np.float64)
    lpf = lp.astype(np.float64)
    # interpolate the smooth deflection-style combo [L(L+1)]^2 C /2pi
    d_nodes = clpp_nodes * (lpf * (lpf + 1.0)) ** 2 / (2.0 * np.pi)
    d_all = CubicSpline(np.log(lpf), d_nodes)(np.log(ells_p))
    out_pp = np.zeros(lmax + 1)
    out_pp[2:lmax_p + 1] = d_all * (2.0 * np.pi) \
        / (ells_p * (ells_p + 1.0)) ** 2
    return out, out_pp
