"""FRW background: H(z), distances, densities, growth -- pure jnp.

The reference delegates all of this to CAMB/CLASS (Fortran/C), e.g.
hmvec/cosmology.py:83-130 (distances, H), :232-243 (densities),
:288-332 (growth).  Here everything is closed-form or fixed-order
Gauss-Legendre quadrature in jnp: differentiable, jit-able, vectorized over
z, with no host round-trips.

Conventions follow the reference: no h units; Mpc, Msun, km/s/Mpc.
Massive neutrinos are treated as matter in the background (the reference's
own omm0 derivation carries a "FIXME: neutrinos", cosmology.py:213); photons
and massless neutrinos contribute an omr term that CAMB includes implicitly.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.weights import gauss_legendre
from ..ops.special import hyp2f1_growth

CSPEED_KMS = 299792.458

# Same numeric constants as the reference (cosmology.py:239-243).  The SI
# round trip is pre-folded on the host into ONE f64 factor: TPU f64 is a
# double-single (two-f32) emulation, and chaining tiny intermediates like
# (H*3.241e-20)^2 ~ 1e-35 on device underflows the low component into the
# flushed f32 subnormal range, costing ~4 digits.  rho_crit = H_kms^2 *
# _RHO_CRIT_FACTOR keeps every device value mid-range.
_HZ_TO_SI = 3.241e-20           # (km/s/Mpc) -> 1/s
_G_SI = 6.67259e-11
_RHO_SI_TO_MSUN_MPC3 = 1.477543e37
_RHO_CRIT_FACTOR = (3.0 * _HZ_TO_SI**2 / (8.0 * float(np.pi) * _G_SI)
                    * _RHO_SI_TO_MSUN_MPC3)  # ~2.775e7 Msun/Mpc^3/(km/s/Mpc)^2

_GL_NODES, _GL_WEIGHTS = gauss_legendre(128)


class BackgroundParams(NamedTuple):
    """Derived background parameters (a differentiable pytree of scalars)."""

    H0: jnp.ndarray
    omm0: jnp.ndarray       # (omch2+ombh2)/h^2, massive nu excluded (ref parity)
    omk0: jnp.ndarray
    oml0: jnp.ndarray       # 1 - omm0 - omk0 (ref cosmology.py:217)
    omr0: jnp.ndarray       # photons + massless neutrinos
    omnu0: jnp.ndarray      # massive neutrinos (matter-like here)
    w0: jnp.ndarray
    wa: jnp.ndarray
    ombh2: jnp.ndarray
    omch2: jnp.ndarray
    ns: jnp.ndarray
    As: jnp.ndarray
    pivot_scalar: jnp.ndarray
    as8: jnp.ndarray
    Yp: jnp.ndarray
    T_cmb_k: jnp.ndarray    # CMB temperature in K (for the transfer function)
    nnu_m: jnp.ndarray      # number of DEGENERATE massive nu species (EH99);
    #                         params['num_massive_neutrinos'], same key the
    #                         reference feeds CAMB (cosmology.py:170-171)


def background(params: dict, include_radiation: bool = True) -> BackgroundParams:
    """Derive background parameters from a merged params dict.

    Mirrors reference _init_cosmology derivations (cosmology.py:212-219):
    omm0 from omch2+ombh2, oml0 = 1-omm0-omk0, optional as8 amplitude knob.
    ``omm`` override (ref :148-154): if params['omm'] is set, omch2 is
    re-derived as omm*h^2 - ombh2.
    """
    h = params["H0"] / 100.0
    omch2 = params["omch2"]
    if params.get("omm") is not None:
        omch2 = params["omm"] * h**2 - params["ombh2"]
    omh2 = omch2 + params["ombh2"]
    omm0 = omh2 / h**2
    omk0 = params["omk"]
    oml0 = 1.0 - omm0 - omk0
    t_cmb_k = 2.7255
    if include_radiation:
        # omega_gamma h^2 for T=2.7255K; massless-nu boost 0.2271*Neff
        omr0 = 2.47282e-5 * (1.0 + 0.2271 * params["nnu"]) / h**2
    else:
        omr0 = 0.0
    omnu0 = params["mnu"] / 93.14 / h**2
    f64 = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    arr = lambda v: jnp.asarray(v, dtype=f64)
    return BackgroundParams(
        H0=arr(params["H0"]), omm0=arr(omm0), omk0=arr(omk0), oml0=arr(oml0),
        omr0=arr(omr0), omnu0=arr(omnu0),
        w0=arr(params["w0"]), wa=arr(params["wa"]),
        ombh2=arr(params["ombh2"]), omch2=arr(omch2),
        ns=arr(params["ns"]), As=arr(params["As"]),
        pivot_scalar=arr(params["pivot_scalar"]),
        as8=arr(params.get("as8", 1.0)),
        Yp=arr(params.get("Yp", 0.24)),
        T_cmb_k=arr(t_cmb_k),
        nnu_m=arr(params.get("num_massive_neutrinos", 3)),
    )


def e_of_z(bg: BackgroundParams, z):
    """E(z) = H(z)/H0."""
    zp1 = 1.0 + jnp.asarray(z)
    de = zp1 ** (3.0 * (1.0 + bg.w0 + bg.wa)) * jnp.exp(-3.0 * bg.wa * (1.0 - 1.0 / zp1))
    e2 = (
        bg.omr0 * zp1**4
        + (bg.omm0 + bg.omnu0) * zp1**3
        + bg.omk0 * zp1**2
        + bg.oml0 * de
    )
    return jnp.sqrt(e2)


def hubble_parameter(bg: BackgroundParams, z):
    """H(z) in km/s/Mpc (reference: cosmology.py:116-122)."""
    return bg.H0 * e_of_z(bg, z)


def h_of_z(bg: BackgroundParams, z):
    """H(z) in 1/Mpc (reference: cosmology.py:124-130)."""
    return hubble_parameter(bg, z) / CSPEED_KMS


def comoving_radial_distance(bg: BackgroundParams, z):
    """chi(z) in Mpc via 128-node Gauss-Legendre (spectrally accurate)."""
    z = jnp.asarray(z)
    nodes = jnp.asarray(_GL_NODES)
    weights = jnp.asarray(_GL_WEIGHTS)
    zz = z[..., None] * nodes  # (..., 128)
    integrand = 1.0 / e_of_z(bg, zz)
    return (CSPEED_KMS / bg.H0) * z * (integrand @ weights)


def _curvature_comoving(bg: BackgroundParams, chi):
    """S_k(chi): transverse comoving distance from radial chi."""
    H0_invmpc = bg.H0 / CSPEED_KMS
    k = -bg.omk0 * H0_invmpc**2
    sqrt_abs_k = jnp.sqrt(jnp.abs(k) + 1e-300)
    x = sqrt_abs_k * chi
    open_case = jnp.sinh(x) / sqrt_abs_k
    closed_case = jnp.sin(x) / sqrt_abs_k
    return jnp.where(k > 1e-12, closed_case, jnp.where(k < -1e-12, open_case, chi))


def angular_diameter_distance(bg: BackgroundParams, z1, z2=None):
    """D_A(z) or D_A(z1, z2) in Mpc (reference: cosmology.py:83-93)."""
    if z2 is None:
        chi = comoving_radial_distance(bg, z1)
        return _curvature_comoving(bg, chi) / (1.0 + jnp.asarray(z1))
    chi1 = comoving_radial_distance(bg, z1)
    chi2 = comoving_radial_distance(bg, z2)
    return _curvature_comoving(bg, chi2 - chi1) / (1.0 + jnp.asarray(z2))


def sigma_crit(bg: BackgroundParams, zlens, zsource):
    """Lensing critical surface density (reference: cosmology.py:95-101)."""
    Gval = 4.517e-48   # Newton G in Mpc, s, Msun units (ref value)
    cval = 9.716e-15   # c in Mpc/s (ref value)
    Dd = angular_diameter_distance(bg, zlens)
    Ds = angular_diameter_distance(bg, zsource)
    Dds = angular_diameter_distance(bg, zlens, zsource)
    return cval**2 * Ds / 4.0 / jnp.pi / Gval / Dd / Dds


def rho_critical_z(bg: BackgroundParams, z):
    """Critical density in Msun/Mpc^3 (reference: cosmology.py:239-243,
    with the SI chain pre-folded on host -- see _RHO_CRIT_FACTOR)."""
    Hz = hubble_parameter(bg, z)
    return Hz**2 * _RHO_CRIT_FACTOR


def rho_matter_z(bg: BackgroundParams, z):
    """Comoving->physical mean matter density (reference: cosmology.py:232-234)."""
    return rho_critical_z(bg, 0.0) * bg.omm0 * (1.0 + jnp.asarray(z)) ** 3


def omz(bg: BackgroundParams, z):
    return rho_matter_z(bg, z) / rho_critical_z(bg, z)


def growth_unnormalized(bg: BackgroundParams, a, mode: str = "closed",
                        table=None):
    """D(a) with D ~ a in matter domination (Heath 1977 closed form).

    Reference: cosmology.py:297-314 (D_growth_approx).  ``mode="closed"``
    is the LCDM-exact analytic integral via 2F1; ``mode="ode"`` integrates
    the linear growth ODE for general (w0, wa) backgrounds -- the analogue
    of the reference's engine-exact growth (cosmology.py:288-294), which
    gets D from CAMB/CLASS for any background.  Pick the mode with
    ``growth_mode_for(params)`` at build time (host side, where w0/wa are
    concrete).
    """
    if mode == "ode":
        if table is None:
            table = growth_table(bg)
        return growth_eval(table, a)[0]
    a = jnp.asarray(a)
    x = (bg.oml0 / bg.omm0) ** (1.0 / 3.0) * a
    x3 = x**3
    return jnp.sqrt(1.0 + x3) * hyp2f1_growth(x3) * a


def d_growth(bg: BackgroundParams, a, norm: str = "anorm",
             mode: str = "closed", table=None):
    """Normalized growth factor (reference: cosmology.py:317-332)."""
    if mode == "ode" and table is None:
        table = growth_table(bg)
    d1 = growth_unnormalized(bg, jnp.asarray(1.0), mode, table)
    val = growth_unnormalized(bg, a, mode, table) / d1
    if norm == "z0norm":
        return val
    if norm == "anorm":
        return val * d1
    raise ValueError(norm)


def growth_rate_f(bg: BackgroundParams, z, mode: str = "closed",
                  table=None):
    """f(z) = dlnD/dlna via autodiff of the closed-form D ("closed") or
    from the integrated dD/dlna ("ode", any w0/wa).

    Replaces the reference's CLASS-only growth rate
    (cosmology.py:345-350) with an engine-free differentiable version.
    """
    z = jnp.atleast_1d(jnp.asarray(z))
    if mode == "ode":
        if table is None:
            table = growth_table(bg)
        return growth_eval(table, 1.0 / (1.0 + z))[1]

    def logd(lna):
        return jnp.log(growth_unnormalized(bg, jnp.exp(lna)))

    return jax.vmap(jax.grad(logd))(jnp.log(1.0 / (1.0 + z)))


# ---------------------------------------------------------------------------
# ODE growth for general (w0, wa) dark energy
# ---------------------------------------------------------------------------
#
# The reference takes D(z) and f(z) from the Boltzmann engine for ANY
# background (cosmology.py:288-294, :345-350); the closed-form Heath/2F1
# integral above is exact only for (w0, wa) = (-1, 0).  Here the growing
# mode is integrated directly:  with g = D/a and x = ln a,
#
#   g'' + (4 + dlnE/dx) g' + (3 + dlnE/dx - (3/2) Om_m(a)) g = 0,
#
# over the same reduced background as Heath (matter + curvature + w0waCDM
# dark energy, no radiation), so the LCDM limit reproduces the closed form
# exactly.  g is O(1) and flat until late times, so fixed-step RK4 in ln a
# converges fast; nodes carry (D, dD/dlna) and evaluation is cubic-Hermite
# (O(h^4) with exact derivatives).  Everything is jit- and grad-safe.

_GROWTH_LNA0 = float(np.log(1e-4))


class GrowthTable(NamedTuple):
    lna0: jnp.ndarray     # scalar ln a of the first node
    h: jnp.ndarray        # scalar step in ln a
    d: jnp.ndarray        # (n+1,) unnormalized D (D -> a in matter dom.)
    dp: jnp.ndarray       # (n+1,) dD/dlna


def _growth_ode_rhs(bg: BackgroundParams, lna, y):
    g, gp = y
    a = jnp.exp(lna)
    fde = a ** (-3.0 * (1.0 + bg.w0 + bg.wa)) * jnp.exp(-3.0 * bg.wa * (1.0 - a))
    m = bg.omm0 * a**-3
    k = bg.omk0 * a**-2
    e2 = m + k + bg.oml0 * fde
    dlne = 0.5 * (-3.0 * m - 2.0 * k + bg.oml0 * fde
                  * (-3.0 * (1.0 + bg.w0 + bg.wa) + 3.0 * bg.wa * a)) / e2
    om_a = m / e2
    return gp, -(4.0 + dlne) * gp - (3.0 + dlne - 1.5 * om_a) * g


def _growth_rk4_scan(bg: BackgroundParams, lnas, h, store: bool):
    """RK4 of the growth ODE from MD initial conditions (g = 1, g' = 0);
    shared by growth_table and growth_dolag_ratio.  Returns (y_final,
    trajectory-or-None).  unroll amortizes the ~70 us/step serial-loop
    overhead on the tunneled TPU (DEVNOTES.md)."""

    def step(y, lna):
        k1 = _growth_ode_rhs(bg, lna, y)
        y2 = (y[0] + 0.5 * h * k1[0], y[1] + 0.5 * h * k1[1])
        k2 = _growth_ode_rhs(bg, lna + 0.5 * h, y2)
        y3 = (y[0] + 0.5 * h * k2[0], y[1] + 0.5 * h * k2[1])
        k3 = _growth_ode_rhs(bg, lna + 0.5 * h, y3)
        y4 = (y[0] + h * k3[0], y[1] + h * k3[1])
        k4 = _growth_ode_rhs(bg, lna + h, y4)
        y_next = (y[0] + (h / 6.0) * (k1[0] + 2 * k2[0] + 2 * k3[0] + k4[0]),
                  y[1] + (h / 6.0) * (k1[1] + 2 * k2[1] + 2 * k3[1] + k4[1]))
        return y_next, (y_next if store else None)

    one = jnp.ones_like(bg.w0)
    y0 = (one, jnp.zeros_like(bg.w0))
    return jax.lax.scan(step, y0, lnas, unroll=8)


def growth_table(bg: BackgroundParams, n_steps: int = 384,
                 lna_min: float = _GROWTH_LNA0) -> GrowthTable:
    """Integrate the growth ODE on a uniform ln-a grid up to a = 1.

    Initial conditions deep in matter domination (g = 1, g' = 0 at
    a = 1e-4; the DE correction there is O(oml/omm * a^3) ~ 1e-12).
    """
    h = (0.0 - lna_min) / n_steps
    lnas = lna_min + h * jnp.arange(n_steps)
    one = jnp.ones_like(bg.w0)
    _, (gs, gps) = _growth_rk4_scan(bg, lnas, h, store=True)
    g = jnp.concatenate([one[None], gs])
    gp = jnp.concatenate([jnp.zeros_like(one)[None], gps])
    a_nodes = jnp.exp(lna_min + h * jnp.arange(n_steps + 1))
    return GrowthTable(lna0=jnp.asarray(lna_min), h=jnp.asarray(h),
                       d=a_nodes * g, dp=a_nodes * (g + gp))


def growth_dolag_ratio(bg: BackgroundParams, a_inf: float = 10.0,
                       n_steps: int = 512):
    """Dolag et al 2004 dark-energy concentration factor:
    D_w(a_inf) / D_LCDM(a_inf), both growing modes integrated from the
    same matter-domination initial conditions (g = D/a = 1, g' = 0 at
    a = 1e-4).  a_inf = 10 approximates a -> infinity (the growth is
    saturated; g decays ~1/a in any w < -1/3 background).  Exactly 1
    for (w0, wa) = (-1, 0): the two solves are the identical program.
    HMcode multiplies concentrations by this ratio^1.5 (Mead 2015
    sec. 2; CAMB's HMcode implementation does the same).
    """
    lna_end = float(np.log(a_inf))
    h = (lna_end - _GROWTH_LNA0) / n_steps
    lnas = _GROWTH_LNA0 + h * jnp.arange(n_steps)

    def g_end(b):
        y, _ = _growth_rk4_scan(b, lnas, h, store=False)
        return y[0]                       # g = D/a at a_inf (a_inf cancels)

    bgl = bg._replace(w0=jnp.full_like(bg.w0, -1.0),
                      wa=jnp.zeros_like(bg.wa))
    return g_end(bg) / g_end(bgl)


def growth_eval(tab: GrowthTable, a):
    """(D(a), f(a) = dlnD/dlna) by cubic-Hermite interpolation of the
    table; below the table D extends as D = a * (D0/a0) (pure matter
    domination), above a = 1 it clamps to the last interval's Hermite."""
    a = jnp.asarray(a)
    lna = jnp.log(a)
    n = tab.d.shape[0] - 1
    u = (lna - tab.lna0) / tab.h
    i = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, n - 1)
    t = u - i
    d0, d1 = tab.d[i], tab.d[i + 1]
    p0, p1 = tab.dp[i] * tab.h, tab.dp[i + 1] * tab.h
    t2, t3 = t * t, t * t * t
    D = ((2 * t3 - 3 * t2 + 1) * d0 + (t3 - 2 * t2 + t) * p0
         + (-2 * t3 + 3 * t2) * d1 + (t3 - t2) * p1)
    Dp = ((6 * t2 - 6 * t) * d0 + (3 * t2 - 4 * t + 1) * p0
          + (-6 * t2 + 6 * t) * d1 + (3 * t2 - 2 * t) * p1) / tab.h
    below = lna < tab.lna0
    a0 = jnp.exp(tab.lna0)
    D = jnp.where(below, a * (tab.d[0] / a0), D)
    f = jnp.where(below, tab.dp[0] / tab.d[0], Dp / D)
    return D, f


def growth_mode_for(params: dict) -> str:
    """'closed' (Heath/2F1, exact for LCDM) unless (w0, wa) != (-1, 0),
    then 'ode'.  Call at build time on the concrete params dict."""
    if float(params.get("w0", -1.0)) == -1.0 and \
            float(params.get("wa", 0.0)) == 0.0:
        return "closed"
    return "ode"


def redshift_at_comoving_radial_distance(bg: BackgroundParams, chi,
                                         zmax: float = 1e4, num_iter: int = 80):
    """Invert chi(z) by fixed-count bisection (reference: cosmology.py:713-730).

    A final Newton polish (dchi/dz = 1/h_of_z) follows the bisection:
    the bisected z is select-built from constants, so its parameter
    gradient is identically zero; re-expressing the root as
    z = z_bis - (chi(z_bis) - chi)/chi'(z_bis) restores the exact
    implicit-function derivative dz/dtheta = -(dchi/dtheta)/(dchi/dz)
    through autodiff (and sharpens the root below the bisection floor).
    """
    chi = jnp.asarray(chi)
    lo = jnp.zeros_like(chi)
    hi = jnp.full_like(chi, zmax)

    def body(_, carry):
        lo, hi = carry
        mid = (lo + hi) / 2.0
        val = comoving_radial_distance(bg, mid)
        too_far = val > chi
        return jnp.where(too_far, lo, mid), jnp.where(too_far, mid, hi)

    lo, hi = jax.lax.fori_loop(0, num_iter, body, (lo, hi))
    z_bis = jax.lax.stop_gradient((lo + hi) / 2.0)
    return z_bis - (comoving_radial_distance(bg, z_bis) - chi) * h_of_z(bg, z_bis)
