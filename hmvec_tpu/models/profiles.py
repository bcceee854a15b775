"""Halo profiles: Duffy concentration, analytic NFW u(k), Battaglia gas.

The analytic NFW Fourier transform (reference: hmvec/hmvec.py:318-355) is the
hot path of the flagship benchmark: ~4e6 Si/Ci evaluations on the
(z, m, k) grid, all fused VPU elementwise work here (no loops, no host).

Battaglia et al 2016 gas density / pressure profiles are real-space
generalized-NFW shapes (reference: hmvec.py:800-927); their Fourier
transforms go through the batched sine-DFT kernel in ops/sine_transform.
"""

from __future__ import annotations

import math as _math

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.special import sici_with_trig
from .mass_function import R_from_M


def duffy_concentration(m, z, A, alpha, beta, h):
    """Duffy et al 2008 c(m,z) (reference: hmvec.py:68-73)."""
    return A * (h * m / 2.0e12) ** alpha * (1.0 + z) ** beta


def concentration_duffy(ms, zs, mdef, params, h):
    """c(z,m) grid for 'vir' or 'mean' mass definition (hmvec.py:163-176)."""
    key = {"mean": ("duffy_A_mean", "duffy_alpha_mean", "duffy_beta_mean"),
           "vir": ("duffy_A_vir", "duffy_alpha_vir", "duffy_beta_vir")}[mdef]
    A, alpha, beta = (params[key[0]], params[key[1]], params[key[2]])
    return duffy_concentration(jnp.asarray(ms)[None, :],
                               jnp.asarray(zs)[:, None], A, alpha, beta, h)


# Bhattacharya et al 2013 (ApJ 766, 32) c(M,z) fits, c = A D(z)^B nu^C with
# nu = deltac/sigma(M,z) and D normalized to D(z=0) = 1.  Extension beyond
# the reference (whose concentration() is Duffy-only and raises otherwise,
# hmvec.py:163-176).  Coefficients transcribed offline from the paper's
# full-sample fits; the tests bound them against Duffy (same-regime ~30%
# agreement on cluster scales at z=0) and pin the exact formula against a
# numpy mirror.
_BHATTACHARYA_COEFFS = {
    "vir": (7.7, 0.90, -0.29),     # c_vir
    "mean": (9.0, 1.15, -0.29),    # c_200m  (this package's mdef='mean')
    "200c": (5.9, 0.54, -0.35),    # c_200c  (direct calls only)
}


def concentration_bhattacharya(sigma2, d_z0norm, mdef, deltac=1.686):
    """Bhattacharya+13 c(z,m) from the sigma^2(z,m) grid.

    ``d_z0norm`` is D(z)/D(0) on the same zs as sigma2's leading axis.
    """
    A, B, C = _BHATTACHARYA_COEFFS[mdef]
    nu = deltac / jnp.sqrt(sigma2)
    return A * jnp.asarray(d_z0norm)[:, None] ** B * nu**C


def fcon(c):
    """F(c) = ln(1+c) - c/(1+c) (hmvec.py:737)."""
    return jnp.log(1.0 + c) - c / (1.0 + c)


def rho_nfw_x(x, rhoscale=1.0):
    return rhoscale / x / (1.0 + x) ** 2


def rho_einasto_x(x, alpha=0.18, rhoscale=1.0):
    """Einasto profile rho(x)/rho_s = exp(-(2/alpha)((x^alpha)-1)), x = r/r_s.

    Extension beyond the reference (NFW/Battaglia only).  alpha ~ 0.18 is
    the canonical cluster-scale shape (Navarro+2004); rho(1) = rhoscale.
    """
    x = jnp.asarray(x)
    return rhoscale * jnp.exp(-(2.0 / alpha) * (x**alpha - 1.0))


def rho_nfw(r, rhoscale, rs):
    """NFW density at radius r (reference: hmvec.py:743-746)."""
    return rho_nfw_x(jnp.asarray(r) / rs, rhoscale)


def rhoscale_nfw(mdelta, rdelta, cdelta):
    rs = rdelta / cdelta
    return mdelta / (4.0 * jnp.pi * rs**3) / fcon(cdelta)


def nfw_uk_analytic(ks, zs, cs, rss):
    """Normalized NFW u(k|m,z), closed form via Si/Ci.

    u(k) = [sin x (Si((1+c)x)-Si(x)) - sin(cx)/((1+c)x)
            + cos x (Ci((1+c)x)-Ci(x))] / F(c),
    with x = k * r_s * (1+z) -- the (1+z) converts the physical scale radius
    to comoving, matching the reference (hmvec.py:347-353, incl. the
    "!!!!"-flagged comoving conversion at :349).

    ks: (nk,), cs: (nz,nm), rss: (nz,nm).  Returns (nz,nm,nk).

    Transcendental-minimal evaluation: one sincos at x and one at (1+c)x
    shared with the Si/Ci auxiliaries, and sin(cx) recovered by the angle
    difference identity -- 5 f64 transcendentals per element instead of 9.
    """
    cs = cs[..., None]
    x = jnp.asarray(ks)[None, None, :] * rss[..., None] * (1.0 + jnp.asarray(zs)[:, None, None])
    return nfw_uk_x(x, cs)


def nfw_uk_scatter(ks, zs, cs, rvirs, sigma_lnc, n_nodes=9):
    """(<u>, <u^2>) of the NFW profile under lognormal concentration
    scatter (EXTENSION: the reference has no c-M scatter).

    ln c ~ N(ln cbar, sigma_lnc^2) at fixed mass and r_vir (scatter
    redistributes the profile shape, r_s,i = r_vir / c_i).  The lognormal
    expectation is evaluated by ``n_nodes``-point Gauss-Hermite
    quadrature -- exact for polynomials of degree 2 n_nodes - 1 in the
    standardized variable, and u(k | e^lnc) is smooth in ln c, so 9
    nodes give ~1e-7-class accuracy at sigma_lnc <~ 0.5 (pinned against
    an independent dense-trapz twin in tests/test_conc_scatter.py).

    The first moment <u> is the right profile for all terms linear in u
    (2-halo legs, cross spectra); the 1-halo AUTO term needs <u^2>
    (power.one_halo_square_term dispatches on MatterTracer.uk2).
    """
    xs_n, ws_n = np.polynomial.hermite.hermgauss(int(n_nodes))
    ws_n = ws_n / np.sqrt(np.pi)
    um, u2 = 0.0, 0.0
    for xi, wi in zip(xs_n, ws_n):
        # jnp.exp so sigma_lnc may be traced (e.g. a Fisher parameter)
        ci = cs * jnp.exp(np.sqrt(2.0) * xi * jnp.asarray(sigma_lnc))
        ui = nfw_uk_analytic(ks, zs, ci, rvirs / ci)
        um = um + wi * ui
        u2 = u2 + wi * ui * ui
    return um, u2


def nfw_uk_x(x, cs):
    """Truncated-NFW u as a function of x = k * r_s(comoving) and c.

    Shared core of nfw_uk_analytic; also used by the HMcode nonlinear
    power (models/hmcode.py), whose halo-bloating rescales x per (z,m,k)."""
    x2 = (1.0 + cs) * x
    sx, cx = jnp.sin(x), jnp.cos(x)
    sx2, cx2 = jnp.sin(x2), jnp.cos(x2)
    si, ci = sici_with_trig(x, sx, cx)
    sic, cic = sici_with_trig(x2, sx2, cx2)
    sin_cx = sx2 * cx - cx2 * sx  # sin(cx) = sin((1+c)x - x)
    mc = fcon(cs)
    return (sx * (sic - si) - sin_cx / x2 + cx * (cic - ci)) / mc


def battaglia_fit(m200critz, z, A0, alpham, alphaz):
    """Generic Battaglia mass/z power-law fit parameter (hmvec.py:800-802)."""
    return A0 * (m200critz / 1.0e14) ** alpham * (1.0 + z) ** alphaz


_INV_LN2 = 1.4426950408889634
_LN2_F32 = np.float32(0.6931471805599453)

# exp(a) Taylor coefficients 1/k!, k = 7..2, for |a| <= ln2/2 = 0.347
# (truncation 0.347^8/8! = 5e-9 relative; Horner in correctly-rounded
# f32 FMAs adds ~2 ulp)
_EXP_TAYLOR = tuple(np.float32(1.0 / _math.factorial(k))
                    for k in range(7, 1, -1))


def _exp2_poly_f32(f32):
    """2^f for f in [-1/2, 1/2] by polynomial only -- no exp/exp2 intrinsic.

    This TPU's XLA f32 transcendental intrinsics are low-precision
    (measured: exp/exp2 ~5e-6, log/log1p ~3e-4 relative -- DEVNOTES.md);
    plain mul/add are correctly rounded, so a degree-7 Taylor in
    a = f ln 2 restores ~1e-7 accuracy at negligible cost."""
    a = f32 * _LN2_F32
    acc = jnp.full_like(a, _EXP_TAYLOR[0])
    for ck in _EXP_TAYLOR[1:]:
        acc = acc * a + ck
    return (acc * a + 1.0) * a + 1.0


def _log1p_poly_f32(u32):
    """ln(1+u) for u in [0, 1] by the atanh series -- no log intrinsic.

    ln(1+u) = 2 atanh(w), w = u/(2+u) <= 1/3; odd series through w^13
    truncates at (1/3)^14/15 ~ 1e-8 relative."""
    w = u32 / (2.0 + u32)
    w2 = w * w
    acc = jnp.full_like(w, np.float32(1.0 / 13.0))
    for ck in (1.0 / 11.0, 1.0 / 9.0, 1.0 / 7.0, 1.0 / 5.0, 1.0 / 3.0, 1.0):
        acc = acc * w2 + np.float32(ck)
    return 2.0 * w * acc


def _exp_split_f32(arg64):
    """exp(arg) with the argument in f64 and the mantissa work in f32.

    Plain f32 exp of a large-magnitude argument loses |arg| * eps_f32
    RELATIVE accuracy purely from quantizing the argument (the Battaglia
    exponent chains reach |arg| ~ 80, i.e. ~1e-5 -- the round-2 config-2
    accuracy-gate failure).  Splitting arg/ln2 = n + f with n integer makes
    the f32 part (f, |f| <= 1/2) carry only ~3e-8 absolute error.  2^f is
    a pure-FMA polynomial (the TPU exp2 intrinsic is ~5e-6) and 2^n is
    built bit-exactly: (n+127)<<23 is the f32 encoding of 2^n for n in
    [-126, 127], zero below (true result subnormal), inf above (f32
    overflow: arg > ~88.7).
    """
    e = arg64 * _INV_LN2
    n = jnp.round(e)
    f = (e - n).astype(jnp.float32)
    n_i = n.astype(jnp.int32)
    pow2 = jax.lax.bitcast_convert_type(
        (jnp.clip(n_i, -126, 127) + 127) << 23, jnp.float32)
    out = jnp.where(n_i < -126, 0.0, _exp2_poly_f32(f) * pow2)
    return jnp.where(n_i > 127, jnp.float32(jnp.inf), out)


def _softplus_f32(a64):
    """ln(1 + exp(a)) with f64 argument accuracy, intrinsic-free f32 core.

    The dominant |a| part is exact (f64 max/add); the bounded correction
    log1p(exp(-|a|)) <= ln 2 runs through the polynomial exp/log kernels,
    so the absolute error is ~1e-7 independent of |a|."""
    t = _exp_split_f32(-jnp.abs(a64))
    return jnp.maximum(a64, 0.0) + _log1p_poly_f32(t).astype(jnp.float64)


def rho_gas_x(x, m200critz, z, omb, omm, rhocritz, gamma, fit_params):
    """Battaglia 2016 gas density profile in x = r/(R200/2) (hmvec.py:844-860).

    Note the sign flip on the second gamma (Battaglia 2016 typo), as in the
    reference.

    Powers with (z,m)-dependent exponents are evaluated as exp(e * ln x)
    with ln x computed once on the (1,1,nx) sample axis -- halves the
    transcendental count on the broadcast (z,m,x) grid vs naive pow.

    The broadcast stage follows x.dtype: an f32 sample grid (the TPU fast
    path in generic_profile_fft) runs the transcendentals on the native f32
    VPU, but with all exponent ARGUMENTS carried in f64 and the final
    exponentials magnitude-split (_exp_split_f32) -- plain f32 pow chains
    lose |exponent * ln x| * eps ~ 1e-5 relative here, the split path
    ~2e-7.
    """
    rho0 = battaglia_fit(m200critz, z, fit_params["rho0_A0"],
                         fit_params["rho0_alpham"], fit_params["rho0_alphaz"])
    alpha = battaglia_fit(m200critz, z, fit_params["alpha_A0"],
                          fit_params["alpha_alpham"], fit_params["alpha_alphaz"])
    beta = battaglia_fit(m200critz, z, fit_params["beta_A0"],
                         fit_params["beta_alpham"], fit_params["beta_alphaz"])
    dt = jnp.asarray(x).dtype
    pref = (omb / omm) * rhocritz * rho0
    expo = -(beta + gamma) / alpha
    if dt == jnp.float32:
        # TPU fast path: f64 argument algebra (cheap double-single mul/add),
        # f32 transcendentals with magnitude-safe splits (~2e-7 relative vs
        # the all-f64 path; plain f32 pow chains cost ~1e-5 here).
        lnx = jnp.log(x.astype(jnp.float64))
        g = gamma * lnx + expo * _softplus_f32(alpha * lnx)
        return pref.astype(dt) * _exp_split_f32(g)
    gamma_c = jnp.asarray(gamma, dtype=jnp.float64).astype(dt)
    alpha_c = alpha.astype(dt)
    expo_c = expo.astype(dt)
    lnx = jnp.log(x)
    xgamma = jnp.exp(gamma_c * lnx)
    xalpha = jnp.exp(alpha_c * lnx)
    outer = jnp.exp(expo_c * jnp.log1p(xalpha))
    return pref.astype(dt) * xgamma * outer


def pressure_x(x, m200critz, r200critz, z, omb, omm, rhocritz,
               alpha, gamma, fit_params,
               parsec_m=3.08567758e16, msun_kg=1.989e30, G_SI=6.67430e-11):
    """Battaglia 2016 electron pressure profile P_e(x), x = r/R200
    (hmvec.py:906-927).  Includes the XH=0.76 electron fraction.

    G_SI matches the reference's scipy.constants.G (CODATA 6.67430e-11;
    its cosmology.py and ksz.py use other G values -- kept separately for
    exact parity with each module)."""
    P0 = battaglia_fit(m200critz, z, fit_params["P0_A0"],
                       fit_params["P0_alpham"], fit_params["P0_alphaz"])
    xc = battaglia_fit(m200critz, z, fit_params["xc_A0"],
                       fit_params["xc_alpham"], fit_params["xc_alphaz"])
    beta = battaglia_fit(m200critz, z, fit_params["beta_A0"],
                         fit_params["beta_alpham"], fit_params["beta_alphaz"])
    XH = 0.76
    eFrac = 2.0 * (XH + 1.0) / (5.0 * XH + 3.0)
    G_newt = G_SI / (parsec_m * 1e6) ** 3 * msun_kg
    # broadcast stage follows x.dtype (see rho_gas_x)
    dt = jnp.asarray(x).dtype
    pref = (eFrac * (omb / omm) * 200.0 * m200critz * G_newt * rhocritz
            / (2.0 * r200critz) * P0)
    if dt == jnp.float32:
        # f64 argument algebra + split-f32 transcendentals (see rho_gas_x)
        lnxxc = jnp.log(x.astype(jnp.float64)) - jnp.log(xc)
        g = gamma * lnxxc - beta * _softplus_f32(alpha * lnxxc)
        return pref.astype(dt) * _exp_split_f32(g)
    gamma_c = jnp.asarray(gamma, dtype=jnp.float64).astype(dt)
    beta_c = beta.astype(dt)
    alpha_c = jnp.asarray(alpha, dtype=jnp.float64).astype(dt)
    lnxxc = jnp.log(x) - jnp.log(xc).astype(dt)  # ln x on the sample axis
    shape = jnp.exp(gamma_c * lnxxc
                    - beta_c * jnp.log1p(jnp.exp(alpha_c * lnxxc)))
    return pref.astype(dt) * shape


def rvir_grid(ms, zs, mdef, rhocritz, rhomz, omz):
    """r_vir(z,m) for 'vir'/'mean' (hmvec.py:111-115). ms:(nm,), z-arrays:(nz,)."""
    from .mass_function import deltav_bryan_norman
    ms = jnp.asarray(ms)[None, :]
    if mdef == "vir":
        return R_from_M(ms, rhocritz[:, None], deltav_bryan_norman(omz)[:, None])
    if mdef == "mean":
        return R_from_M(ms, rhomz[:, None], 200.0)
    raise ValueError(mdef)


# --- reference-signature free functions (hmvec.py:737, :800-932) -----------
# Thin wrappers over the dict-plumbed kernels above so reference call sites
# work verbatim; fit parameters default from battaglia_defaults[family]
# exactly like the reference's keyword defaults.

Fcon = fcon
battaglia_gas_fit = battaglia_fit


def _gas_fit_params(family, over):
    from ..params import battaglia_defaults
    fp = dict(battaglia_defaults[family])
    fp.update({k: v for k, v in over.items() if v is not None})
    return fp


def rho_gas_generic_x(x, m200critz, z, omb, omm, rhocritz, gamma=-0.2,
                      family="AGN", **fit_kwargs):
    """Battaglia-16 gas density at x = 2r/R200c (hmvec.py:844-860
    signature; fit params rho0_A0...beta_alphaz default from
    battaglia_defaults[family], override by keyword)."""
    return rho_gas_x(x, m200critz, z, omb, omm, rhocritz, gamma,
                     _gas_fit_params(family, fit_kwargs))


def rho_gas_generic(r, m200critz, z, omb, omm, rhocritz, gamma=-0.2,
                    family="AGN", **fit_kwargs):
    """Battaglia-16 gas density at physical r (hmvec.py:819-842)."""
    from .mass_function import R_from_M
    R200 = R_from_M(m200critz, rhocritz, delta=200)
    return rho_gas_generic_x(2.0 * r / R200, m200critz, z, omb, omm,
                             rhocritz, gamma, family, **fit_kwargs)


def rho_gas(r, m200critz, z, omb, omm, rhocritz, gamma=-0.2,
            profile="AGN"):
    """AGN/SH Battaglia-16 gas density rho(r) (hmvec.py:804-817)."""
    return rho_gas_generic(r, m200critz, z, omb, omm, rhocritz, gamma,
                           family=profile)


def P_e_generic_x(x, m200critz, R200critz, z, omb, omm, rhocritz,
                  alpha=1.0, gamma=-0.3, family="pres", **fit_kwargs):
    """Battaglia-16 electron pressure at x = r/R200c (hmvec.py:906-927)."""
    return pressure_x(x, m200critz, R200critz, z, omb, omm, rhocritz,
                      alpha, gamma, _gas_fit_params(family, fit_kwargs))


def P_e_generic(r, m200critz, z, omb, omm, rhocritz, alpha=1.0,
                gamma=-0.3, family="pres", **fit_kwargs):
    """Battaglia-16 electron pressure at physical r (hmvec.py:881-905)."""
    from .mass_function import R_from_M
    R200 = R_from_M(m200critz, rhocritz, delta=200)
    return P_e_generic_x(r / R200, m200critz, R200, z, omb, omm, rhocritz,
                         alpha, gamma, family, **fit_kwargs)


def P_e(r, m200critz, z, omb, omm, rhocritz, alpha=1.0, gamma=-0.3,
        profile="pres"):
    """Battaglia-16 electron pressure P_e(r) (hmvec.py:864-879)."""
    return P_e_generic(r, m200critz, z, omb, omm, rhocritz, alpha, gamma,
                       family=profile)
