"""Independent numpy/scipy oracle for HMcode-2016 (Mead et al 2015,
arXiv:1505.07833; 2016 updates, arXiv:1602.02154) -- the reference's
default nonlinear model ('mead', hmvec/cosmology.py:174).

Written against the papers independently of models/hmcode.py: explicit
per-(z,m) loops, scipy ``sici`` for the NFW window, scipy ``brentq`` for
the nonlinear-scale and Bullock formation-redshift roots, and the
Sheth-Tormen normalization computed by adaptive quadrature instead of the
Gamma-function closed form.  Shares only the *quadrature spec* with the
jax side (trapz-in-lnk on geomspace(1e-4, 1e3, 1536); trapz-in-lnM on
geomspace(1e6, 1e18, 256); fixed-point root tolerances), per the
twin-lockstep rule in DEVNOTES.md.

Model equations implemented (HMcode-2016 parameter set):

  Dv(z)    = 418 Om(z)^-0.352
  dc(z)    = (1.59 + 0.0314 ln sigma8(z)) (1 + 0.0123 log10 Om(z))
  eta      = (0.98 - 0.12 A) - 0.3 sigma8(z)
  k*       = 0.584 / sigma_v(z)
  f_damp   = clip(0.0095 (sigma_v100 h)^1.37, 1e-3, 0.99)
  alpha    = 3.24 * 1.85^neff,  3 + neff = -dln sigma^2/dln R at sigma=1
  c(M,z)   = A (1+z_f)/(1+z),  g(z_f) sigma(0.01 M, 0) = dc(z), c >= A
  D2_1h    = [k^3/2pi^2 int dnu g(nu) (M/rho) u(nu^eta k|M)^2]
             * (k/k*)^4 / (1 + (k/k*)^4)
  D2_2h    = D2_lin [1 - f tanh^2(k sigma_v / sqrt(f))]
  D2       = (D2_2h^alpha + D2_1h^alpha)^(1/alpha)
"""

from __future__ import annotations

import numpy as np
from scipy.integrate import quad
from scipy.optimize import brentq
from scipy.special import sici

# Shared quadrature spec (DEVNOTES "keep twin and jax in lockstep"):
_KG = np.geomspace(1e-4, 1e3, 1536)
_LNKG = np.log(_KG)
_MS = np.geomspace(1e6, 1e18, 256)
_LNMS = np.log(_MS)

_ST_Q = 0.707
_ST_P = 0.3


def _st_norm():
    """1 / int_0^inf (1 + (q nu^2)^-p) exp(-q nu^2 / 2) dnu, by adaptive
    quadrature (independent of the Gamma-function closed form)."""
    val, _ = quad(lambda nu: (1.0 + (_ST_Q * nu**2) ** -_ST_P)
                  * np.exp(-_ST_Q * nu**2 / 2.0), 0.0, np.inf)
    return 1.0 / val


_ST_A = _st_norm()


def _g_st(nu):
    qnu2 = _ST_Q * nu**2
    return _ST_A * (1.0 + qnu2 ** -_ST_P) * np.exp(-qnu2 / 2.0)


def _W(x):
    """Top-hat window 3 (sin x - x cos x) / x^3, series below 1e-2."""
    x = np.asarray(x, dtype=np.float64)
    out = np.empty_like(x)
    small = np.abs(x) < 1e-2
    xs = x[small]
    out[small] = 1.0 - xs**2 / 10.0 + xs**4 / 280.0
    xb = x[~small]
    out[~small] = 3.0 * (np.sin(xb) - xb * np.cos(xb)) / xb**3
    return out


def _xWprime(x):
    """x dW/dx = 3 sin(x)/x - 9 (sin x - x cos x)/x^3, series below 1e-2."""
    x = np.asarray(x, dtype=np.float64)
    out = np.empty_like(x)
    small = np.abs(x) < 1e-2
    xs = x[small]
    out[small] = -xs**2 / 5.0 + xs**4 / 70.0
    xb = x[~small]
    out[~small] = 3.0 * np.sin(xb) / xb - 9.0 * (np.sin(xb) - xb * np.cos(xb)) / xb**3
    return out


def _sigma2_of_R(d2k, R):
    """(sigma^2(R), dsigma^2/dlnR) from Delta^2(k) on the _KG grid."""
    x = _KG * R
    W = _W(x)
    s2 = np.trapezoid(d2k * W**2, _LNKG)
    ds2 = np.trapezoid(d2k * 2.0 * W * _xWprime(x), _LNKG)
    return s2, ds2


def _sigma_v2(d2k, R):
    W2 = _W(_KG * R) ** 2
    return np.trapezoid(d2k * W2 / _KG**2, _LNKG) / 3.0


def _u_nfw(x, c):
    """Truncated-NFW Fourier window via scipy Si/Ci.

    u(x) = [cos x (Ci((1+c)x) - Ci(x)) + sin x (Si((1+c)x) - Si(x))
            - sin(c x)/((1+c) x)] / (ln(1+c) - c/(1+c)),  x = k r_s.
    """
    x = np.asarray(x, dtype=np.float64)
    si1, ci1 = sici(x)
    si2, ci2 = sici((1.0 + c) * x)
    num = (np.cos(x) * (ci2 - ci1) + np.sin(x) * (si2 - si1)
           - np.sin(c * x) / ((1.0 + c) * x))
    return num / (np.log(1.0 + c) - c / (1.0 + c))


def hmcode_nonlinear_twin(tc, zs, ks, A_bary=3.13, version="2016",
                          logT_AGN=7.8):
    """HMcode nonlinear P(k,z) for a TwinCosmology ``tc``.

    zs: (nz,), ks: (nk,).  Returns (nz, nk).  Explicit loops throughout.
    version: '2016' (default) or '2015' (Mead 2015 Table-2 parameters:
    dc without the Omega_m factor, eta0 = 0.603, f = 0.188 sigma8^4.29,
    alpha = 2.93 * 1.77^neff, exponential one-halo damping); '2020';
    '2020_feedback' (the '2020' pipeline with the Mead-2021 sec.-5
    T_AGN model: B(z, theta) concentration amplitude, gas expelled
    below M_b(z, theta), central star fraction f*(z, theta); the
    one-halo window becomes [f_c + f_g(M)] u + f*).
    """
    if version not in ("2015", "2016", "2020", "2020_feedback"):
        raise ValueError(f"hmcode twin version {version!r}")
    v2020 = version in ("2020", "2020_feedback")
    zs = np.atleast_1d(np.asarray(zs, dtype=np.float64))
    ks = np.asarray(ks, dtype=np.float64)
    h = tc.h

    plin_g = tc.plin(zs, _KG)                       # (nz, nkg)
    plin_t = tc.plin(zs, ks)                        # (nz, nk)
    sigma8_0 = float(np.sqrt(tc.sigma2_R([8.0 / h], [0.0])[0, 0]))
    # cold (cb) spectrum for the sigma/nu machinery when m_nu > 0
    # (mirrors hmcode_power; total spectrum keeps feeding the two-halo
    # term and the 2020 dewiggle)
    plin_sig_g = plin_g
    if tc.omnu0 > 0.0 and version != "2015":
        plin_sig_g = tc.plin(zs, _KG, component="cb")
        d2t0 = tc.plin([0.0], _KG)[0] * _KG**3 / (2.0 * np.pi**2)
        d2c0 = tc.plin([0.0], _KG, component="cb")[0] * _KG**3 \
            / (2.0 * np.pi**2)
        s2t, _ = _sigma2_of_R(d2t0, 8.0 / h)
        s2c, _ = _sigma2_of_R(d2c0, 8.0 / h)
        sigma8_0 = sigma8_0 * float(np.sqrt(s2c / s2t))
    rho_m0 = float(tc.rho_matter_z(0.0))
    rl = (3.0 * _MS / (4.0 * np.pi * rho_m0)) ** (1.0 / 3.0)
    # Dolag factor is z-independent: hoist the two ODE integrations
    dol_pow = 1.0 if v2020 else 1.5
    dolag15 = tc.dolag_ratio() ** dol_pow
    theta_agn = logT_AGN - 7.8
    fbar = tc.ombh2 / (tc.ombh2 + tc.omch2)   # baryon fraction of cold matter

    out = np.empty((zs.size, ks.size))
    for iz, z in enumerate(zs):
        a = 1.0 / (1.0 + z)
        gz = float(tc.d_growth(a, norm="z0norm"))
        om = float(tc.omz(z))
        d2k = plin_sig_g[iz] * _KG**3 / (2.0 * np.pi**2)

        sigma8_z = sigma8_0 * gz
        fnu = tc.omnu0 / (tc.omm0 + tc.omnu0)
        if version == "2015":
            dc = 1.59 + 0.0314 * np.log(sigma8_z)
            eta = 0.603 - 0.3 * sigma8_z
            Dv = 418.0 * om ** -0.352
        elif v2020:
            dc = (3.0 / 20.0) * (12.0 * np.pi) ** (2.0 / 3.0) * (
                1.0 + 0.012299 * np.log10(om))
            xbn = om - 1.0
            Dv = (18.0 * np.pi**2 + 82.0 * xbn - 39.0 * xbn**2) / om
            eta = 0.1281 * sigma8_z ** -0.3644
        else:
            dc = (1.59 + 0.0314 * np.log(sigma8_z)) \
                * (1.0 + 0.0123 * np.log10(om))
            eta = (0.98 - 0.12 * A_bary) - 0.3 * sigma8_z
            Dv = 418.0 * om ** -0.352
        if version != "2015":
            # Mead-2016 sec. 4 massive-nu collapse-threshold terms
            dc = dc * (1.0 + 0.262 * fnu)
            Dv = Dv * (1.0 + 0.916 * fnu)

        sv = np.sqrt(_sigma_v2(d2k, 0.0))
        if version == "2015":
            fdamp = float(np.clip(0.188 * sigma8_z ** 4.29, 1e-3, 0.99))
            kstar = 0.584 / sv
        elif v2020:
            fdamp = float(np.clip(0.2696 * sigma8_z ** 0.9403, 1e-3, 0.99))
            kstar = 0.05618 * sigma8_z ** -1.013 * h
        else:
            sv100 = np.sqrt(_sigma_v2(d2k, 100.0 / h))
            fdamp = float(np.clip(0.0095 * (sv100 * h) ** 1.37, 1e-3, 0.99))
            kstar = 0.584 / sv

        # nonlinear scale: sigma(R) = 1 (sigma^2 decreasing in R)
        lr_nl = brentq(lambda lr: _sigma2_of_R(d2k, np.exp(lr))[0] - 1.0,
                       np.log(1e-4), np.log(1e3), xtol=1e-13)
        s2_nl, ds2_nl = _sigma2_of_R(d2k, np.exp(lr_nl))
        neff = -3.0 - ds2_nl / s2_nl
        if version == "2015":
            alpha = 2.93 * 1.77**neff
        elif v2020:
            alpha = 1.875 * 1.603**neff
        else:
            alpha = 3.24 * 1.85**neff

        # per-mass variance, slope, nu
        sig = np.empty(_MS.size)
        dlns2 = np.empty(_MS.size)
        for im in range(_MS.size):
            s2, ds2 = _sigma2_of_R(d2k, rl[im])
            sig[im] = np.sqrt(s2)
            dlns2[im] = ds2 / s2
        nu = dc / sig
        dnu_dlnm = -(nu / 6.0) * dlns2

        # Bullock z_f: g(z_f) sigma(0.01 M, 0) = dc;  c = A (1+z_f)/(1+z)
        sig0 = sig / gz
        lnsig0 = np.log(sig0)
        zf_arr = np.empty(_MS.size)
        for im in range(_MS.size):
            # sigma(0.01 M, 0): interp/extrapolate ln sigma0 in ln M
            lnm_f = _LNMS[im] + np.log(0.01)
            s0_fm = np.exp(np.interp(lnm_f, _LNMS, lnsig0)) \
                if lnm_f >= _LNMS[0] else np.exp(
                    lnsig0[0] + (lnsig0[1] - lnsig0[0])
                    / (_LNMS[1] - _LNMS[0]) * (lnm_f - _LNMS[0]))
            rhs = dc / s0_fm
            gdiff = lambda zf: float(tc.d_growth(1.0 / (1.0 + zf),
                                                 norm="z0norm")) - rhs
            if gdiff(0.0) <= 0.0:       # rhs >= g(0)=1: no z_f >= 0
                zf = 0.0
            elif gdiff(100.0) >= 0.0:   # rhs below g(100): ceiling
                zf = 100.0
            else:
                zf = brentq(gdiff, 0.0, 100.0, xtol=1e-12)
            zf_arr[im] = zf

        def c_of_amp(camp):
            # c = max(B (1+z_f)/(1+z), B), then the Dolag DE correction
            # (^1.5; ^1 for the 2020 family), exactly 1 for LCDM
            return np.maximum(camp * (1.0 + zf_arr) / (1.0 + z),
                              camp) * dolag15

        camp = 5.196 if v2020 else A_bary       # gravity-only amplitude
        c_arr = c_of_amp(camp)

        rv = rl / Dv ** (1.0 / 3.0)
        rs = rv / c_arr

        # one-halo term (damped); window=(mb, fstar) applies the
        # Mead-2021 sec.-5 gas/star modification
        def one_halo_d2(cs, window=None):
            rss = rl / Dv ** (1.0 / 3.0) / cs
            integ = np.empty((_MS.size, ks.size))
            for im in range(_MS.size):
                x = nu[im] ** eta * ks * rss[im]
                u = _u_nfw(x, cs[im])
                if window is not None:
                    mb_w, fstar_w = window
                    mr2 = (_MS[im] / mb_w) ** 2
                    fgas = (fbar - fstar_w) * mr2 / (1.0 + mr2)
                    u = ((1.0 - fbar) + fgas) * u + fstar_w
                integ[im] = (_g_st(nu[im]) * dnu_dlnm[im]
                             * _MS[im] / rho_m0) * u * u
            p1h = np.trapezoid(integ, _LNMS, axis=0)
            if version != "2015":
                p1h = p1h * (1.0 - fnu) ** 2  # halos hold cold matter only
            d2 = p1h * ks**3 / (2.0 * np.pi**2)
            ky = ks / kstar
            if version == "2015":
                return d2 * -np.expm1(-(ky**2))
            return d2 * ky**4 / (1.0 + ky**4)

        d2_1h = one_halo_d2(c_arr)

        # two-halo term
        if v2020:
            # dewiggle: Gaussian smoothing (sigma_lnk = 0.25, rows
            # renormalized) of ln(P / EH-nowiggle template), explicit
            # convolution loop; then sigma_v^2 damping of the wiggle
            pref = tc.plin_approx(np.array([z]), _KG, kind="eisenhu")[0]
            lnr = np.log(plin_g[iz] / pref)
            sm = np.empty(_KG.size)
            for i in range(_KG.size):
                w = np.exp(-0.5 * ((_LNKG - _LNKG[i]) / 0.25) ** 2)
                sm[i] = np.dot(w, lnr) / w.sum()
            p_sm = pref * np.exp(sm)
            p_dw_g = p_sm + (plin_g[iz] - p_sm) * np.exp(
                -(_KG**2) * sv**2)
            rat = np.interp(np.log(ks), _LNKG,
                            np.log(p_dw_g / plin_g[iz]))
            p_dw = plin_t[iz] * np.exp(rat)
            kd = 0.05699 * sigma8_z ** -1.089 * h
            ynd = (ks / kd) ** 2.853
            d2_2h = (p_dw * ks**3 / (2.0 * np.pi**2)
                     * (1.0 - fdamp * ynd / (1.0 + ynd)))
        else:
            d2_lin = plin_t[iz] * ks**3 / (2.0 * np.pi**2)
            d2_2h = d2_lin * (1.0 - fdamp * np.tanh(
                ks * sv / np.sqrt(fdamp)) ** 2)

        d2 = (d2_2h**alpha + d2_1h**alpha) ** (1.0 / alpha)

        if version == "2020_feedback":
            # Mead-2021 sec.-5 feedback RESPONSE: hydro / gravity-only
            # halo-model ratio (Table-5 parameter columns) applied to
            # the gravity-only power above; two-halo term shared
            c_hyd = c_of_amp((3.13 - 0.496 * theta_agn)
                             * 10.0 ** (z * (-0.0485 - 0.0371 * theta_agn)))
            mb = (10.0 ** (13.87 + 1.81 * theta_agn) / h
                  * 10.0 ** (z * (-0.108 + 0.195 * theta_agn)))
            fstar = min((2.01 - 0.30 * theta_agn) * 1e-2
                        * 10.0 ** (z * (0.409 + 0.0224 * theta_agn)), fbar)
            d2_hyd = one_halo_d2(c_hyd, (mb, fstar))
            c_grv = c_of_amp(3.44 * 10.0 ** (z * -0.0671))
            d2_grv = one_halo_d2(c_grv)
            d2 = d2 * ((d2_2h**alpha + d2_hyd**alpha)
                       / (d2_2h**alpha + d2_grv**alpha)) ** (1.0 / alpha)

        out[iz] = d2 * (2.0 * np.pi**2) / ks**3
    return out
