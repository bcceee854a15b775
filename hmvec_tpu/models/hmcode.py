"""HMcode nonlinear matter power (Mead et al 2015, arXiv:1505.07833,
with the Mead et al 2016 updates, arXiv:1602.02154): the reference's
default nonlinear model ('mead', hmvec/cosmology.py:174 -> CAMB
halofit_version) implemented natively in jnp.

HMcode is itself a halo model with emulator-fitted modifications, so it
maps onto this package's existing machinery (sigma^2 matmuls, ST mass
function, analytic NFW u(k) via Si/Ci):

  * fitted virial overdensity    Dv(z)  = 418 * Om_m(z)^-0.352
  * fitted collapse threshold    dc(z)  = 1.59 + 0.0314 ln sigma8(z),
                                 x (1 + 0.0123 log10 Om_m(z))   [2016]
  * halo bloating                u(k) -> u(nu^eta k),
                                 eta = eta0 - 0.3 sigma8(z),
                                 eta0 = 0.98 - 0.12 A            [2016]
  * Bullock-2001 concentration   c(M,z) = A (1+z_f)/(1+z), with the
                                 formation redshift from
                                 g(z_f) sigma(f M, 0) = dc(z), f = 0.01;
                                 A = 3.13 is the baryonic-feedback knob
  * one-halo large-scale damping Delta^2_1h *= (k/k*)^4/(1+(k/k*)^4),
                                 k* = 0.584 / sigma_v(z)         [2016]
  * two-halo perturbative damping P_2h = P_lin [1 - f tanh^2(k sigma_v
                                 / sqrt(f))], f = 0.0095 sigma_v100^1.37
                                 (sigma_v100 in Mpc/h)           [2016]
  * quasi-linear smoothing       Delta^2 = (D2_2h^alpha +
                                 D2_1h^alpha)^(1/alpha),
                                 alpha = 3.24 * 1.85^neff        [2016]

with neff from the top-hat variance at the nonlinear scale,
3 + neff = -dln sigma^2/dln R at sigma(R, z) = 1.

PROVENANCE NOTE: this environment has no network and no CAMB/HMcode
source, so the fitted coefficients above are transcribed from the
published papers.  Since round 3 the transcription is checked by an
INDEPENDENT explicit-loop numpy oracle (twin/hmcode.py: scipy
sici/brentq/quad, its own window functions and ST normalization), pinned
at <=1e-8 (LCDM) / <=1e-6 (w0/wa) in tests/test_hmcode.py, plus external
quantitative anchors: the Mead-2015 Table-2 eta0 value recovered by the
2016 tied relation, and the A=2.32 feedback suppression tracked against
the reference's digitized OWLS/Horizon-AGN curves.  Massive neutrinos
enter with the full Mead-2016 sec. 4 recipe (exact no-ops at m_nu = 0):
the sigma/nu machinery runs on the COLD cb spectrum (EH99 eq 12,
transfer.eh99_neutrino_ratio(component='cb')), the one-halo term
carries (1 - f_nu)^2 (neutrinos don't cluster in halos), the collapse
thresholds get dc x (1 + 0.262 f_nu) and Dv x (1 + 0.916 f_nu), and the
two-halo term keeps the total (cb+nu) linear power.  w0/wa growth uses the integrated growing mode
(background.growth_table), and the Dolag-2004 dark-energy concentration
correction (ratio of far-future growths, ^1.5) is applied whenever the
ODE growth engages (background.growth_dolag_ratio; exactly 1 at LCDM,
twin-pinned for w0/wa).
Verify against CAMB 'mead' before use where sub-percent absolute
accuracy vs CAMB specifically matters.  Everything is jit- and
grad-compatible.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.weights import trapz_weights
from ..ops.special import Wkr
from .profiles import nfw_uk_x
from . import background as bgmod

# static ln-k grid for the spectral moments (variance, displacement)
_KG = np.geomspace(1e-4, 1e3, 1536)
_LNKW = trapz_weights(np.log(_KG))

# static Gaussian-in-lnk smoothing matrix for the HMcode-2020 dewiggle:
# P_smooth = T * exp(S @ ln(P/T)) with T the EH98 zero-baryon template
# removes the BAO oscillation (lnk period ~0.05-0.3 over the BAO range)
# while preserving the broadband -- smoothing the RATIO cancels the
# sigma^2/2 * curvature bias that smoothing ln P directly would leave,
# and the construction is exactly invariant to the template's
# normalization (rows are renormalized, so a constant passes through).
# One (nkg, nkg) matmul on the static grid.
_DW_SIGMA = 0.25


def _dewiggle_matrix():
    lnk = np.log(_KG)
    d = lnk[None, :] - lnk[:, None]
    S = np.exp(-0.5 * (d / _DW_SIGMA) ** 2)
    S /= S.sum(axis=1, keepdims=True)
    return S


_DW_S = _dewiggle_matrix()

# internal halo-mass grid (Msun, no h): wide enough that the nu-integral
# tails are negligible at both ends for 0 <= z <~ 6
_MS = np.geomspace(1e6, 1e18, 256)
_LNMW = trapz_weights(np.log(_MS))

# sigma(f M) for the Bullock formation-redshift condition (f = 0.01): the
# mass grid is uniform in ln M, so evaluating ln sigma at ln M + ln f is a
# CONSTANT fractional index shift -- static gather indices + one lerp
# weight.  t is left unclamped so masses whose f M falls below the grid
# extrapolate linearly in (ln M, ln sigma) from the lowest grid interval
# (those are M < 1e8 Msun, negligible in the nu integrals; beats both the
# old one-term local-slope extrapolation and a flat clamp).
_FM_LNF = np.log(0.01)
_FM_SHIFT = _FM_LNF / np.log(_MS[1] / _MS[0])        # ~ -42.5 grid cells
_FM_J = np.clip(np.arange(_MS.size) + int(np.floor(_FM_SHIFT)),
                0, _MS.size - 2)
_FM_T = np.arange(_MS.size) + _FM_SHIFT - _FM_J      # unclamped fraction

# Sheth-Tormen g(nu) parameters, HMcode convention (Mead 2015 eq. 15-16)
_ST_Q = 0.707
_ST_P = 0.3
# normalization so that int_0^inf g(nu) dnu = 1 (all mass in halos):
# A = sqrt(2q) / (sqrt(pi) + 2^-p Gamma(1/2 - p))  [= 0.21616 for q,p above]
from scipy.special import gamma as _scipy_gamma  # host-side constant only
_ST_A = float(np.sqrt(2.0 * _ST_Q)
              / (np.sqrt(np.pi) + 2.0 ** -_ST_P * _scipy_gamma(0.5 - _ST_P)))


def _st_gnu(nu):
    qnu2 = _ST_Q * nu**2
    return _ST_A * (1.0 + qnu2 ** -_ST_P) * jnp.exp(-qnu2 / 2.0)


def _xwprime(x, switch=0.05):
    """x dW/dx for the top-hat window: 3 sin x / x - 3 W(x).

    Taylor form -x^2/5 + x^4/70 below the switch (cancellation guard)."""
    xs = jnp.where(x == 0, 1.0, x)
    big = 3.0 * jnp.sin(xs) / xs - 3.0 * Wkr(x, 1.0)
    small = -(x**2) / 5.0 + x**4 / 70.0
    return jnp.where(x < switch, small, big)


def _tophat_moments(delta2_g, R):
    """(sigma^2(R), dln sigma^2/dln R) for top-hat smoothing.

    delta2_g: (nz, nkg) dimensionless linear power on _KG; R broadcastable
    to (nz, ...).  Contractions over k via static trapz-in-lnk weights."""
    kg = jnp.asarray(_KG)
    w = jnp.asarray(_LNKW)
    x = kg * R[..., None]                         # (nz, ..., nkg)
    W = Wkr(x, 1.0)
    d2 = delta2_g[:, None, :] if x.ndim == 3 else delta2_g
    s2 = (d2 * W**2) @ w
    d1 = (d2 * 2.0 * W * _xwprime(x)) @ w         # dsigma^2/dlnR
    return s2, d1 / s2


def _sigma_v2(delta2_g, R):
    """1-D displacement variance sigma_v^2(R) = (1/3) int dlnk D2(k)/k^2
    W^2(kR) (Mead 2015 eq. 22).  R scalar (0 -> unfiltered)."""
    kg = jnp.asarray(_KG)
    w = jnp.asarray(_LNKW)
    W2 = Wkr(kg * R, 1.0) ** 2
    return (delta2_g * (W2 / kg**2)) @ w / 3.0


def hmcode_nonlinear(bg, zs, ks, plin_g, plin, sigma8_0, A_bary=3.13,
                     num_iter: int = 60, growth_mode: str = "closed",
                     version: str = "2016", plin_ref_g=None,
                     plin_sig_g=None, logT_AGN=7.8):
    """HMcode nonlinear P(k,z) from precomputed linear power.

    bg: BackgroundParams; zs: (nz,); ks: (nk,); plin_g: (nz, nkg) linear P
    on the static _KG grid; plin: (nz, nk) on the target ks; sigma8_0:
    scalar sigma_8(z=0).  growth_mode: 'closed' (LCDM 2F1) or 'ode'
    (general w0/wa; one growth table integrated up front and shared by
    every growth eval incl. the z_f bisection).  Pure jnp, jit/grad-safe;
    callers jit.

    version: '2016' (default; the reference's CAMB 'mead') or '2015'
    (arXiv:1505.07833 Table 2, the reference's 'mead2015' string):
    same halo-model machinery with the original fitted parameters --
    dc without the Omega_m(z) factor, eta0 = 0.603 untied from A,
    f_damp = 0.188 sigma8(z)^4.29, alpha = 2.93 * 1.77^neff, and the
    exponential one-halo damping 1 - exp(-(k/k*)^2) that Mead-2016
    replaced with k^4/(1+k^4).  PROVENANCE: transcribed from the 2015
    paper like the 2016 set (module docstring); twin-pinned in
    tests/test_hmcode.py but without an external anchor of its own.

    version '2020' (Mead et al 2021, arXiv:2009.01858; CAMB >= 1.3's
    default 'mead2020'): physical spherical-collapse dc/Dv
    (Nakamura-Suto / Bryan-Norman forms -- a documented stand-in for
    the Mead-2017 fitting functions, sub-% for LCDM-like backgrounds),
    concentration amplitude B = 5.196 (A_bary is ignored; the Dolag DE
    correction applies with its original power 1, vs the 1.5 refit of
    2015/2016), and the Table-2 sigma8(z)
    scaling laws: eta = 0.1281 s8^-0.3644, k* = 0.05618 s8^-1.013
    [h/Mpc], alpha = 1.875 * 1.603^neff, and the
    perturbation-theory-inspired two-halo damping on the DEWIGGLED
    linear power P_dw [1 - f y^nd/(1+y^nd)], y = k/kd, with
    f = 0.2696 s8^0.9403, kd = 0.05699 s8^-1.089 [h/Mpc], nd = 2.853;
    P_dw = smooth + (P - smooth) exp(-k^2 sigma_v^2(z)) with the
    template-ratio Gaussian smoothing above (requires plin_ref_g, the
    EH98 zero-baryon template on the _KG grid).  Massive neutrinos use
    the same recipe as '2016' (cb sigma machinery via plin_sig_g,
    (1-f_nu)^2 one-halo, the 2016 dc/Dv multipliers standing in for
    2020's own Mead-2017 f_nu dependence -- a documented
    approximation).
    PROVENANCE: the five scaling laws and B are memory-transcriptions
    of Table 2 -- twin-pinned and property-tested, no external number
    available in this offline environment.

    version '2020_feedback' (CAMB >= 1.3's 'mead2020_feedback'): the
    '2020' power times the single-parameter baryonic feedback RESPONSE
    of Mead et al 2021 sec. 5 -- the ratio of two halo-model
    evaluations with the Table-5 hydro / gravity-only parameter sets
    (the model was FITTED as a response to BAHAMAS/DMONLY, so
    halo-model systematics divide out), theta = log10(T_AGN/K) - 7.8,
    calibrated over 7.6 <= log10 T_AGN <= 8.0, z <~ 2.  Hydro column:

      B(z)   = (3.13 - 0.496 theta) 10^(z (-0.0485 - 0.0371 theta))
      M_b(z) = 10^(13.87 + 1.81 theta) Msun/h
               * 10^(z (-0.108 + 0.195 theta))
      f*(z)  = (2.01 - 0.30 theta) 1e-2 * 10^(z (0.409 + 0.0224 theta)),
               clamped to the baryon fraction f_b

    with each halo's one-halo window becoming (eq. 25)

      W(M,k)/M = [f_c + f_g(M)] u(k|M) + f*,
      f_g(M)   = (f_b - f*) (M/M_b)^2 / (1 + (M/M_b)^2),  f_c = 1 - f_b

    (gas expelled below M_b, a k-independent central star component);
    gravity-only column: plain NFW windows with B(z) = 3.44 10^-0.0671z.
    The two-halo term is perturbative and shared, so the response -> 1
    at low k.  f_b is the baryon fraction of the COLD matter (halos
    hold cb only; composes with the (1-f_nu)^2 factor).  Deviation from
    the paper's pipeline: the response is evaluated with this module's
    full 2020 machinery (eta bloating, k* damping, alpha smoothing)
    rather than a separate vanilla halo model -- shared factors divide
    out, so the difference is second-order in the response.
    PROVENANCE: Table-5 values transcribed from memory of the
    paper/CAMB port like the Table-2 set above; the assignment of the
    two B columns (which of 3.13/3.44 is hydro vs gravity-only) was
    additionally disambiguated by the paper's stated physical direction
    (feedback DECREASES concentrations) and the BAHAMAS suppression
    depth (candidate-pairing scan recorded in DEVNOTES.md) -- twin-
    pinned and property-tested (suppression sign/monotonicity in T_AGN,
    BAHAMAS-scale envelope), no external number available here.
    """
    if version not in ("2015", "2016", "2020", "2020_feedback"):
        raise ValueError(f"hmcode version {version!r}: supported are "
                         "'2015', '2016', '2020', '2020_feedback' (the "
                         "class API maps 'mead'/'mead2015'/'mead2020'/"
                         "'mead2020_feedback' onto these)")
    v2020 = version in ("2020", "2020_feedback")
    zs = jnp.atleast_1d(jnp.asarray(zs))
    ks = jnp.asarray(ks)
    kg = jnp.asarray(_KG)
    ms = jnp.asarray(_MS)
    h = bg.H0 / 100.0
    # sigma machinery (variance, neff, sigma_v, nu) runs on plin_sig_g
    # -- the COLD cb spectrum when m_nu > 0 (neutrinos don't cluster in
    # halos; hmcode_power supplies it); the total plin_g/plin feed the
    # two-halo term and the 2020 dewiggle
    if plin_sig_g is None:
        plin_sig_g = plin_g
    delta2_g = plin_sig_g * kg[None, :] ** 3 / (2.0 * np.pi**2)

    gtab = bgmod.growth_table(bg) if growth_mode == "ode" else None

    def growth_z0norm(a_eval):
        return bgmod.d_growth(bg, a_eval, norm="z0norm", mode=growth_mode,
                              table=gtab)

    # --- fitted background quantities ---------------------------------
    a = 1.0 / (1.0 + zs)
    gz = growth_z0norm(a)                                # g(0) = 1
    omz = bgmod.omz(bg, zs)
    sigma8_z = sigma8_0 * gz
    fnu = bg.omnu0 / (bg.omm0 + bg.omnu0)
    if version == "2015":                                # Mead15 table 2
        dc = 1.59 + 0.0314 * jnp.log(sigma8_z)
        eta = 0.603 - 0.3 * sigma8_z
        Dv = 418.0 * omz ** -0.352
    elif v2020:
        # physical spherical collapse (NS97 / BN98), mean-density Dv
        dc = (3.0 / 20.0) * (12.0 * jnp.pi) ** (2.0 / 3.0) * (
            1.0 + 0.012299 * jnp.log10(omz))
        xbn = omz - 1.0
        Dv = (18.0 * jnp.pi**2 + 82.0 * xbn - 39.0 * xbn**2) / omz
        eta = 0.1281 * sigma8_z ** -0.3644
    else:                                                # Mead16 table 1
        dc = ((1.59 + 0.0314 * jnp.log(sigma8_z))
              * (1.0 + 0.0123 * jnp.log10(omz)))
        eta = (0.98 - 0.12 * A_bary) - 0.3 * sigma8_z
        Dv = 418.0 * omz ** -0.352
    if version != "2015":
        # Mead-2016 sec. 4 massive-neutrino corrections to the collapse
        # thresholds (applied in 2020 too, standing in for the Mead-2017
        # fits' own f_nu dependence -- see docstring); exact no-ops at
        # m_nu = 0
        dc = dc * (1.0 + 0.262 * fnu)
        Dv = Dv * (1.0 + 0.916 * fnu)

    sv2 = _sigma_v2(delta2_g, 0.0)                       # (nz,)
    sv = jnp.sqrt(sv2)
    if version == "2015":
        fdamp = jnp.clip(0.188 * sigma8_z ** 4.29, 1e-3, 0.99)
        kstar = 0.584 / sv
    elif v2020:
        fdamp = jnp.clip(0.2696 * sigma8_z ** 0.9403, 1e-3, 0.99)
        kstar = 0.05618 * sigma8_z ** -1.013 * h         # table-2, h/Mpc
    else:
        sv100 = jnp.sqrt(_sigma_v2(delta2_g, 100.0 / h))  # R = 100 Mpc/h
        fdamp = jnp.clip(0.0095 * (sv100 * h) ** 1.37, 1e-3, 0.99)
        kstar = 0.584 / sv

    # --- neff at the nonlinear scale (top-hat sigma = 1) ---------------
    lo = jnp.full((zs.size,), jnp.log(1e-4))
    hi = jnp.full((zs.size,), jnp.log(1e3))

    def body(_, carry):
        lo, hi = carry
        mid = (lo + hi) / 2.0
        s2, _ = _tophat_moments(delta2_g, jnp.exp(mid))
        go_right = s2 > 1.0          # sigma^2 decreasing in R
        return jnp.where(go_right, mid, lo), jnp.where(go_right, hi, mid)

    lo, hi = jax.lax.fori_loop(0, num_iter, body, (lo, hi))
    _, dlns2_nl = _tophat_moments(delta2_g, jnp.exp((lo + hi) / 2.0))
    neff = -3.0 - dlns2_nl
    if version == "2015":
        alpha = 2.93 * 1.77**neff
    elif v2020:
        alpha = 1.875 * 1.603**neff
    else:
        alpha = 3.24 * 1.85**neff

    # --- halo ingredients on the internal mass grid --------------------
    rho_m0 = bgmod.rho_matter_z(bg, 0.0)                 # comoving
    rl = (3.0 * ms / (4.0 * np.pi * rho_m0)) ** (1.0 / 3.0)
    sigma2_m, dlns2_m = _tophat_moments(
        delta2_g, rl[None, :] + jnp.zeros((zs.size, 1)))  # (nz, nm)
    sig = jnp.sqrt(sigma2_m)
    nu = dc[:, None] / sig
    # dnu/dlnM = -(nu/6) dln sigma^2/dln R  (dlnR/dlnM = 1/3)
    dnu_dlnm = -(nu / 6.0) * dlns2_m

    # Bullock formation redshift (Mead 2015 eq. 20-21, f = 0.01):
    # sigma(f M, z_f) = dc(z), i.e. g(z_f) sigma(fM, 0) = dc(z), so
    # z_f -> z exactly when sigma(fM, z) = dc.  sigma(fM, 0) by lerp of
    # ln sigma(M, 0) on the (uniform-in-lnM) mass grid at the static
    # fractional shift ln f / dlnM (see _FM_* above).
    sig0 = sig / gz[:, None]                             # sigma(M, z=0)
    lnsig0 = jnp.log(sig0)
    t = jnp.asarray(_FM_T)[None, :]
    sig0_fm = jnp.exp(lnsig0[:, _FM_J] * (1.0 - t)
                      + lnsig0[:, _FM_J + 1] * t)
    rhs = dc[:, None] / sig0_fm                          # target g(z_f)

    zlo = jnp.zeros_like(rhs)
    zhi = jnp.full_like(rhs, 100.0)

    def zbody(_, carry):
        zlo, zhi = carry
        zmid = (zlo + zhi) / 2.0
        gmid = growth_z0norm(1.0 / (1.0 + zmid))
        deeper = gmid > rhs          # g decreasing in z
        return jnp.where(deeper, zmid, zlo), jnp.where(deeper, zhi, zmid)

    zlo, zhi = jax.lax.fori_loop(0, num_iter, zbody, (zlo, zhi))
    zf = (zlo + zhi) / 2.0
    # Dolag-2004 dark-energy correction to the concentrations:
    # HMcode-2015/2016 refit the exponent to 1.5; HMcode-2020 reverted
    # to Dolag's original power 1.  Exactly 1 at the LCDM point but
    # with real w0/wa gradients, so it engages precisely when the ODE
    # growth does.
    dolag_fac = 1.0
    if growth_mode == "ode":
        dolag_pow = 1.0 if v2020 else 1.5
        dolag_fac = bgmod.growth_dolag_ratio(bg) ** dolag_pow

    # comoving virial radius from the fitted Dv (mean-density def)
    rv = rl[None, :] / Dv[:, None] ** (1.0 / 3.0)
    w_int = (jnp.asarray(_LNMW)[None, :] * _st_gnu(nu) * dnu_dlnm
             * ms[None, :] / rho_m0)                     # (nz, nm)

    def one_halo_d2(c_amp, window=None):
        """Damped one-halo Delta^2 for a concentration amplitude (the
        feedback knob A in 2015/2016, the refitted B in the 2020
        family; scalar or (nz, 1)) and an optional (wmod, fstar)
        gas/star window modification (Mead 2021 sec. 5)."""
        c = c_amp * (1.0 + zf) / (1.0 + zs[:, None])
        c = jnp.maximum(c, c_amp)    # z_f < z collapses to c = amp
        c = c * dolag_fac
        rs = rv / c
        x = ((nu ** eta[:, None])[..., None]
             * ks[None, None, :] * rs[..., None])
        u = nfw_uk_x(x, c[..., None])                    # (nz, nm, nk)
        if window is not None:
            wmod, fstar = window
            u = wmod[..., None] * u + fstar[..., None]
        p1h = jnp.sum(w_int[..., None] * u * u, axis=1)  # (nz, nk)
        if version != "2015":
            # halos hold only the cold fraction of the matter (Mead
            # 2016 sec. 4); exact no-op at m_nu = 0
            p1h = p1h * (1.0 - fnu) ** 2
        d2 = p1h * ks[None, :] ** 3 / (2.0 * np.pi**2)
        ky = ks[None, :] / kstar[:, None]
        if version == "2015":
            return d2 * -jnp.expm1(-(ky**2))
        return d2 * ky**4 / (1.0 + ky**4)

    # gravity-only one-halo term (A_bary deliberately ignored in the
    # 2020 family, whose feedback enters via the T_AGN response below)
    d2_1h = one_halo_d2(5.196 if v2020 else A_bary)

    # --- two-halo term (damped linear) ----------------------------------
    if v2020:
        if plin_ref_g is None:
            raise ValueError(f"hmcode version {version!r} needs "
                             "plin_ref_g (EH98 zero-baryon template on "
                             "the _KG grid) for the dewiggle")
        # dewiggle on the static grid: template-ratio Gaussian smoothing
        # then sigma_v^2 damping of the wiggle component (2009.01858
        # sec. 2; one matmul, exactly template-normalization-invariant)
        lnr = jnp.log(plin_g / plin_ref_g)               # (nz, nkg)
        p_sm_g = plin_ref_g * jnp.exp(
            jnp.einsum("ij,zj->zi", jnp.asarray(_DW_S), lnr))
        wig_damp = jnp.exp(-(kg**2)[None, :] * sv2[:, None])
        p_dw_g = p_sm_g + (plin_g - p_sm_g) * wig_damp
        # transfer the (smooth in lnk) dewiggle ratio to the target ks
        lnrat_g = jnp.log(p_dw_g / plin_g)
        lnk_t, lnk_g = jnp.log(ks), jnp.log(kg)
        rat_t = jax.vmap(lambda r: jnp.interp(lnk_t, lnk_g, r))(lnrat_g)
        d2_dw = plin * jnp.exp(rat_t) * ks[None, :] ** 3 / (2.0 * np.pi**2)
        kd = 0.05699 * sigma8_z ** -1.089 * h            # table-2, h/Mpc
        ynd = (ks[None, :] / kd[:, None]) ** 2.853
        d2_2h = d2_dw * (1.0 - fdamp[:, None] * ynd / (1.0 + ynd))
    else:
        d2_lin = plin * ks[None, :] ** 3 / (2.0 * np.pi**2)
        f = fdamp[:, None]
        d2_2h = d2_lin * (1.0 - f * jnp.tanh(ks[None, :] * sv[:, None]
                                             / jnp.sqrt(f)) ** 2)

    # --- quasi-linear smoothing ------------------------------------------
    al = alpha[:, None]
    d2 = (d2_2h**al + d2_1h**al) ** (1.0 / al)

    if version == "2020_feedback":
        # Mead-2021 sec.-5 baryonic feedback RESPONSE: the ratio of two
        # halo-model evaluations with the Table-5 hydro / gravity-only
        # parameter sets, applied multiplicatively to the gravity-only
        # power above (the fit is to the BAHAMAS response, so halo-model
        # systematics divide out; both evaluations share this pipeline's
        # two-halo term, alpha, zf, eta).  theta = log10(T_AGN/K) - 7.8,
        # BAHAMAS-calibrated over 7.6 <= log10 T_AGN <= 8.0.
        theta_agn = jnp.asarray(logT_AGN) - 7.8
        # hydro column: B(z, theta), gas expelled below M_b(z, theta),
        # central star fraction f*(z, theta); fractions of the COLD
        # matter (halos hold cb only)
        c_hyd = ((3.13 - 0.496 * theta_agn)
                 * 10.0 ** (zs[:, None] * (-0.0485 - 0.0371 * theta_agn)))
        fbar = bg.ombh2 / (bg.ombh2 + bg.omch2)
        mb = (10.0 ** (13.87 + 1.81 * theta_agn) / h
              * 10.0 ** (zs[:, None] * (-0.108 + 0.195 * theta_agn)))
        fstar = jnp.minimum(
            (2.01 - 0.30 * theta_agn) * 1e-2
            * 10.0 ** (zs * (0.409 + 0.0224 * theta_agn)), fbar)[:, None]
        mrat2 = (ms[None, :] / mb) ** 2                  # (nz, nm)
        fgas = (fbar - fstar) * mrat2 / (1.0 + mrat2)
        wmod = (1.0 - fbar) + fgas                       # f_c + f_g(M)
        d2_1h_hyd = one_halo_d2(c_hyd, (wmod, fstar))
        # gravity-only column: plain NFW windows, B(z) = 3.44 10^-0.0671z
        c_grv = 3.44 * 10.0 ** (zs[:, None] * -0.0671)
        d2_1h_grv = one_halo_d2(c_grv)
        d2 = d2 * ((d2_2h**al + d2_1h_hyd**al)
                   / (d2_2h**al + d2_1h_grv**al)) ** (1.0 / al)

    return d2 * (2.0 * np.pi**2) / ks[None, :] ** 3


_hmcode_nl_j = jax.jit(hmcode_nonlinear,
                       static_argnames=("num_iter", "growth_mode",
                                        "version"))


_PLIN_JIT_CACHE: dict = {}


def _plin_j(engine, accuracy, growth_mode="closed", component="total"):
    """Jitted linear-power eval (class-API path: eager dispatch costs
    ~23 ms/op on the tunneled TPU, DEVNOTES.md).

    The stateless EHEngine caches by TYPE (every Cosmology() builds a
    fresh instance -- instance keying would retrace per object);
    stateful engines (TabulatedEngine carries its table) key by identity,
    kept alive by the jitted closure.
    """
    if type(engine).__name__ == "EHEngine":
        key = ("eh", accuracy, growth_mode, component)
    else:
        key = (id(engine), accuracy, growth_mode, component)
    fn = _PLIN_JIT_CACHE.get(key)
    if fn is None:
        if len(_PLIN_JIT_CACHE) > 16:
            _PLIN_JIT_CACHE.pop(next(iter(_PLIN_JIT_CACHE)))
        kw = {} if component == "total" else {"component": component}

        # NAMED (not a lambda): the persistent-cache segfault guard in
        # tests/conftest.py blacklists cache entries by module name, and
        # this is one of the executables whose native serialization
        # crashes (three independent cold-suite deaths at the same
        # frame); "jit__lambda_" was invisible to the name filter
        def hmcode_plin_eval(bg, zs, ks):
            return engine.plin(bg, zs, ks, accuracy=accuracy,
                               growth_mode=growth_mode, **kw)

        fn = jax.jit(hmcode_plin_eval)
        _PLIN_JIT_CACHE[key] = fn
    return fn


def hmcode_power(cosmo, zs, ks, A_bary=None, version: str = "2016",
                 logT_AGN=None):
    """Nonlinear P(k,z) via HMcode for a Cosmology instance
    (HaloModel(halofit='mead') path -- reference cosmology.py:174;
    version '2015' serves the reference's 'mead2015' string).

    A_bary: Bullock concentration amplitude, the baryonic-feedback knob
    (Mead 2015 fig. 6; 3.13 = DM-only fit, lower = stronger feedback).
    Default from params['hmcode_A'].

    logT_AGN: AGN heating temperature log10(T_AGN/K) for version
    '2020_feedback' (CAMB's HMCode_logT_AGN; BAHAMAS-calibrated range
    7.6-8.0).  Default from params['hmcode_logT_AGN'] (7.8).
    """
    bg = cosmo.bg
    zs = jnp.atleast_1d(jnp.asarray(zs))
    if A_bary is None:
        A_bary = cosmo.p.get("hmcode_A", 3.13)
    if logT_AGN is None:
        logT_AGN = cosmo.p.get("hmcode_logT_AGN", 7.8)
    gm = getattr(cosmo, "growth_mode", "closed")
    plin_fn = _plin_j(cosmo.engine, cosmo.accuracy, gm)
    plin_g = plin_fn(bg, zs, jnp.asarray(_KG))
    plin = plin_fn(bg, zs, jnp.asarray(ks))
    sigma8_0 = jnp.sqrt(cosmo.get_sigma2_R(8.0 / (bg.H0 / 100.0),
                                           jnp.asarray([0.0]))[0, 0])
    plin_sig_g = None
    from .linear_power import _mnu_maybe_active
    if (_mnu_maybe_active(bg.omnu0) and version != "2015"
            and type(cosmo.engine).__name__ == "EHEngine"):
        # cold (cb) spectrum drives the sigma/nu machinery when m_nu > 0
        # (neutrinos don't cluster in halos); sigma8_0 rescaled by the
        # cb/total variance ratio on the shared _KG grid so the
        # quadrature difference vs get_sigma2_R cancels.  Trace-aware
        # gate (_mnu_maybe_active): under a traced mnu the branch
        # compiles in and the cb ratio collapses to exactly 1 at
        # mnu = 0.  NOTE: with a non-EH (tabulated) engine the sigma
        # machinery keeps the table's TOTAL power (no cb table exists)
        # while the analytic f_nu factors below still apply -- a
        # documented percent-level hybrid; supply an EH engine for the
        # full recipe.
        plin_cb_fn = _plin_j(cosmo.engine, cosmo.accuracy, gm,
                             component="cb")
        plin_sig_g = plin_cb_fn(bg, zs, jnp.asarray(_KG))
        z0 = jnp.asarray([0.0])
        d2_tot0 = (plin_fn(bg, z0, jnp.asarray(_KG))
                   * jnp.asarray(_KG)[None, :] ** 3 / (2.0 * np.pi**2))
        d2_cb0 = (plin_cb_fn(bg, z0, jnp.asarray(_KG))
                  * jnp.asarray(_KG)[None, :] ** 3 / (2.0 * np.pi**2))
        r8 = jnp.asarray(8.0 / (bg.H0 / 100.0))[None]
        s2_tot, _ = _tophat_moments(d2_tot0, r8)
        s2_cb, _ = _tophat_moments(d2_cb0, r8)
        sigma8_0 = sigma8_0 * jnp.sqrt(s2_cb[0] / s2_tot[0])
    plin_ref_g = None
    if version in ("2020", "2020_feedback"):
        # EH98 zero-baryon dewiggle template (broadband only; the
        # construction is invariant to its normalization)
        from . import linear_power as lpm
        plin_ref_g = lpm.plin_approx(bg, zs, jnp.asarray(_KG),
                                     kind="eisenhu", growth_mode=gm)
    return _hmcode_nl_j(bg, zs, jnp.asarray(ks), plin_g, plin, sigma8_0,
                        jnp.asarray(A_bary, dtype=jnp.float64),
                        growth_mode=gm, version=version,
                        plin_ref_g=plin_ref_g, plin_sig_g=plin_sig_g,
                        logT_AGN=jnp.asarray(logT_AGN, dtype=jnp.float64))
