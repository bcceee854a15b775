"""Halofit nonlinear matter power: the CAMB halofit_version family.

The reference obtains nonlinear P(k,z) from CAMB's halofit with a
``halofit_version`` string ('mead' default, hmvec/cosmology.py:174, used
for nPzk at hmvec.py:102; bin/test_halofit.py:5 sweeps
['takahashi','original','bird','peacock','mead','casarini','mead2015']).
No Boltzmann code exists in this environment, so this module implements
the fits natively in jnp: engine-free, jit- and grad-compatible, O(nz)
fixed-count bisection for the nonlinear scale plus closed-form spectral
moments (sigma^2, n_eff, curvature) as weighted reductions on a static
ln k grid.

Versions here:

* 'takahashi' (arXiv:1208.2701, Eqs A4-A13), with the CAMB-style
  massive-neutrino corrections when f_nu > 0 (beta_n += f_nu
  (1.081 + 0.395 n^2), quasi-linear input boost 26.3 f_nu k_h^2 /
  (1 + 1.5 k_h^2), one-halo x (1 + 0.977 f_nu)).
* 'original' (Smith et al 2003, MNRAS 341, 1311, App C with the
  CAMB-style open/Lambda f_i interpolation).  When f_nu > 0 it carries
  the Bird massive-neutrino terms, as CAMB's whole Smith-2003 branch
  does (they vanish identically at f_nu = 0).
* 'bird' (Bird, Viel & Haehnelt 2012, arXiv:1109.4416, App A): the
  Smith fit with a refitted gamma_n (+0.3159 - 0.0765 n - 0.8350 C)
  and massive-neutrino terms (beta_n += f_nu (-6.4868 + 1.4373 n^2),
  quasi-linear boost 47.48 f_nu k_h^2 / (1 + 1.5 k_h^2), one-halo
  x (1 + f_nu (0.977 - 18.015 (Omega_m0 - 0.3)))).
* 'peacock' (the roe.ac.uk/~jap/haloes adjustment, as in CAMB): the
  'original' prediction remapped so the nonlinear excess
  P_nl - P_lin is scaled by (1 + 2 y^2)/(1 + y^2), y = k_h/10.
* 'casarini' (PKequal, arXiv:0810.0190 + 1601.07230): 'takahashi'
  evaluated, per redshift, in the equivalent constant-w cosmology
  (see casarini_weff) -- identical to 'takahashi' when wa = 0.

'mead' / 'mead2015' / 'mead2020' / 'mead2020_feedback' live in models/hmcode.py.  All
halofit versions here share the
quasi-linear + halo-term structure; only the fitted coefficient
polynomials in (n_eff, C) and the f_i(Omega) exponents differ.
Coefficients transcribed from the published papers; the Takahashi set
is pinned against an independent scipy-quad twin oracle and golden
values (tests/test_halofit.py), the Smith set against the same twin
machinery plus structural anchors (Takahashi>original at k ~ 1-10 at
z = 0, the published direction of the revision); the bird/peacock
variants are twin-pinned the same way plus limiting-case checks
(peacock -> original at k << 10 h/Mpc; bird(f_nu=0) differs from
original only through gamma_n).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.weights import trapz_weights

# static ln-k grid for the Gaussian-window spectral moments
_KG = np.geomspace(1e-4, 1e3, 1536)
_LNW = trapz_weights(np.log(_KG))


def _moments(delta2_lin_g, R):
    """sigma^2_G(R) and its first two lnR-derivatives (closed forms).

    delta2_lin_g: (nz, nkg) dimensionless linear power on the static grid.
    R: (nz,).  Returns (sig2, dlns_dlnR, d2lns_dlnR2), each (nz,).
    """
    kg = jnp.asarray(_KG)
    w = jnp.asarray(_LNW)
    x2 = (kg[None, :] * R[:, None]) ** 2
    e = jnp.exp(-x2)
    s2 = (delta2_lin_g * e) @ w
    # d sigma^2/dlnR = int D2 e^{-x2} (-2 x2); d2: int D2 e^{-x2} (4x2^2-4x2)
    d1 = (delta2_lin_g * e * (-2.0 * x2)) @ w
    d2 = (delta2_lin_g * e * (4.0 * x2**2 - 4.0 * x2)) @ w
    dln1 = d1 / s2
    dln2 = d2 / s2 - dln1**2
    return s2, dln1, dln2


def _coeffs_takahashi(n, C, omz, omde_w, omde):
    """Takahashi 2012 Eqs (A6-A13)."""
    del omde
    log10_an = (1.5222 + 2.8553 * n + 2.3706 * n**2 + 0.9903 * n**3
                + 0.2250 * n**4 - 0.6038 * C + 0.1749 * omde_w)
    log10_bn = (-0.5642 + 0.5864 * n + 0.5716 * n**2 - 1.5474 * C
                + 0.2279 * omde_w)
    log10_cn = 0.3698 + 2.0404 * n + 0.8161 * n**2 + 0.5869 * C
    gamma_n = 0.1971 - 0.0843 * n + 0.8460 * C
    alpha_n = jnp.abs(6.0835 + 1.3373 * n - 0.1959 * n**2 - 5.5274 * C)
    beta_n = (2.0379 - 0.7354 * n + 0.3157 * n**2 + 1.2490 * n**3
              + 0.3980 * n**4 - 0.1682 * C)
    mu_n = jnp.zeros_like(n)
    nu_n = 10.0 ** (5.2105 + 3.6902 * n)
    f1 = omz**-0.0307
    f2 = omz**-0.0585
    f3 = omz**0.0743
    return (10.0**log10_an, 10.0**log10_bn, 10.0**log10_cn, gamma_n,
            alpha_n, beta_n, mu_n, nu_n, f1, f2, f3)


def _coeffs_original(n, C, omz, omde_w, omde):
    """Smith et al 2003 App C (C9-C16), with the CAMB-style interpolation
    between the flat-Lambda and open f_i(Omega) fits by the dark-energy
    share frac = Omega_de / (1 - Omega_m)."""
    del omde_w
    an = 10.0 ** (1.4861 + 1.8369 * n + 1.6762 * n**2 + 0.7940 * n**3
                  + 0.1670 * n**4 - 0.6206 * C)
    bn = 10.0 ** (0.9463 + 0.9466 * n + 0.3084 * n**2 - 0.9400 * C)
    cn = 10.0 ** (-0.2807 + 0.6669 * n + 0.3214 * n**2 - 0.0793 * C)
    gamma_n = 0.8649 + 0.2989 * n + 0.1631 * C
    alpha_n = 1.3884 + 0.3700 * n - 0.1452 * n**2
    beta_n = 0.8291 + 0.9854 * n + 0.3401 * n**2
    mu_n = 10.0 ** (-3.5442 + 0.1908 * n)
    nu_n = 10.0 ** (0.9589 + 1.2857 * n)
    # f_i: Lambda fits (C9) vs open fits (C10), blended by the DE share;
    # the omz ~ 1 (matter-only) limit makes both sets 1 so the guarded
    # denominator never matters in the output
    frac = omde / jnp.maximum(1.0 - omz, 1e-8)
    f1 = frac * omz**-0.0307 + (1.0 - frac) * omz**-0.0732
    f2 = frac * omz**-0.0585 + (1.0 - frac) * omz**-0.1423
    f3 = frac * omz**0.0743 + (1.0 - frac) * omz**0.0725
    return an, bn, cn, gamma_n, alpha_n, beta_n, mu_n, nu_n, f1, f2, f3


def _coeffs_bird(n, C, omz, omde_w, omde):
    """Bird et al 2012 (arXiv:1109.4416 App A): the Smith-2003 fit with
    the refitted gamma_n of their Eq (A3).  The massive-neutrino terms
    (beta_n shift, quasi-linear boost, one-halo factor) are applied in
    halofit_nonlinear since they need f_nu and k."""
    (an, bn, cn, gamma_n, alpha_n, beta_n, mu_n, nu_n,
     f1, f2, f3) = _coeffs_original(n, C, omz, omde_w, omde)
    gamma_n = gamma_n + (0.3159 - 0.0765 * n - 0.8350 * C)
    return an, bn, cn, gamma_n, alpha_n, beta_n, mu_n, nu_n, f1, f2, f3


_COEFFS = {"takahashi": _coeffs_takahashi, "original": _coeffs_original,
           "bird": _coeffs_bird, "peacock": _coeffs_original}

# quasi-linear massive-neutrino boost coefficient (CAMB convention):
# plin -> plin * (1 + c * f_nu * k_h^2 / (1 + 1.5 k_h^2)) inside the
# quasi-linear term only.  CAMB applies the Bird f_nu terms throughout
# its Smith-2003 branch, so 'original' and 'peacock' carry them too
# (all terms vanish identically at f_nu = 0).
_FNU_QL = {"takahashi": 26.3, "bird": 47.48, "original": 47.48,
           "peacock": 47.48}


def halofit_nonlinear(plin_fn, zs, ks, omz, omde_w, num_iter: int = 60,
                      version: str = "takahashi", omde=None,
                      fnu=0.0, omm0=None, h: float = 1.0):
    """Nonlinear P(k,z) from a callable plin_fn(ks)->(nz,nk).

    omz: Omega_m(z) (nz,); omde_w: Omega_de(z)*(1+w) (nz,); omde:
    Omega_de(z) (nz,), needed by 'original' (defaults to 1 - omz, exact
    for flat w = -1).  fnu: Omega_nu/Omega_m today (massive-neutrino
    corrections, 'takahashi'/'bird' only); omm0: total Omega_m today
    (bird's one-halo factor); h: H0/100 (the Bird/Peacock k-dependent
    factors are fits in k [h/Mpc] while ks here is in 1/Mpc).
    """
    if version not in _COEFFS:
        raise ValueError(
            f"halofit version {version!r}: supported here are "
            f"{sorted(_COEFFS)} + 'casarini' via halofit_power "
            f"(plus 'mead'/'mead2015'/'mead2020'/'mead2020_feedback' "
            f"via models/hmcode.py)")
    zs = jnp.atleast_1d(jnp.asarray(zs))
    ks = jnp.asarray(ks)
    kg = jnp.asarray(_KG)

    plin_g = plin_fn(kg)                                # (nz, nkg)
    delta2_g = plin_g * kg[None, :] ** 3 / (2.0 * jnp.pi**2)

    # solve sigma^2_G(R) = 1 by bisection in ln R
    lo = jnp.full((zs.size,), jnp.log(1e-4))
    hi = jnp.full((zs.size,), jnp.log(1e3))

    def body(_, carry):
        lo, hi = carry
        mid = (lo + hi) / 2.0
        s2, _, _ = _moments(delta2_g, jnp.exp(mid))
        # sigma^2 decreasing in R: s2 > 1 means R too small -> move right
        go_right = s2 > 1.0
        return jnp.where(go_right, mid, lo), jnp.where(go_right, hi, mid)

    lo, hi = jax.lax.fori_loop(0, num_iter, body, (lo, hi))
    Rsig = jnp.exp((lo + hi) / 2.0)
    ksig = 1.0 / Rsig

    _, dln1, dln2 = _moments(delta2_g, Rsig)
    neff = -3.0 - dln1
    C = -dln2

    if omde is None:
        omde = 1.0 - omz
    (an, bn, cn, gamma_n, alpha_n, beta_n, mu_n, nu_n,
     f1, f2, f3) = _COEFFS[version](neff, C, omz, omde_w, omde)

    # massive-neutrino corrections (CAMB halofit conventions; fits in
    # k_h = k/h [h/Mpc]).  beta shift: Takahashi's refit vs the Bird
    # form shared by the whole Smith-2003 branch.
    kh = ks / h
    if version == "takahashi":
        beta_n = beta_n + fnu * (1.081 + 0.395 * neff**2)
    else:
        beta_n = beta_n + fnu * (-6.4868 + 1.4373 * neff**2)

    plin = plin_fn(ks)                                  # (nz, nk)
    delta2_lin = plin * ks[None, :] ** 3 / (2.0 * jnp.pi**2)
    y = ks[None, :] / ksig[:, None]
    fy = y / 4.0 + y**2 / 8.0

    c1 = lambda v: v[:, None]
    d2_ql = delta2_lin
    if version in _FNU_QL:
        d2_ql = delta2_lin * (1.0 + fnu * _FNU_QL[version] * kh[None, :]**2
                              / (1.0 + 1.5 * kh[None, :]**2))
    delta2_q = (delta2_lin * ((1.0 + d2_ql) ** c1(beta_n)
                              / (1.0 + c1(alpha_n) * d2_ql))
                * jnp.exp(-fy))
    delta2_hp = (c1(an) * y ** (3.0 * c1(f1))
                 / (1.0 + c1(bn) * y ** c1(f2)
                    + (c1(cn) * c1(f3) * y) ** (3.0 - c1(gamma_n))))
    delta2_h = delta2_hp / (1.0 + c1(mu_n) / y + c1(nu_n) / y**2)
    if version == "takahashi":
        delta2_h = delta2_h * (1.0 + 0.977 * fnu)
    elif omm0 is not None:
        delta2_h = delta2_h * (1.0 + fnu * (0.977 - 18.015 * (omm0 - 0.3)))
    elif not (isinstance(fnu, (int, float)) and fnu == 0.0):
        raise ValueError(
            "halofit Smith-branch versions need omm0 (total Omega_m "
            "today) for the massive-neutrino one-halo factor when "
            "fnu != 0; pass omm0= (halofit_power does this "
            "automatically)")

    delta2_nl = delta2_q + delta2_h
    pnl = delta2_nl * (2.0 * jnp.pi**2) / ks[None, :] ** 3

    if version == "peacock":
        # nonlinear excess scaled by (1 + 2y^2)/(1 + y^2), y = k_h/10
        yp = (kh / 10.0)[None, :]
        pnl = plin + (pnl - plin) * (1.0 + 2.0 * yp**2) / (1.0 + yp**2)
    return pnl


def casarini_weff(bg, zs, z_dec: float = 1100.0, nq: int = 1024,
                  num_iter: int = 60):
    """Equivalent constant w per redshift (Casarini et al PKequal).

    For each z, solves for the constant-w cosmology (same densities)
    whose comoving distance from z to decoupling matches the dynamic
    (w0, wa) model's -- the spectral-equivalence criterion of
    arXiv:0810.0190 / 1601.07230 (the sigma8(z) matching half of the
    criterion is automatic here because the dynamic model's own linear
    power, with its own growth, feeds halofit directly).  Returns (nz,).
    Fixed-count bisection in w; both sides share one quadrature grid so
    grid error mostly cancels in the match (residual ~1e-6 in w at
    nq = 1024 vs the adaptive-quad twin).  Exactly w0 when wa = 0.
    """
    zs = jnp.atleast_1d(jnp.asarray(zs))
    t = jnp.linspace(0.0, 1.0, nq)
    la0 = jnp.log1p(zs)[:, None]                        # (nz, 1)
    dla = (jnp.log(1.0 + z_dec) - la0)                  # (nz, 1)
    la = la0 + dla * t[None, :]                         # (nz, nq)
    zp1 = jnp.exp(la)
    # trapz in ln(1+z'); dz' = (1+z') dln(1+z')
    wq = jnp.full((nq,), 1.0).at[0].set(0.5).at[-1].set(0.5)
    wq = wq[None, :] * (dla / (nq - 1.0))               # (nz, nq)
    base = (bg.omr0 * zp1**4 + (bg.omm0 + bg.omnu0) * zp1**3
            + bg.omk0 * zp1**2)
    de_dyn = bg.oml0 * zp1 ** (3.0 * (1.0 + bg.w0 + bg.wa)) * jnp.exp(
        -3.0 * bg.wa * (1.0 - 1.0 / zp1))
    target = jnp.sum(wq * zp1 / jnp.sqrt(base + de_dyn), axis=1)

    def dist(w):                                        # w: (nz,)
        de = bg.oml0 * zp1 ** (3.0 * (1.0 + w[:, None]))
        return jnp.sum(wq * zp1 / jnp.sqrt(base + de), axis=1)

    # distance is monotone decreasing in w (larger w -> more DE in the
    # past -> larger E -> shorter distance).  Bracket covers the full
    # physical CPL range w(z) in [w0, w0+wa] for any sane input -- a
    # too-narrow bracket would silently clamp w_eff to an edge.
    lo = jnp.full((zs.size,), -10.0)
    hi = jnp.full((zs.size,), -0.01)

    def body(_, carry):
        lo, hi = carry
        mid = (lo + hi) / 2.0
        too_neg = dist(mid) > target
        return jnp.where(too_neg, mid, lo), jnp.where(too_neg, hi, mid)

    lo, hi = jax.lax.fori_loop(0, num_iter, body, (lo, hi))
    return (lo + hi) / 2.0


def halofit_power(cosmo, zs, ks, version: str = "takahashi"):
    """Nonlinear P(k,z) for a Cosmology instance (engine-free path for
    HaloModel(halofit=...)).  Versions: 'takahashi', 'original', 'bird',
    'peacock', 'casarini' (reference bin/test_halofit.py:5)."""
    from . import background as bgmod
    bg = cosmo.bg
    zs = jnp.atleast_1d(jnp.asarray(zs))

    def plin_fn(kq):
        return cosmo.engine.plin(bg, zs, kq, accuracy=cosmo.accuracy,
                                 growth_mode=getattr(cosmo, "growth_mode",
                                                     "closed"))

    omz = bgmod.omz(bg, zs)
    # Omega_de(z) (1+w(z)) with the w0-wa parametrization
    e2 = bgmod.e_of_z(bg, zs) ** 2
    zp1 = 1.0 + zs
    de = zp1 ** (3.0 * (1.0 + bg.w0 + bg.wa)) * jnp.exp(
        -3.0 * bg.wa * (1.0 - 1.0 / zp1))
    omde = bg.oml0 * de / e2
    if version == "casarini":
        # takahashi in the per-z equivalent constant-w model: only the
        # (1 + w) factor in the fitted coefficients changes (the density
        # history stays the dynamic model's, as in CAMB's PKequal use)
        wz = casarini_weff(bg, zs)
        version = "takahashi"
    else:
        wz = bg.w0 + bg.wa * (1.0 - 1.0 / zp1)
    omm0_tot = bg.omm0 + bg.omnu0
    fnu = bg.omnu0 / omm0_tot
    return halofit_nonlinear(plin_fn, zs, jnp.asarray(ks), omz,
                             omde * (1.0 + wz), version=version,
                             omde=omde, fnu=fnu, omm0=omm0_tot,
                             h=bg.H0 / 100.0)
