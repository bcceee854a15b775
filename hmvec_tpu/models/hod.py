"""Halo occupation distribution (HOD) with the Behroozi SMHM relation.

Reference: hmvec/hmvec.py:357-466 and :634-731 (HOD functions adapted there
from Matt Johnson & Moritz Munchmeyer's halomodel).  Components:

  * Behroozi et al (1001.0015, Table 2) M_halo(M*), two z-regimes;
  * its inverse M*(M_halo) by dense log-grid sampling + per-z interp
    (vmapped jnp.interp instead of the reference's python z-loop,
    hmvec.py:641-645);
  * <Nc> = (1/2)(1 - erf), <Ns> power law with exponential cutoff;
  * ngal -> log10 mthresh by fixed-count vectorized bisection (replacing
    utils.vectorized_bisection_search's dynamic loop).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.scipy.special import erf

from ..ops.rootfind import invert_monotone
from ..utils.weights import trapz_weights
import numpy as np


def _behroozi_core(log10mstar, a, p):
    (Mstar00, Mstara, M1, M1a, beta0, beta_a,
     gamma0, gamma_a, delta0, delta_a) = p
    log10M1 = M1 + M1a * (a - 1.0)
    log10Mstar0 = Mstar00 + Mstara * (a - 1.0)
    beta = beta0 + beta_a * (a - 1.0)
    gamma = gamma0 + gamma_a * (a - 1.0)
    delta = delta0 + delta_a * (a - 1.0)
    d = log10mstar - log10Mstar0
    return (-0.5 + log10M1 + beta * d
            + 10.0 ** (delta * d) / (1.0 + 10.0 ** (-gamma * d)))


def Mhalo_stellar_core(log10mstellar, a, Mstar00, Mstara, M1, M1a,
                       beta0, beta_a, gamma0, gamma_a, delta0, delta_a):
    """Reference-signature Behroozi SMHM core (hmvec.py:648-656):
    log10 M_halo from log10 M* at scale factor a, with the twelve
    Behroozi 1001.0015 fit parameters passed explicitly."""
    return _behroozi_core(jnp.asarray(log10mstellar), jnp.asarray(a),
                          (Mstar00, Mstara, M1, M1a, beta0, beta_a,
                           gamma0, gamma_a, delta0, delta_a))


# Behroozi 1001.0015 Table 2 fit parameters (z<=0.8 and z>0.8 regimes)
_BEHROOZI_LOWZ = (10.72, 0.55, 12.35, 0.28, 0.44, 0.18, 1.56, 2.51, 0.57, 0.17)
_BEHROOZI_HIZ = (11.09, 0.56, 12.27, -0.84, 0.65, 0.31, 1.12, -0.53, 0.56, -0.12)


def mhalo_from_mstellar(zs, log10mstellar):
    """log10 M_halo(M*) (reference Mhalo_stellar, hmvec.py:658-695).

    zs: (nz,) or (nz,1); log10mstellar: broadcastable to (nz, n)."""
    zs = jnp.asarray(zs)
    zcol = zs.reshape(-1, 1)
    a = 1.0 / (1.0 + zcol)
    ms = jnp.broadcast_to(jnp.asarray(log10mstellar),
                          (zcol.shape[0], jnp.shape(log10mstellar)[-1]))
    low = _behroozi_core(ms, a, _BEHROOZI_LOWZ)
    high = _behroozi_core(ms, a, _BEHROOZI_HIZ)
    return jnp.where(zcol <= 0.8, low, high)


_MSTAR_GRID = np.linspace(-18.0, 18.0, 4000)


def mstellar_from_mhalo(zs, log10mhalo):
    """log10 M*(M_halo): invert Behroozi on a dense grid (hmvec.py:634-646)."""
    grid = jnp.asarray(_MSTAR_GRID)
    mh = mhalo_from_mstellar(zs, grid[None, :])       # (nz, ngrid)
    mhal = jnp.broadcast_to(jnp.asarray(log10mhalo).reshape(1, -1),
                            (mh.shape[0], jnp.shape(log10mhalo)[-1]))

    def one_z(mh_row, mhal_row):
        return jnp.interp(mhal_row, mh_row, grid)

    return jax.vmap(one_z)(mh, mhal)


def avg_nc(log10mhalo, zs, log10mstellar_thresh, sig_log_mstellar):
    """<Nc(m)> (hmvec.py:698-703)."""
    log10mstar = mstellar_from_mhalo(zs, log10mhalo)
    num = jnp.asarray(log10mstellar_thresh) - log10mstar
    denom = jnp.sqrt(2.0) * sig_log_mstellar
    return 0.5 * (1.0 - erf(num / denom))


def _default_mfunc(mthresh, Bamp, Bind):
    """10^12 B 10^((mthresh-12) beta) (hmvec.py:706)."""
    return 10.0**12 * Bamp * 10.0 ** ((mthresh - 12.0) * Bind)


def avg_ns(log10mhalo, zs, log10mstellar_thresh, Nc, hod_params,
           Msat_override=None, Mcut_override=None):
    """<Ns(m)> (hmvec.py:708-716)."""
    mthresh = mhalo_from_mstellar(zs, jnp.asarray(log10mstellar_thresh))
    Msat = (Msat_override if Msat_override is not None
            else _default_mfunc(mthresh, hod_params["hod_Bsat"],
                                hod_params["hod_betasat"]))
    Mcut = (Mcut_override if Mcut_override is not None
            else _default_mfunc(mthresh, hod_params["hod_Bcut"],
                                hod_params["hod_betacut"]))
    masses = 10.0 ** jnp.asarray(log10mhalo)
    return (Nc * (masses / Msat) ** hod_params["hod_alphasat"]
            * jnp.exp(-Mcut / masses))


def avg_nsnsm1(Nc, Ns, corr="max"):
    """<Ns(Ns-1)> (hmvec.py:719-725)."""
    if corr == "max":
        return jnp.where(jnp.isclose(Nc, 0.0), 0.0,
                         Ns**2 / jnp.where(jnp.isclose(Nc, 0.0), 1.0, Nc))
    if corr == "min":
        return Ns**2
    raise ValueError(corr)


def avg_ncns(Nc, Ns, corr="max"):
    """<Nc Ns> (hmvec.py:727-731)."""
    if corr == "max":
        return Ns
    if corr == "min":
        return Ns * Nc
    raise ValueError(corr)


# hmvec-compatible aliases where signatures match (hmvec.py:634,:658,:698)
Mstellar_halo = mstellar_from_mhalo
Mhalo_stellar = mhalo_from_mstellar
avg_Nc = avg_nc
avg_NsNsm1 = avg_nsnsm1
avg_NcNs = avg_ncns
hod_default_mfunc = _default_mfunc


def avg_Ns(log10mhalo, z, log10mstellar_thresh, Nc=None,
           sig_log_mstellar=None, alphasat=None, Bsat=None, betasat=None,
           Bcut=None, betacut=None, Msat_override=None, Mcut_override=None):
    """<Ns(m)> with the reference's flat-kwarg signature (hmvec.py:708)."""
    if Nc is None:
        Nc = avg_nc(log10mhalo, z, log10mstellar_thresh, sig_log_mstellar)
    hp = {"hod_alphasat": alphasat, "hod_Bsat": Bsat,
          "hod_betasat": betasat, "hod_Bcut": Bcut, "hod_betacut": betacut}
    return avg_ns(log10mhalo, z, log10mstellar_thresh, Nc, hp,
                  Msat_override=Msat_override, Mcut_override=Mcut_override)


def avg_nc_zheng05(log10mhalo, log10mmin, siglogm):
    """Zheng et al 2005/2007 central occupation
    <Nc> = (1/2)[1 + erf((log10 M - log10 Mmin)/sigma_logM)].

    EXTENSION beyond the reference (which ships only the
    Behroozi-threshold HOD): the standard five-parameter HOD used by
    most clustering analyses (Zheng+2005 eq. 1-3 / Zheng+2007 eq. 1-5).
    """
    return 0.5 * (1.0 + erf((log10mhalo - log10mmin) / siglogm))


def avg_ns_zheng05(masses, Nc, m0, m1, alpha):
    """Zheng-05 satellite occupation <Ns> = Nc ((M - M0)/M1')^alpha for
    M > M0, else 0 (double-where keeps the grad finite at the cutoff
    for non-integer alpha)."""
    pos = masses > m0
    frac = jnp.where(pos, (masses - m0) / m1, 1.0)
    return jnp.where(pos, Nc * frac**alpha, 0.0)


def build_hod_zheng05(zs, ms, nzm, bh, hod_params, ngal=None, corr="max"):
    """Zheng-05 HOD grid on (zs, ms); if ``ngal`` (nz,) is given, solve
    log10 Mmin for it by the same fixed-count bisection as the
    Behroozi-threshold family (sigma_logM, M0, M1, alpha held fixed).

    Returns an HODGrid (log10mthresh carries log10 Mmin), so every
    downstream consumer (power spectra, bg, kSZ) is family-agnostic.
    """
    w = trapz_weights(np.asarray(ms))      # static, before any tracing
    zs = jnp.asarray(zs)
    ms = jnp.asarray(ms)
    log10mhalo = jnp.log10(ms)[None, :]
    masses = 10.0 ** log10mhalo
    wj = jnp.asarray(w)
    sig = hod_params["hod_zheng_siglogm"]
    m0 = 10.0 ** jnp.asarray(hod_params["hod_zheng_log10M0"])
    m1 = 10.0 ** jnp.asarray(hod_params["hod_zheng_log10M1"])
    alpha = hod_params["hod_zheng_alpha"]

    def grid_at(log10mmin):
        Nc = avg_nc_zheng05(log10mhalo, log10mmin, sig)
        Ns = avg_ns_zheng05(masses, Nc, m0, m1, alpha)
        return Nc, Ns

    if ngal is not None:
        def nfunc(log10mmin):
            Nc, Ns = grid_at(log10mmin[:, None])
            return (nzm * (Nc + Ns)) @ wj

        # NOTE the bracket is in HALO mass (log10 Mmin), not the
        # Leauthaud family's stellar-mass threshold -- clusters reach
        # log10 M ~ 15.5, so the shared [7, 14] bracket would clip
        log10mmin = invert_monotone(
            nfunc, jnp.asarray(ngal),
            hod_params.get("hod_zheng_bisection_lo", 9.0),
            hod_params.get("hod_zheng_bisection_hi", 16.5),
            num_iter=hod_params["hod_bisection_num_iter"],
            increasing=False)
        thresh = log10mmin[:, None]
    else:
        thresh = (jnp.asarray(hod_params["hod_zheng_log10Mmin"])
                  + jnp.zeros((zs.shape[0], 1)))

    Nc, Ns = grid_at(thresh)
    NsNsm1 = avg_nsnsm1(Nc, Ns, corr)
    NcNs = avg_ncns(Nc, Ns, corr)
    ngal_out = (nzm * (Nc + Ns)) @ wj
    bg = ((nzm * (Nc + Ns) * bh) @ wj) / ngal_out
    return HODGrid(Nc=Nc, Ns=Ns, NsNsm1=NsNsm1, NcNs=NcNs,
                   ngal=ngal_out, bg=bg, log10mthresh=thresh)


class HODGrid(NamedTuple):
    Nc: jnp.ndarray
    Ns: jnp.ndarray
    NsNsm1: jnp.ndarray
    NcNs: jnp.ndarray
    ngal: jnp.ndarray
    bg: jnp.ndarray
    log10mthresh: jnp.ndarray


def _nc_ns_precomp(log10mstar, masses, zs, thresh, hod_params,
                   Msat_override=None, Mcut_override=None):
    """<Nc>, <Ns> given the precomputed Behroozi inversion log10mstar =
    M*(M_halo) and masses = 10**log10mhalo on the (z, m) grid.

    The grid inversion (mstellar_from_mhalo: a (nz, 4000)-point Behroozi
    sweep + interp) depends only on the *mass grid*, not on the threshold
    being solved -- hoisting it out of the 90-iteration ngal bisection is
    the difference between 91 and 1 evaluations.  Bit-identical to
    avg_nc/avg_ns (same ops, same order)."""
    num = thresh - log10mstar
    denom = jnp.sqrt(2.0) * hod_params["hod_sig_log_mstellar"]
    Nc = 0.5 * (1.0 - erf(num / denom))
    mthresh_halo = mhalo_from_mstellar(zs, jnp.asarray(thresh))
    Msat = (Msat_override if Msat_override is not None
            else _default_mfunc(mthresh_halo, hod_params["hod_Bsat"],
                                hod_params["hod_betasat"]))
    Mcut = (Mcut_override if Mcut_override is not None
            else _default_mfunc(mthresh_halo, hod_params["hod_Bcut"],
                                hod_params["hod_betacut"]))
    Ns = (Nc * (masses / Msat) ** hod_params["hod_alphasat"]
          * jnp.exp(-Mcut / masses))
    return Nc, Ns


def ngal_from_mthresh(log10mthresh, zs, nzm, ms, hod_params,
                      Msat_override=None, Mcut_override=None, weights=None):
    """n_gal(z) = int dm n(z,m) (Nc+Ns) (hmvec.py:936-957).

    ``weights``: optional precomputed trapz weights for the (static) mass
    grid; required when ms is a traced array (inside jit)."""
    log10mhalo = jnp.log10(jnp.asarray(ms))[None, :]
    thresh = jnp.asarray(log10mthresh)[:, None]
    Nc = avg_nc(log10mhalo, zs, thresh, hod_params["hod_sig_log_mstellar"])
    Ns = avg_ns(log10mhalo, zs, thresh, Nc, hod_params,
                Msat_override, Mcut_override)
    if weights is None:
        weights = trapz_weights(np.asarray(ms))
    return (nzm * (Nc + Ns)) @ jnp.asarray(weights)


def build_hod(zs, ms, nzm, bh, hod_params, mthresh=None, ngal=None,
              corr="max", Msat_override=None, Mcut_override=None):
    """Construct the HOD grid; solve ngal -> mthresh if needed
    (reference add_hod, hmvec.py:357-460).  ``ms`` must be a static
    (numpy-convertible) grid -- the quadrature weights are host-side."""
    w = trapz_weights(np.asarray(ms))  # static, before any tracing
    zs = jnp.asarray(zs)
    ms = jnp.asarray(ms)
    log10mhalo = jnp.log10(ms)[None, :]
    # threshold-independent precomputation (hoisted out of the bisection)
    log10mstar = mstellar_from_mhalo(zs, log10mhalo)
    masses = 10.0 ** log10mhalo
    wj = jnp.asarray(w)
    if ngal is not None:
        def nfunc(log10mthresh):
            Nc, Ns = _nc_ns_precomp(log10mstar, masses, zs,
                                    log10mthresh[:, None], hod_params,
                                    Msat_override, Mcut_override)
            return (nzm * (Nc + Ns)) @ wj

        log10mthresh = invert_monotone(
            nfunc, jnp.asarray(ngal),
            hod_params["hod_bisection_search_min_log10mthresh"],
            hod_params["hod_bisection_search_max_log10mthresh"],
            num_iter=hod_params["hod_bisection_num_iter"],
            increasing=False)
        mthresh = 10.0 ** (log10mthresh * hod_params["hod_A_log10mthresh"])
    mthresh = jnp.asarray(mthresh)

    thresh = jnp.log10(mthresh)[:, None]
    Nc, Ns = _nc_ns_precomp(log10mstar, masses, zs, thresh, hod_params,
                            Msat_override, Mcut_override)
    NsNsm1 = avg_nsnsm1(Nc, Ns, corr)
    NcNs = avg_ncns(Nc, Ns, corr)

    ngal_out = (nzm * (Nc + Ns)) @ wj
    bg = ((nzm * (Nc + Ns) * bh) @ wj) / ngal_out
    return HODGrid(Nc=Nc, Ns=Ns, NsNsm1=NsNsm1, NcNs=NcNs,
                   ngal=ngal_out, bg=bg, log10mthresh=thresh)
