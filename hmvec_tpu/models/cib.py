"""Cosmic infrared background (CIB) halo model -- Shang et al 2012 forms.

EXTENSION beyond the reference (simonsobs/hmvec has no CIB machinery):
the standard L(M, z) halo model of CIB anisotropies used by the Planck
2013 XXX analysis family,

    L_(1+z)nu(M, z) = L0 * Phi(z) * Sigma(M) * Theta((1+z) nu, T_d(z)),

with Phi(z) = (1+z)^delta redshift evolution, Sigma(M) a log-normal
luminosity-mass relation peaking at M_eff, and Theta a graybody SED
(nu^beta B_nu(T_d) below the transition frequency, a nu^-gamma power law
above, matched smoothly in log-slope; T_d = T0 (1+z)^alpha).  Centrals
sit at the halo center; satellites follow the NFW profile with their
luminosity from the subhalo mass function (mass_function.n_ln_m_sub).

Emissivity-weighted tracers plug into the SAME generic 1h/2h machinery
as HOD/pressure tracers (power.CIBTracer), so every cross-spectrum
(CIB x CIB across frequencies, CIB x galaxies, CIB x tSZ y, CIB x
matter/lensing) comes from the one power_1halo/power_2halo code path;
C_ell via the existing Limber layer with W = a/H windows
(C = int dchi a^2 P_jj' / chi^2).

Provenance: functional forms from Shang et al 2012 (MNRAS 421, 2832);
the default parameter values below are the widely-used Planck-2013-XXX-
style numbers transcribed offline (alpha 0.36, T0 24.4 K, beta 1.75,
gamma 1.7, delta 3.6, log10 Meff 12.6, sigma^2_LM 0.5).  The overall
normalization L0 is NOT physical here (defaults to 1): every published
analysis fits it to maps, so outputs are in L0-units and shapes/ratios
are the meaningful quantities.  No external CIB oracle exists in this
environment; the tests pin the implementation against an explicit-loop
numpy twin and analytic SED/limit identities.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..utils.weights import trapz_weights
from .mass_function import n_ln_m_sub

# h/k_B in K/GHz (CODATA; folded on host)
_HK_GHZ = 6.62607015e-34 / 1.380649e-23 * 1e9

default_cib_params = {
    "cib_alpha": 0.36,        # T_d(z) = T0 (1+z)^alpha
    "cib_T0": 24.4,           # K
    "cib_beta": 1.75,         # graybody emissivity index
    "cib_gamma": 1.7,         # high-frequency power-law index
    "cib_delta": 3.6,         # Phi(z) = (1+z)^delta
    "cib_log10meff": 12.6,    # peak of the L-M relation [Msun]
    "cib_var": 0.5,           # sigma^2_{L/M} (log10-mass variance)
    "cib_L0": 1.0,            # free overall normalization
    "cib_msub_min": 1e10,     # subhalo integration floor [Msun]
    "cib_nsub": 64,           # subhalo log-grid points
}


def _sed_transition_x(beta, gamma):
    """Solve x e^x/(e^x - 1) = 3 + beta + gamma for the dimensionless
    transition frequency x* = h nu0 / (k T): the point where the graybody
    log-slope equals -gamma (host-side Newton, smooth in the params)."""
    target = 3.0 + beta + gamma
    x = float(target)
    for _ in range(40):
        ex = np.exp(-x)
        f = x / (1.0 - ex) - target
        # d/dx [x/(1-e^-x)] = (1 - e^-x - x e^-x)/(1-e^-x)^2
        df = (1.0 - ex - x * ex) / (1.0 - ex) ** 2
        x -= f / df
    return x


def sed_graybody(nu_ghz, zs, params):
    """Theta(nu, z): nu^beta B_nu(T_d) below nu0(z), (nu/nu0)^-gamma
    continuation above; continuous at nu0; arbitrary normalization
    (absorbed in L0).  nu_ghz: scalar observed GHz evaluated at the
    rest-frame (1+z) nu; zs: (nz,).  Returns (nz,)."""
    beta = params["cib_beta"]
    gamma = params["cib_gamma"]
    td = params["cib_T0"] * (1.0 + jnp.asarray(zs)) ** params["cib_alpha"]
    xstar = _sed_transition_x(beta, gamma)
    nu_rest = nu_ghz * (1.0 + jnp.asarray(zs))          # GHz
    x = _HK_GHZ * nu_rest / td
    # graybody branch: nu^(beta+3)/(e^x - 1), expm1 for small-x accuracy
    grey = nu_rest ** (beta + 3.0) / jnp.expm1(x)
    nu0 = xstar * td / _HK_GHZ
    grey0 = nu0 ** (beta + 3.0) / jnp.expm1(xstar)
    plaw = grey0 * (nu_rest / nu0) ** (-gamma)
    return jnp.where(x < xstar, grey, plaw)


def sigma_lum_mass(ms, params):
    """Log-normal L-M relation Sigma(M) = M exp(-(log10 M - log10
    Meff)^2 / (2 sigma^2)) / sqrt(2 pi sigma^2) (Shang+12 eq 23)."""
    ms = jnp.asarray(ms)
    var = params["cib_var"]
    arg = (jnp.log10(ms) - params["cib_log10meff"]) ** 2 / (2.0 * var)
    return ms / jnp.sqrt(2.0 * jnp.pi * var) * jnp.exp(-arg)


def cib_luminosity(ms, zs, nu_ghz, params):
    """L_(1+z)nu(M, z) on the (nz, nm) grid, in L0 units."""
    phi = (1.0 + jnp.asarray(zs)) ** params["cib_delta"]
    theta = sed_graybody(nu_ghz, zs, params)
    return (params["cib_L0"] * (phi * theta)[:, None]
            * sigma_lum_mass(ms, params)[None, :])


def cib_satellite_luminosity(ms, zs, nu_ghz, params):
    """L_sat(M, z) = int dln m_s N(ln m_s | M) L(m_s, z) with the Tinker &
    Wetzel 2010 subhalo mass function.  Static log grid; the SHMF's
    exp(-9.9 (m_s/M)^2.5) tail self-truncates above m_s ~ M."""
    ms = np.asarray(ms)
    msub = np.geomspace(params["cib_msub_min"], ms.max(),
                        int(params["cib_nsub"]))
    w = jnp.asarray(trapz_weights(np.log(msub)))
    nsub = n_ln_m_sub(jnp.asarray(msub), jnp.asarray(ms))  # (nsub, nm)
    lsub = cib_luminosity(msub, zs, nu_ghz, params)        # (nz, nsub)
    return jnp.einsum("s,sm,zs->zm", w, nsub, lsub)


def build_cib_tracer(ms, zs, nu_ghz, us, params=None, us2=None):
    """CIBTracer (fc, fs, us) at one observed frequency [GHz].

    ``us2``: <u^2> of a concentration-scattered satellite profile (pass
    the SAME array object to every frequency built on one registered
    profile so the same-halo pair term recognizes the shared
    realization; see power._cib_square_term)."""
    from .power import CIBTracer
    p = dict(default_cib_params)
    if params:
        p.update({k: v for k, v in params.items() if k in default_cib_params})
    fc = cib_luminosity(ms, zs, nu_ghz, p) / (4.0 * jnp.pi)
    fs = cib_satellite_luminosity(ms, zs, nu_ghz, p) / (4.0 * jnp.pi)
    return CIBTracer(fc=fc, fs=fs, us=jnp.asarray(us),
                     us2=None if us2 is None else jnp.asarray(us2))


def mean_emissivity(nzm, ms, tracer):
    """jbar_nu(z) = int dm n(z,m) (fc + fs) [L0 / Mpc^3 / sr]."""
    w = jnp.asarray(trapz_weights(np.asarray(ms)))
    return jnp.sum(jnp.asarray(nzm) * (tracer.fc + tracer.fs)
                   * w[None, :], axis=-1)


def mean_intensity(zs, hzs, nzm, ms, tracer):
    """I_nu = int dchi a jbar = int dz a jbar / H  [L0 / Mpc^2 / sr]."""
    jbar = mean_emissivity(nzm, ms, tracer)
    a = 1.0 / (1.0 + jnp.asarray(zs))
    wz = jnp.asarray(trapz_weights(np.asarray(zs)))
    return (a * jbar / jnp.asarray(hzs)) @ wz
