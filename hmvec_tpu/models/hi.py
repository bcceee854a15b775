"""21 cm / neutral-hydrogen (HI) halo model (EXTENSION).

The reference (simonsobs/hmvec) has no HI machinery; this supplies the
standard post-reionization HI halo model used for intensity-mapping
forecasts (CHIME/HIRAX/SKA-era):

    M_HI(M, z) = M0 (M / Mmin)^alpha exp(-(Mmin / M)^beta_cut),

the Villaescusa-Navarro et al 2018 (VN18, eq. 13) functional form, with
the HI distributed inside halos following any registered profile u(k)
(NFW by default, concentration scatter supported).  The normalized
tracer f(M) = M_HI / rho_HI plugs into the SAME generic 1h/2h machinery
as HOD/CIB tracers (power.CIBTracer with fc = 0, fs = f: the CIB-leg
conventions -- no low-mass consistency completion -- are exactly right
here because M_HI cuts off exponentially below Mmin), so P_HIHI,
P_HI x matter, P_HI x galaxies, P_HI x y all come from the one
power_1halo/power_2halo code path.

Observables:
    Omega_HI(z) = int dm n(m, z) M_HI(m, z) / rho_crit(0),
    Tb(z)       = 188 mK * h * Omega_HI(z) * (1+z)^2 / E(z),
    P_21(k, z)  = Tb(z)^2 * P_HIHI(k, z)    [mK^2 Mpc^3].

PROVENANCE: the M_HI(M) form is VN18 eq. 13; the default (alpha, M0,
Mmin) are the widely-quoted z~0 fit values transcribed offline (alpha =
0.24, M0 = 4.3e10 h^-1 Msun, Mmin = 2.0e12 h^-1 Msun, cutoff exponent
0.35) -- every parameter is overridable, and Omega_HI in any real
forecast is renormalized to data.  The 188 mK brightness-temperature
constant is the Bull et al 2015 (eq. 1) value (literature variants
180-190 mK differ in He/spin assumptions).  No external HI oracle
exists in this environment; tests pin the mass integrals against
explicit numpy contractions and published-magnitude envelopes
(Omega_HI ~ a few 1e-4, Tb ~ 0.05-0.3 mK).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..utils.weights import trapz_weights
from .power import CIBTracer

default_hi_params = {
    "hi_alpha": 0.24,          # M_HI slope
    "hi_M0": 4.3e10 / 0.6774,  # Msun (4.3e10 h^-1 at the VN18 h)
    "hi_Mmin": 2.0e12 / 0.6774,  # Msun
    "hi_cutoff_exp": 0.35,     # exp(-(Mmin/M)^beta)
}


def m_hi(ms, params=None):
    """M_HI(M) [Msun] (VN18 eq. 13 form)."""
    p = dict(default_hi_params)
    if params:
        p.update({k: v for k, v in params.items() if k in p})
    ms = jnp.asarray(ms)
    return (p["hi_M0"] * (ms / p["hi_Mmin"]) ** p["hi_alpha"]
            * jnp.exp(-((p["hi_Mmin"] / ms) ** p["hi_cutoff_exp"])))


def rho_hi(nzm, ms, params=None):
    """Comoving HI density rho_HI(z) = int dm n M_HI  [Msun/Mpc^3]."""
    w = jnp.asarray(trapz_weights(np.asarray(ms)))
    return (jnp.asarray(nzm) * m_hi(ms, params)[None, :]) @ w


def build_hi_tracer(ms, nzm, us, params=None, us2=None):
    """Density-normalized HI tracer: fs = M_HI / rho_HI (fc = 0 -- all
    HI follows the halo profile ``us``).  Returns (tracer, rho_HI)."""
    mh = m_hi(ms, params)
    rho = rho_hi(nzm, ms, params)
    fs = mh[None, :] / rho[:, None]
    fc = jnp.zeros_like(fs)
    return CIBTracer(fc=fc, fs=fs, us=jnp.asarray(us),
                     us2=None if us2 is None else jnp.asarray(us2)), rho


def omega_hi(nzm, ms, rho_crit0, params=None):
    """Omega_HI(z) = rho_HI(z) / rho_crit(z=0)."""
    return rho_hi(nzm, ms, params) / rho_crit0


def hi_bias(nzm, bh, ms, params=None):
    """HI-weighted linear bias b_HI(z) = int n b M_HI / rho_HI."""
    w = jnp.asarray(trapz_weights(np.asarray(ms)))
    mh = m_hi(ms, params)
    num = (jnp.asarray(nzm) * jnp.asarray(bh) * mh[None, :]) @ w
    return num / rho_hi(nzm, ms, params)


def mean_brightness_temp_mk(zs, ez, om_hi, h):
    """Post-reionization mean 21 cm brightness temperature [mK]
    (Bull et al 2015 eq. 1): Tb = 188 h Omega_HI (1+z)^2 / E(z)."""
    zs = jnp.asarray(zs)
    return 188.0 * h * jnp.asarray(om_hi) * (1.0 + zs) ** 2 \
        / jnp.asarray(ez)
