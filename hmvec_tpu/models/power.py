"""1-halo / 2-halo power spectrum assembly.

Reference: hmvec/hmvec.py:500-572.  Mass integrals are static-weight
contractions over the m axis: einsum('zmk,m->zk') -- the natural target for
m-axis sharding (see hmvec_tpu.parallel).

Tracers are small pytrees:
  MatterTracer(uk)                         -- normalized profile u(k|z,m)
  PressureTracer(pk)                       -- pressure profile (y units)
  HODTracer(Nc, Ns, NsNsm1, NcNs, ngal, bg, uc, us)

The 2-halo term applies the low-k consistency subtraction so that
P2h -> b1 b2 P_lin as k -> 0 (reference hmvec.py:566-572), and the 1-halo
term is damped below k* (hmvec.py:526).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from ..utils.weights import trapz_weights


class MatterTracer(NamedTuple):
    uk: jnp.ndarray  # (nz, nm, nk)


class PressureTracer(NamedTuple):
    pk: jnp.ndarray  # (nz, nm, nk)


class HODTracer(NamedTuple):
    Nc: jnp.ndarray       # (nz, nm)
    Ns: jnp.ndarray       # (nz, nm)
    NsNsm1: jnp.ndarray   # (nz, nm)
    NcNs: jnp.ndarray     # (nz, nm)
    ngal: jnp.ndarray     # (nz,)
    bg: jnp.ndarray       # (nz,)
    us: jnp.ndarray       # (nz, nm, nk) satellite profile
    uc: Optional[jnp.ndarray] = None  # central profile (None -> 1)


def _mass_weights(ms):
    return jnp.asarray(trapz_weights(np.asarray(ms)))


def _mass_integral(integrand, ms):
    """int dm integrand(z,m,k) -> (z,k) with static trapz weights.

    Written as multiply + axis-sum rather than einsum/dot_general: on TPU
    the emulated f64 dot path runs ~4.5x slower than a plain VPU reduction
    for this (z,m,k)x(m) contraction shape.
    """
    w = _mass_weights(ms)
    return (integrand * w[None, :, None]).sum(axis=-2)


def _hod_square_term(t: HODTracer):
    """(2 uc us <NcNs> + <Ns(Ns-1)> us^2)/ngal^2 (hmvec.py:477-479)."""
    uc = 1.0 if t.uc is None else t.uc
    return ((2.0 * uc * t.us * t.NcNs[..., None]
             + t.NsNsm1[..., None] * t.us**2)
            / t.ngal[..., None, None] ** 2)


def _hod_term(t: HODTracer, lowklim=False):
    """(uc <Nc> + us <Ns>)/ngal (hmvec.py:481-486)."""
    uc = 1.0 if t.uc is None else t.uc
    us = t.us
    if lowklim:
        uc, us = 1.0, 1.0
    return (uc * t.Nc[..., None] + us * t.Ns[..., None]) / t.ngal[..., None, None]


def _matter_term(t: MatterTracer, ms, rho_matter0, lowklim=False):
    """m u(k)/rho_m0 (hmvec.py:488-492)."""
    uk = 1.0 if lowklim else t.uk
    return jnp.asarray(ms)[None, :, None] * uk / rho_matter0


def _pressure_term(t: PressureTracer, lowklim=False):
    if lowklim:
        return jnp.broadcast_to(t.pk[:, :, :1], t.pk.shape)
    return t.pk


def _term(tracer, ms, rho_matter0, lowklim=False):
    if isinstance(tracer, HODTracer):
        return _hod_term(tracer, lowklim)
    if isinstance(tracer, MatterTracer):
        return _matter_term(tracer, ms, rho_matter0, lowklim)
    if isinstance(tracer, PressureTracer):
        return _pressure_term(tracer, lowklim)
    raise TypeError(type(tracer))


def power_1halo(tracer1, tracer2, nzm, ms, ks, rho_matter0,
                kstar_damping=0.01):
    """P_1h(z,k) (reference: hmvec.py:504-526)."""
    if isinstance(tracer1, HODTracer) and isinstance(tracer2, HODTracer):
        square = _hod_square_term(tracer1)
    elif isinstance(tracer1, PressureTracer) and isinstance(tracer2, PressureTracer):
        square = _pressure_term(tracer1) ** 2
    else:
        square = _term(tracer1, ms, rho_matter0) * _term(tracer2, ms, rho_matter0)
    integral = _mass_integral(nzm[..., None] * square, ms)
    damping = 1.0 - jnp.exp(-((jnp.asarray(ks) / kstar_damping) ** 2))
    return integral * damping[None, :]


def _leg(tracer, nzm, bh, ms, rho_matter0):
    """(integral, consistency, b) for one 2-halo leg (hmvec.py:531-551)."""
    term = _term(tracer, ms, rho_matter0)
    weighted = nzm[..., None] * bh[..., None]
    integral = _mass_integral(weighted * term, ms)
    if isinstance(tracer, PressureTracer):
        # reference sets b = rterm01 = 0 for pressure legs (hmvec.py:545)
        consistency = jnp.zeros_like(integral)
        b = 0.0
    else:
        term0 = _term(tracer, ms, rho_matter0, lowklim=True)
        consistency = _mass_integral(weighted * term0, ms)
        b = (tracer.bg[:, None] if isinstance(tracer, HODTracer) else 1.0)
    return integral, consistency, b


def power_2halo(tracer1, tracer2, nzm, bh, ms, pzk_lin, rho_matter0,
                b1_in=None, b2_in=None):
    """P_2h(z,k) with the low-k consistency subtraction (hmvec.py:528-572)."""
    i1, c1, b1 = _leg(tracer1, nzm, bh, ms, rho_matter0)
    i2, c2, b2 = _leg(tracer2, nzm, bh, ms, rho_matter0)
    if b1_in is not None:
        b1 = jnp.asarray(b1_in).reshape(-1, 1)
    if b2_in is not None:
        b2 = jnp.asarray(b2_in).reshape(-1, 1)
    return pzk_lin * (i1 + b1 - c1) * (i2 + b2 - c2)


def power_total(tracer1, tracer2, nzm, bh, ms, ks, pzk_lin, rho_matter0,
                kstar_damping=0.01, b1_in=None, b2_in=None):
    return (power_1halo(tracer1, tracer2, nzm, ms, ks, rho_matter0, kstar_damping)
            + power_2halo(tracer1, tracer2, nzm, bh, ms, pzk_lin, rho_matter0,
                          b1_in, b2_in))


def total_matter_power_spectrum(omch2, ombh2, Pnn, Pne, Pee):
    """fc^2 Pnn + 2 fc fb Pne + fb^2 Pee (cosmology.py:599-629)."""
    omtoth2 = omch2 + ombh2
    fc = omch2 / omtoth2
    fb = ombh2 / omtoth2
    return fc**2 * Pnn + 2.0 * fc * fb * Pne + fb**2 * Pee


def total_matter_galaxy_power_spectrum(omch2, ombh2, Pgn, Pge):
    """fc Pgn + fb Pge (cosmology.py:631-658)."""
    omtoth2 = omch2 + ombh2
    fc = omch2 / omtoth2
    fb = ombh2 / omtoth2
    return fc * Pgn + fb * Pge
