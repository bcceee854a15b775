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

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.weights import trapz_weights


class MatterTracer(NamedTuple):
    uk: jnp.ndarray  # (nz, nm, nk) -- <u> under c-scatter, else u
    # Optional second moment <u^2> over a concentration-scatter
    # distribution (profiles.nfw_uk_scatter).  When present, the 1-halo
    # AUTO term uses it (the physical <|u|^2> average); cross and 2-halo
    # terms are linear in u and correctly use <u>.  EXTENSION: the
    # reference has no concentration scatter.
    uk2: Optional[jnp.ndarray] = None


class PressureTracer(NamedTuple):
    pk: jnp.ndarray  # (nz, nm, nk)


class CIBTracer(NamedTuple):
    """Emissivity-weighted tracer for the CIB halo model (extension --
    no reference analogue).  fc/fs are the central/satellite per-halo
    emissivities L_nu/(4 pi) on the (z, m) grid; spectra built from this
    tracer carry (emissivity)^2 units and become C_ell via
    models/cib.cib_cls."""
    fc: jnp.ndarray       # (nz, nm)
    fs: jnp.ndarray       # (nz, nm)
    us: jnp.ndarray       # (nz, nm, nk) satellite profile (<u> if scattered)
    # <u^2> when the satellite profile carries concentration scatter:
    # the same-halo satellite-satellite pair term averages u^2 over the
    # one realized concentration, not <u>^2 (Jensen)
    us2: Optional[jnp.ndarray] = None


class HODTracer(NamedTuple):
    Nc: jnp.ndarray       # (nz, nm)
    Ns: jnp.ndarray       # (nz, nm)
    NsNsm1: jnp.ndarray   # (nz, nm)
    NcNs: jnp.ndarray     # (nz, nm)
    ngal: jnp.ndarray     # (nz,)
    bg: jnp.ndarray       # (nz,)
    us: jnp.ndarray       # (nz, nm, nk) satellite profile (<u> if scattered)
    uc: Optional[jnp.ndarray] = None  # central profile (None -> 1)
    us2: Optional[jnp.ndarray] = None  # <u^2> under conc scatter (see CIB)


def _mass_weights(ms):
    return jnp.asarray(trapz_weights(np.asarray(ms)))


def _mass_integral(integrand, ms):
    """int dm integrand(z,m,k) -> (z,k) with static trapz weights.

    Written as multiply + axis-sum rather than einsum/dot_general: on TPU
    the emulated f64 dot path runs ~4.5x slower than a plain VPU reduction
    for this (z,m,k)x(m) contraction shape.
    """
    w = _mass_weights(ms)
    if integrand.dtype == jnp.float32:
        # fast-assembly mode: native-f32 multiply + tree-wise sum (the
        # trapz terms are same-signed, so the reduction error is
        # ~log2(nm) ulps ~ 5e-7 of the result -- inside the fast tier's
        # 1e-5 gate), returned as f64 on the small (z,k) grid
        return ((integrand * w[None, :, None].astype(jnp.float32))
                .sum(axis=-2).astype(jnp.float64))
    return (integrand * w[None, :, None]).sum(axis=-2)


def _cast(x, dt):
    return x if dt is None else x.astype(dt)


def _hod_square_term(t: HODTracer, dt=None):
    """(2 uc us <NcNs> + <Ns(Ns-1)> us^2)/ngal^2 (hmvec.py:477-479).

    Under concentration scatter the satellite-satellite pair sits in ONE
    realized halo, so us^2 means <u^2> (t.us2), while the central x
    satellite term is linear in the satellite profile and keeps <u>."""
    uc = 1.0 if t.uc is None else _cast(t.uc, dt)
    us = _cast(t.us, dt)
    us_sq = us**2 if t.us2 is None else _cast(t.us2, dt)
    return ((2.0 * uc * us * _cast(t.NcNs, dt)[..., None]
             + _cast(t.NsNsm1, dt)[..., None] * us_sq)
            / _cast(t.ngal, dt)[..., None, None] ** 2)


def _hod_term(t: HODTracer, lowklim=False, dt=None):
    """(uc <Nc> + us <Ns>)/ngal (hmvec.py:481-486)."""
    uc = 1.0 if t.uc is None else _cast(t.uc, dt)
    us = _cast(t.us, dt)
    if lowklim:
        uc, us = 1.0, 1.0
    return ((uc * _cast(t.Nc, dt)[..., None]
             + us * _cast(t.Ns, dt)[..., None])
            / _cast(t.ngal, dt)[..., None, None])


def _matter_term(t: MatterTracer, ms, rho_matter0, lowklim=False, dt=None):
    """m u(k)/rho_m0 (hmvec.py:488-492; the m/rho factor is formed in f64
    and cast once, so fast-assembly keeps the f64 ratio accuracy)."""
    fac = jnp.asarray(ms)[None, :, None] / rho_matter0
    if lowklim:
        return _cast(fac, dt)
    return _cast(fac, dt) * _cast(t.uk, dt)


def _pressure_term(t: PressureTracer, lowklim=False, dt=None):
    if lowklim:
        return jnp.broadcast_to(_cast(t.pk, dt)[:, :, :1], t.pk.shape)
    return _cast(t.pk, dt)


def _cib_term(t: CIBTracer, lowklim=False, dt=None):
    """fc + fs u (centrals at the halo center, satellites NFW-distributed;
    Shang et al 2012 eq 20-21 structure)."""
    us = 1.0 if lowklim else _cast(t.us, dt)
    return _cast(t.fc, dt)[..., None] + us * _cast(t.fs, dt)[..., None]


def _cib_square_term(t1: CIBTracer, t2: CIBTracer, dt=None):
    """1-halo CIB pair term fc1 fs2 u2 + fc2 fs1 u1 + fs1 fs2 u1 u2 --
    the central self-pair (fc1 fc2, a pure shot-noise delta) is excluded
    by convention, exactly as in the HOD 1-halo structure.

    Concentration scatter: when both tracers carry the SAME <u^2> array
    (two frequencies built on one registered scattered profile -- the
    same concentration realization per halo), the satellite-satellite
    term uses <u^2>; distinct profiles keep the product of means."""
    u1, u2 = _cast(t1.us, dt), _cast(t2.us, dt)
    fc1, fs1 = _cast(t1.fc, dt)[..., None], _cast(t1.fs, dt)[..., None]
    fc2, fs2 = _cast(t2.fc, dt)[..., None], _cast(t2.fs, dt)[..., None]
    if t1.us2 is not None and (t1.us2 is t2.us2):
        u1u2 = _cast(t1.us2, dt)
    else:
        u1u2 = u1 * u2
    return fc1 * fs2 * u2 + fc2 * fs1 * u1 + fs1 * fs2 * u1u2


def _term(tracer, ms, rho_matter0, lowklim=False, dt=None):
    if isinstance(tracer, HODTracer):
        return _hod_term(tracer, lowklim, dt)
    if isinstance(tracer, CIBTracer):
        return _cib_term(tracer, lowklim, dt)
    if isinstance(tracer, MatterTracer):
        return _matter_term(tracer, ms, rho_matter0, lowklim, dt)
    if isinstance(tracer, PressureTracer):
        return _pressure_term(tracer, lowklim, dt)
    raise TypeError(type(tracer))


def one_halo_square_term(tracer1, tracer2, ms, rho_matter0, dt=None):
    """The (z, m, k) pair term integrated by power_1halo -- also the
    building block of the connected 1-halo trispectrum
    (cov.trispectrum_1h_terms).

    Deliberate deviation from the reference: its HOD branch ignores
    ``name2`` entirely (hmvec.py:509-511 returns
    ``_get_hod_square(name)`` whenever BOTH names are HODs), so a cross
    spectrum of two distinct galaxy samples silently came out as sample
    1's auto term.  Here the same-object pairing keeps the factorial-
    moment exclusion form and two DISTINCT samples factorize
    (<N1><N2> under the independent-population assumption, the same
    convention as the generic mixed-tracer branch and the bispectrum
    module)."""
    if tracer1 is tracer2 and isinstance(tracer1, HODTracer):
        return _hod_square_term(tracer1, dt)
    if (tracer1 is tracer2 and isinstance(tracer1, MatterTracer)
            and tracer1.uk2 is not None):
        # concentration scatter: the auto pair term is <u^2>, not <u>^2
        # (Jensen: <u^2> >= <u>^2 -- scatter boosts the 1-halo tail)
        fac = _cast(jnp.asarray(ms)[None, :, None] / rho_matter0, dt)
        return fac * fac * _cast(tracer1.uk2, dt)
    if isinstance(tracer1, CIBTracer) and isinstance(tracer2, CIBTracer):
        return _cib_square_term(tracer1, tracer2, dt)
    if isinstance(tracer1, PressureTracer) and isinstance(tracer2, PressureTracer):
        return _pressure_term(tracer1, dt=dt) ** 2
    return (_term(tracer1, ms, rho_matter0, dt=dt)
            * _term(tracer2, ms, rho_matter0, dt=dt))


def power_1halo(tracer1, tracer2, nzm, ms, ks, rho_matter0,
                kstar_damping=0.01, fast_assembly=False):
    """P_1h(z,k) (reference: hmvec.py:504-526).

    fast_assembly: run the (z,m,k)-scale products and the m-reduction in
    native f32 (the TPU fast tier; ~2e-7-class relative, inside the 1e-5
    gate) -- the exact tier keeps the emulated-f64 assembly."""
    dt = jnp.float32 if fast_assembly else None
    square = one_halo_square_term(tracer1, tracer2, ms, rho_matter0, dt)
    integral = _mass_integral(_cast(nzm, dt)[..., None] * square, ms)
    damping = 1.0 - jnp.exp(-((jnp.asarray(ks) / kstar_damping) ** 2))
    return integral * damping[None, :]


def _leg(tracer, nzm, bh, ms, rho_matter0, dt=None):
    """(integral, consistency, b) for one 2-halo leg (hmvec.py:531-551)."""
    term = _term(tracer, ms, rho_matter0, dt=dt)
    weighted = _cast(nzm, dt)[..., None] * _cast(bh, dt)[..., None]
    integral = _mass_integral(weighted * term, ms)
    if isinstance(tracer, (PressureTracer, CIBTracer)):
        # reference sets b = rterm01 = 0 for pressure legs (hmvec.py:545);
        # CIB emissivity legs likewise take no low-mass consistency
        # completion (the L(M) weighting vanishes at low mass by itself)
        consistency = jnp.zeros_like(integral)
        b = 0.0
    else:
        term0 = _term(tracer, ms, rho_matter0, lowklim=True, dt=dt)
        consistency = _mass_integral(weighted * term0, ms)
        b = (tracer.bg[:, None] if isinstance(tracer, HODTracer) else 1.0)
    return integral, consistency, b


def _leg_fnl(tracer, nzm, bh, ms, rho_matter0, dt=None):
    """(b-1)-weighted 2-halo leg — the local-fNL response.

    The scale-dependent bias correction db(m,z,k) = 2 fnl deltac
    (b(m,z) - 1) / alpha(z,k) (Dalal et al. 2008) enters the leg integral
    exactly like b but weighted by (b - 1); the consistency completion is
    the same trick with (b - 1).  For a matter leg the completed low-k
    limit is int n (b-1) m/rho dm = (int n b m/rho) - (int n m/rho) = 0
    (bias consistency minus mass conservation), so matter legs carry NO
    large-k-limit offset; HOD legs complete to (bg - 1).
    """
    integral, consistency, b = _leg(tracer, nzm, jnp.asarray(bh) - 1.0,
                                    ms, rho_matter0, dt)
    if isinstance(tracer, HODTracer):
        b = b - 1.0
    elif not isinstance(tracer, (PressureTracer, CIBTracer)):
        b = 0.0
    return integral, consistency, b


def power_2halo(tracer1, tracer2, nzm, bh, ms, pzk_lin, rho_matter0,
                b1_in=None, b2_in=None, fast_assembly=False,
                fnl=None, alpha_zk=None, deltac=1.42):
    """P_2h(z,k) with the low-k consistency subtraction (hmvec.py:528-572).

    ``fnl``: optional local primordial non-Gaussianity amplitude.  The
    reference exposes the scale-dependent bias only as a free function for
    manual post-hoc application (cosmology.py:132-136, examples/fnl.py);
    here it threads through the mass integral of each 2-halo leg, so HOD x
    HOD, HOD x matter and HOD x electron spectra all pick up the correct
    per-tracer k-dependence.  Requires ``alpha_zk`` (nz, nk) from
    Cosmology.alpha_fnl.
    """
    dt = jnp.float32 if fast_assembly else None
    i1, c1, b1 = _leg(tracer1, nzm, bh, ms, rho_matter0, dt)
    i2, c2, b2 = _leg(tracer2, nzm, bh, ms, rho_matter0, dt)
    if b1_in is not None:
        b1 = jnp.asarray(b1_in).reshape(-1, 1)
    if b2_in is not None:
        b2 = jnp.asarray(b2_in).reshape(-1, 1)
    e1 = i1 + b1 - c1
    e2 = i2 + b2 - c2
    if fnl is not None:
        if alpha_zk is None:
            raise ValueError("fnl needs alpha_zk (Cosmology.alpha_fnl)")
        pref = 2.0 * fnl * deltac / _cast(jnp.asarray(alpha_zk), dt)
        if1, cf1, bf1 = _leg_fnl(tracer1, nzm, bh, ms, rho_matter0, dt)
        e1 = e1 + pref * (if1 + bf1 - cf1)
        if tracer2 is tracer1:
            if2, cf2, bf2 = if1, cf1, bf1
        else:
            if2, cf2, bf2 = _leg_fnl(tracer2, nzm, bh, ms, rho_matter0, dt)
        e2 = e2 + pref * (if2 + bf2 - cf2)
    return pzk_lin * e1 * e2


def power_total(tracer1, tracer2, nzm, bh, ms, ks, pzk_lin, rho_matter0,
                kstar_damping=0.01, b1_in=None, b2_in=None,
                fast_assembly=False):
    return (power_1halo(tracer1, tracer2, nzm, ms, ks, rho_matter0,
                        kstar_damping, fast_assembly)
            + power_2halo(tracer1, tracer2, nzm, bh, ms, pzk_lin,
                          rho_matter0, b1_in, b2_in, fast_assembly))


def exclusion_correction(ks, p2h_zk, r_excl_z):
    """Halo-exclusion correction to the 2-halo term (EXTENSION -- the
    reference has no exclusion; its 2-halo term overcounts pairs closer
    than the halos' own sizes at k ~ 0.1-10/Mpc).

    Baldauf et al 2013 sharp exclusion: 1 + xi_excl(r) =
    (1 + xi_2h(r)) theta(r - R), so in Fourier space

        P_excl(k) = P_2h(k) - 4 pi int_0^R (1 + xi_2h(r)) j0(kr) r^2 dr.

    The '1' piece is the analytic top-hat, -V_R 3 j1(kR)/(kR); the xi
    piece is a FINITE integral evaluated directly on the FFTLog xi grid
    (one masked (nz,nr) x (nr,nk) matmul -- MXU-shaped, no second
    FFTLog, so the caller's k grid is preserved exactly).  xi_2h comes
    from ops.fftlog.correlation_function of p2h_zk itself, so ``ks``
    should span a wide log range (the BASELINE 1e-4..100 grid is ample);
    exclusion is physical only where 1 + xi >= 0, i.e. for R not deep
    inside the nonlinear 1-halo regime.

    ks: (nk,) log-spaced; p2h_zk: (nz, nk); r_excl_z: scalar or (nz,)
    COMOVING exclusion radius [Mpc].  Returns Delta P (nz, nk) to ADD to
    the 2-halo term (negative at low k: the excluded volume removes
    pairs).  jit/grad-safe incl. through r_excl_z.
    """
    from ..ops.fftlog import correlation_function

    ks_np = np.asarray(ks)
    dln = np.diff(np.log(ks_np))
    if not np.allclose(dln, dln[0], rtol=1e-6):
        raise ValueError(
            "exclusion_correction needs a log-uniform k grid (the xi "
            "table comes from FFTLog); got non-uniform dlnk")
    ks = jnp.asarray(ks)
    p2h_zk = jnp.asarray(p2h_zk)
    rz = jnp.atleast_1d(jnp.asarray(r_excl_z, dtype=jnp.float64))[:, None]

    rs, xi = correlation_function(ks, p2h_zk)      # (nr,), (nz, nr)
    rs = jnp.asarray(rs)
    # log-trapz weights on the xi grid, masked to r < R (the grid is
    # log-uniform, so dr = r dlnr); smooth in r_excl via the sharp mask
    # (the integrand is bounded there, so grads flow through xi and R^3)
    dlnr = jnp.log(rs[1] / rs[0])
    w = jnp.full(rs.shape, dlnr)
    w = w.at[0].set(0.5 * dlnr).at[-1].set(0.5 * dlnr)
    # logistic edge of width ~ half a grid cell instead of a sharp mask:
    # centers the quadrature edge on R independent of grid registration
    # AND carries the d/dR edge term (-4 pi (1+xi(R)) j0(kR) R^2) through
    # autodiff, which a hard (rs < R) mask would silently drop from the
    # xi piece
    mask = jax.nn.sigmoid((jnp.log(rz) - jnp.log(rs)[None, :])
                          / (0.5 * dlnr))
    j0_rk = jnp.sinc((rs[:, None] * ks[None, :]) / jnp.pi)   # (nr, nk)
    # 4 pi int xi j0 r^2 dr = 4 pi sum w r^3 xi j0
    xi_piece = 4.0 * jnp.pi * ((mask * xi * (w * rs**3)[None, :]) @ j0_rk)
    x = rz * ks[None, :]
    # switch at 1e-4, NOT near the underflow floor: the closed form
    # loses ~3 eps/x^2 to cancellation (garbage below x ~ 1e-7), while
    # the x^2 Taylor term is exact to ~1e-18 at x = 1e-4
    xs = jnp.where(x > 1e-4, x, 1.0)
    tophat = jnp.where(
        x > 1e-4,
        3.0 * (jnp.sin(xs) - xs * jnp.cos(xs)) / xs**3,
        1.0 - x * x / 10.0)
    vol_piece = (4.0 * jnp.pi / 3.0) * rz**3 * tophat
    return -(xi_piece + vol_piece)


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
