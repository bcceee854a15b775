"""Halo-model bispectra: 1-halo / 2-halo / 3-halo tracer bispectra and
their flat-sky Limber projection to angular (reduced) bispectra.

Extension beyond the reference (simonsobs/hmvec ships power spectra only,
hmvec/hmvec.py:500-572); the mass-integral structure reuses exactly the
tracer-term decomposition of models/power.py so every registered tracer
(matter/NFW, Battaglia pressure, HOD, CIB) gets bispectra for free:

  B_1h(k1,k2,k3) = int dm n(m) <T_1(k1) T_2(k2) T_3(k3)>
  B_2h(k1,k2,k3) = P(k1) I_1(t1;k1) I_2(t2,t3;k2,k3) + 2 cyc.
  B_3h(k1,k2,k3) = I_1(t1;k1) I_1(t2;k2) I_1(t3;k3) B_tree(k1,k2,k3)
                   [+ second-order bias: I1 I1 Ib2 (P P + cyc.), optional]

with I_1 the consistency-completed 2-halo leg of models/power.py (matter
legs -> 1 and HOD legs -> b_g as k -> 0), I_2 the b1-weighted same-halo
pair integral, and B_tree the F2 tree-level matter bispectrum.
Conventions follow the halo-model bispectrum literature (Scoccimarro-
Sheth-Hui-Jain 2001; Lacasa 2018 for the projected form); the
second-order bias is the Sheth-Tormen peak-background split.

Occupation moments: same-halo pairs/triples of one HOD tracer use the
factorial-moment structure of power.one_halo_square_term extended to
distinct wavenumbers per leg, with third moments built by the product
convention <Nc Ns(Ns-1)> = <NcNs><Ns> and <Ns(Ns-1)(Ns-2)> =
<Ns(Ns-1)><Ns> (exact for Bernoulli centrals + Poisson satellites under
corr='max'; Bernoulli excludes multi-central terms identically).  CIB
same-halo tuples exclude the central counted more than once (the same
shot-noise exclusion as the pair term), and ANY two CIB tracers count
as one population (cross-frequency legs observe the same galaxies --
the convention of power._cib_square_term).  Pairs/triples of
*different* HOD tracers factorize (independent-population assumption),
documented here rather than hidden.

TPU notes: all mass integrals are static-trapz multiply+axis-sum
contractions over the m axis (same shape as power.py -- m-axis
shardable); per-configuration leg evaluations are two-gather lerps on
the last axis (the DEVNOTES-recommended gather pattern, index count
nz*nq independent of nm), so a batch of thousands of (k1,k2,k3)
triangles is one fused jit program with no Python loops.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.quadrature import trapz_traced
from .power import _term, _leg, _mass_integral, HODTracer, CIBTracer


# ---------------------------------------------------------------- geometry

def mu12_from_closure(k1, k2, k3):
    """cos(angle between vec k1, vec k2) from triangle closure
    vec k3 = -(vec k1 + vec k2):  mu = (k3^2 - k1^2 - k2^2)/(2 k1 k2)."""
    return (k3**2 - k1**2 - k2**2) / (2.0 * k1 * k2)


def f2_kernel(k1, k2, k3):
    """Second-order SPT density kernel F2(vec k1, vec k2) with the angle
    fixed by triangle closure.  Equilateral value is exactly 2/7."""
    mu = mu12_from_closure(k1, k2, k3)
    return (5.0 / 7.0
            + 0.5 * mu * (k1 / k2 + k2 / k1)
            + (2.0 / 7.0) * mu**2)


def tree_bispectrum(P1, P2, P3, k1, k2, k3):
    """Tree-level matter bispectrum 2 F2(ki,kj) P(ki) P(kj) + 2 cyc.,
    with P already evaluated on each leg."""
    return 2.0 * (f2_kernel(k1, k2, k3) * P1 * P2
                  + f2_kernel(k2, k3, k1) * P2 * P3
                  + f2_kernel(k3, k1, k2) * P3 * P1)


# ------------------------------------------------------ second-order bias

def b2_sheth_torman(sigma2, params):
    """Second-order Eulerian bias from the peak-background split of the
    Sheth-Tormen multiplicity (Scoccimarro et al 2001 eq A6 / Cooray &
    Sheth 2002 eq 68-69):

      e1 = (a nu^2 - 1)/dc,  e2 = (a nu^2/dc^2)(a nu^2 - 3),
      E1 = (2p/dc)/(1 + (a nu^2)^p),  E2 = E1 ((1+2p)/dc + 2 e1),
      b1 = 1 + e1 + E1   (== mass_function.bias_sheth_torman),
      b2 = (8/21)(e1 + E1) + e2 + E2.

    Also exact for the ST-form families (Press-Schechter a=1,p=0 gives
    the Mo-White-96 b2 = (nu^2-3)nu^2/dc^2 + (8/21)(nu^2-1)/dc)."""
    a = params["st_a"]
    p = params["st_p"]
    dc = params["st_deltac"]
    anu2 = a * dc**2 / sigma2
    e1 = (anu2 - 1.0) / dc
    e2 = (anu2 / dc**2) * (anu2 - 3.0)
    E1 = (2.0 * p / dc) / (1.0 + anu2**p)
    E2 = E1 * ((1.0 + 2.0 * p) / dc + 2.0 * e1)
    return (8.0 / 21.0) * (e1 + E1) + e2 + E2


# ---------------------------------------------------------- interpolation

def _normalize_kq(kq, nz):
    """Broadcast a leg wavenumber spec to (nz, nq): scalars and (nq,)
    arrays are shared across z; (nz, nq) arrays are per-z (the Limber
    case k = (l+1/2)/chi(z))."""
    kq = jnp.atleast_1d(jnp.asarray(kq))
    if kq.ndim == 1:
        kq = jnp.broadcast_to(kq[None, :], (nz, kq.shape[0]))
    return kq


def _interp_zk(ks, F, kq):
    """(nz, nk) table -> (nz, nq) at per-z queries, linear in ln k,
    clipped flat at the grid edges (same semantics as the Limber
    machinery's interp_pzk_at_curve, models/limber.py:45)."""
    lks = jnp.log(jnp.asarray(ks))
    lkq = jnp.log(kq)
    i = jnp.clip(jnp.searchsorted(lks, lkq) - 1, 0, lks.size - 2)
    t = jnp.clip((lkq - lks[i]) / (lks[i + 1] - lks[i]), 0.0, 1.0)
    f0 = jnp.take_along_axis(F, i, axis=-1)
    f1 = jnp.take_along_axis(F, i + 1, axis=-1)
    return f0 + t * (f1 - f0)


def _interp_zmk(ks, T, kq):
    """(nz, nm, nk) tracer term -> (nz, nm, nq) at per-z queries (linear
    in ln k, flat-clipped).  Indices broadcast over the m axis so the
    gather count is nz*nq, independent of nm."""
    lks = jnp.log(jnp.asarray(ks))
    lkq = jnp.log(kq)
    i = jnp.clip(jnp.searchsorted(lks, lkq) - 1, 0, lks.size - 2)
    t = jnp.clip((lkq - lks[i]) / (lks[i + 1] - lks[i]), 0.0, 1.0)
    t0 = jnp.take_along_axis(T, i[:, None, :], axis=-1)
    t1 = jnp.take_along_axis(T, (i + 1)[:, None, :], axis=-1)
    return t0 + t[:, None, :] * (t1 - t0)


# ------------------------------------------------------------ leg objects

class _Leg:
    """One bispectrum leg: a tracer with its terms interpolated to this
    leg's per-z wavenumbers kq (nz, nq)."""

    def __init__(self, tracer, ms, rho_matter0, ks, kq):
        self.tracer = tracer
        self.kq = kq
        self.term = _interp_zmk(ks, _term(tracer, ms, rho_matter0), kq)
        if isinstance(tracer, HODTracer):
            self.us = _interp_zmk(ks, tracer.us, kq)
            self.uc = (1.0 if tracer.uc is None
                       else _interp_zmk(ks, tracer.uc, kq))
        elif isinstance(tracer, CIBTracer):
            self.us = _interp_zmk(ks, tracer.us, kq)
            # per-leg emissivity weights: cross-frequency pairs/triples mix
            # fc/fs of different frequencies but share ONE galaxy population
            self.fc = tracer.fc[..., None]
            self.fs = tracer.fs[..., None]


def _same_population(a: _Leg, b: _Leg) -> bool:
    """Whether two legs sample the SAME underlying galaxy population, so
    same-halo self-pair exclusions apply.  Identical tracer objects
    always do; any two CIB tracers do too (different frequencies weight
    the same galaxies -- the convention of power._cib_square_term, which
    excludes the central self-pair for every CIB x CIB pairing)."""
    return a.tracer is b.tracer or (isinstance(a.tracer, CIBTracer)
                                    and isinstance(b.tracer, CIBTracer))


def _pair_term(a: _Leg, b: _Leg):
    """Same-halo pair <T_a(ka) T_b(kb)>: power.one_halo_square_term
    generalized to two wavenumbers (and, for CIB, two frequencies).
    Reduces exactly to it at ka == kb."""
    t = a.tracer
    if t is b.tracer and isinstance(t, HODTracer):
        return (((a.uc * b.us + a.us * b.uc) * t.NcNs[..., None]
                 + a.us * b.us * t.NsNsm1[..., None])
                / t.ngal[..., None, None] ** 2)
    if isinstance(t, CIBTracer) and isinstance(b.tracer, CIBTracer):
        # central self-pair (fc_a fc_b) excluded: one central observed at
        # two frequencies is shot noise, not a 1-halo correlation
        return (a.fc * b.fs * b.us + b.fc * a.fs * a.us
                + a.fs * b.fs * a.us * b.us)
    return a.term * b.term


def _triple_term(a: _Leg, b: _Leg, c: _Leg):
    """Same-halo triple <T_a(k1) T_b(k2) T_c(k3)> with the factorial-
    moment conventions documented in the module docstring."""
    t = a.tracer
    if t is b.tracer and t is c.tracer and isinstance(t, HODTracer):
        ncnsns = (t.NcNs * t.Ns)[..., None]
        ns3 = (t.NsNsm1 * t.Ns)[..., None]
        return ((a.uc * b.us * c.us + a.us * b.uc * c.us
                 + a.us * b.us * c.uc) * ncnsns
                + a.us * b.us * c.us * ns3) / t.ngal[..., None, None] ** 3
    if all(isinstance(x.tracer, CIBTracer) for x in (a, b, c)):
        # exactly one leg may be the (unresolved) central; every term with
        # the central counted twice is excluded, as in the pair term
        return (a.fc * b.fs * c.fs * b.us * c.us
                + b.fc * a.fs * c.fs * a.us * c.us
                + c.fc * a.fs * b.fs * a.us * b.us
                + a.fs * b.fs * c.fs * a.us * b.us * c.us)
    # one shared-population pair + a distinct third leg
    for (x, y, z) in ((a, b, c), (b, c, a), (c, a, b)):
        if _same_population(x, y) and not _same_population(x, z):
            return _pair_term(x, y) * z.term
    return a.term * b.term * c.term


def _leg_completed(tracer, nzm, bh, ms, ks, rho_matter0, kq, b_in=None):
    """Consistency-completed b1 leg I_1(z, kq) = i + b - c evaluated on
    the native grid and interpolated to the query legs (I_1 is smooth in
    k, so interpolating the integral is exact to lerp order)."""
    i, c, b = _leg(tracer, nzm, bh, ms, rho_matter0)
    if b_in is not None:
        b = jnp.asarray(b_in).reshape(-1, 1)
    return _interp_zk(ks, i + b - c, kq)


# ----------------------------------------------------------------- terms

def _make_legs(tracers, ms, ks, rho_matter0, k1, k2, k3, nz):
    kqs = [_normalize_kq(k, nz) for k in (k1, k2, k3)]
    legs = [_Leg(t, ms, rho_matter0, ks, kq)
            for t, kq in zip(tracers, kqs)]
    return legs, kqs


def _prep_pi1(ts, legs, kqs, nzm, bh, ms, ks, pzk_lin, rho_matter0, b_in):
    """The P(k) legs and consistency-completed I_1 legs shared by the
    2-halo and 3-halo terms (computed ONCE per call -- eager callers of
    bispectrum_total would otherwise pay the mass integrals twice)."""
    P = [_interp_zk(ks, jnp.asarray(pzk_lin), kq) for kq in kqs]
    I1 = [_leg_completed(ts[i], nzm, bh, ms, ks, rho_matter0, kqs[i], b_in[i])
          for i in range(3)]
    return P, I1


def _b1h_from(legs, kqs, nzm, ms, kstar_damping):
    integral = _mass_integral(jnp.asarray(nzm)[..., None]
                              * _triple_term(*legs), ms)
    if kstar_damping:
        for kq in kqs:
            integral = integral * (1.0 - jnp.exp(-((kq / kstar_damping) ** 2)))
    return integral


def _b2h_from(legs, P, I1, nzm, bh, ms):
    w = (jnp.asarray(nzm) * jnp.asarray(bh))[..., None]
    out = 0.0
    for i in range(3):
        j, l = (i + 1) % 3, (i + 2) % 3
        I2 = _mass_integral(w * _pair_term(legs[j], legs[l]), ms)
        out = out + P[i] * I1[i] * I2
    return out


def _b3h_from(legs, kqs, P, I1, nzm, ms, b2h):
    out = I1[0] * I1[1] * I1[2] * tree_bispectrum(
        P[0], P[1], P[2], kqs[0], kqs[1], kqs[2])
    if b2h is not None:
        w2 = (jnp.asarray(nzm) * jnp.asarray(b2h))[..., None]
        for l in range(3):
            i, j = (l + 1) % 3, (l + 2) % 3
            Ib2 = _mass_integral(w2 * legs[l].term, ms)
            out = out + I1[i] * I1[j] * Ib2 * P[i] * P[j]
    return out


def bispectrum_1halo(t1, t2, t3, nzm, ms, ks, rho_matter0, k1, k2, k3,
                     kstar_damping=0.01):
    """B_1h(z; k1,k2,k3) = int dm n <T1(k1) T2(k2) T3(k3)>, with the same
    low-k damping as power_1halo (hmvec.py:526) applied per leg so the
    shot-noise-like plateau does not leak to large scales."""
    nz = jnp.asarray(nzm).shape[0]
    legs, kqs = _make_legs((t1, t2, t3), ms, ks, rho_matter0,
                           k1, k2, k3, nz)
    return _b1h_from(legs, kqs, nzm, ms, kstar_damping)


def bispectrum_2halo(t1, t2, t3, nzm, bh, ms, ks, pzk_lin, rho_matter0,
                     k1, k2, k3, b_in=(None, None, None)):
    """B_2h = P(k1) I_1(t1;k1) I_2(t2,t3;k2,k3) + 2 cyclic permutations,
    with I_2 = int dm n b <T_a(ka) T_b(kb)> the b1-weighted same-halo
    pair (second-moment structure for same-HOD/CIB pairs)."""
    nz = jnp.asarray(nzm).shape[0]
    ts = (t1, t2, t3)
    legs, kqs = _make_legs(ts, ms, ks, rho_matter0, k1, k2, k3, nz)
    P, I1 = _prep_pi1(ts, legs, kqs, nzm, bh, ms, ks, pzk_lin,
                      rho_matter0, b_in)
    return _b2h_from(legs, P, I1, nzm, bh, ms)


def bispectrum_3halo(t1, t2, t3, nzm, bh, ms, ks, pzk_lin, rho_matter0,
                     k1, k2, k3, b_in=(None, None, None), b2h=None):
    """B_3h = I_1(k1) I_1(k2) I_1(k3) B_tree(k1,k2,k3), plus (optional,
    pass b2h = second-order halo bias on the (z, m) grid, e.g.
    b2_sheth_torman(sigma2, params)) the local-bias quadratic term
    I_1(ki) I_1(kj) Ib2(kl) P(ki) P(kj) + cyc. with
    Ib2 = int dm n b2 T (no consistency completion -- the quadratic-bias
    background integral has no closed-form low-mass limit; documented)."""
    nz = jnp.asarray(nzm).shape[0]
    ts = (t1, t2, t3)
    legs, kqs = _make_legs(ts, ms, ks, rho_matter0, k1, k2, k3, nz)
    P, I1 = _prep_pi1(ts, legs, kqs, nzm, bh, ms, ks, pzk_lin,
                      rho_matter0, b_in)
    return _b3h_from(legs, kqs, P, I1, nzm, ms, b2h)


def bispectrum_total(t1, t2, t3, nzm, bh, ms, ks, pzk_lin, rho_matter0,
                     k1, k2, k3, kstar_damping=0.01,
                     b_in=(None, None, None), b2h=None):
    """1h + 2h + 3h, with the legs, P(k) interpolations, and I_1 mass
    integrals computed once and shared across the three terms."""
    nz = jnp.asarray(nzm).shape[0]
    ts = (t1, t2, t3)
    legs, kqs = _make_legs(ts, ms, ks, rho_matter0, k1, k2, k3, nz)
    P, I1 = _prep_pi1(ts, legs, kqs, nzm, bh, ms, ks, pzk_lin,
                      rho_matter0, b_in)
    return (_b1h_from(legs, kqs, nzm, ms, kstar_damping)
            + _b2h_from(legs, P, I1, nzm, bh, ms)
            + _b3h_from(legs, kqs, P, I1, nzm, ms, b2h))


# ------------------------------------------------------------ projection

def projected_bispectrum(ells1, ells2, ells3, zs, hzs, chis,
                         Wz1s, Wz2s, Wz3s, B_fn):
    """Flat-sky Limber reduced bispectrum

      b(l1,l2,l3) = int dchi V1 V2 V3 / chi^4 B(k_i = (l_i + 1/2)/chi)

    written in the repo's window convention (limber_integral carries
    C = int dz H W1 W2 P / chi^2, i.e. the per-chi window is V = H W):

      b = int dz H^2 W1 W2 W3 / chi^4 B.

    B_fn maps three (nz, nl) leg-wavenumber arrays to B(z, l); the ell
    triplets are broadcast to a common (nl,) shape.  Full-sky bispectrum
    = b(l1,l2,l3) x the Gaunt/Wigner-3j geometric factor (not applied
    here; the reduced bispectrum is the flat-sky observable)."""
    ells1, ells2, ells3 = jnp.broadcast_arrays(
        jnp.atleast_1d(jnp.asarray(ells1, dtype=jnp.float64)),
        jnp.atleast_1d(jnp.asarray(ells2, dtype=jnp.float64)),
        jnp.atleast_1d(jnp.asarray(ells3, dtype=jnp.float64)))
    zs = jnp.asarray(zs)
    chis = jnp.asarray(chis)
    hzs = jnp.asarray(hzs)
    kq = [(e[None, :] + 0.5) / chis[:, None] for e in (ells1, ells2, ells3)]
    B = B_fn(*kq)                                    # (nz, nl)
    ones = jnp.ones_like(zs)
    W = [(ones if w is None else jnp.asarray(w)) for w in (Wz1s, Wz2s, Wz3s)]
    pre = hzs**2 * W[0] * W[1] * W[2] / chis**4      # (nz,)
    return trapz_traced(pre[:, None] * B, zs, axis=0)
