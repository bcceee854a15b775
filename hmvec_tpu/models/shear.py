"""Real-space weak-lensing statistics: xi_plus/xi_minus and gamma_t.

EXTENSION beyond the reference (which exposes only harmonic-space Limber
spectra, hmvec/cosmology.py:536-597): the exact curved-sky transforms

    xi_+(theta)   = sum_l (2l+1)/(4pi) [C^E_l + C^B_l] d^l_{2,2}(theta)
    xi_-(theta)   = sum_l (2l+1)/(4pi) [C^E_l - C^B_l] d^l_{2,-2}(theta)
    gamma_t(theta)= sum_l (2l+1)/(4pi) C^{gE}_l       d^l_{2,0}(theta)
    w(theta)      = sum_l (2l+1)/(4pi) C^{gg}_l       d^l_{0,0}(theta)

with d^l_{mn} the Wigner small-d matrices (Chon et al. 2004 / Kilbinger
review conventions).  These are what survey pipelines actually estimate
from shear catalogs; pairing them with this package's C_kk/C_kg/C_gg
Limber outputs closes the loop from halo model to measured two-point
functions.

TPU-first design: the whole family is one upward three-term l-recurrence
evaluated as a `lax.scan` carrying (d_{l-1}, d_l, accumulator) for ALL
angles at once -- O(nl * ntheta) fused multiply-adds, no special-function
tables, no host transforms; jit- and grad-safe (the recurrence is
polynomial in cos theta).  The (m,n) = (0,0) case reduces exactly to the
Legendre sum in :func:`hmvec_tpu.models.cov.angular_correlation`.

Oracle: an independent numpy twin built on scipy's Jacobi polynomials
(twin/wigner.py) pins every spin pair at <=1e-10 in tests/test_shear.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Seed values (d^{lmin}_{mn}(x), d^{lmin+1}_{mn}(x)) at lmin = max(|m|, |n|)
# as closed forms in x = cos(theta).  BOTH seeds are needed because the
# three-term recurrence's denominator l*sqrt(...) vanishes at l = 0, so the
# (0, 0) case cannot bootstrap its second value from the first (for the
# spin-2 pairs the second form below equals one recurrence step from the
# first with d^{lmin-1} = 0, verified in tests).  Only the spin combinations
# used by 2-pt shear statistics are tabulated; the recurrence is generic
# given any seed pair.
_SEEDS = {
    (0, 0): (lambda x: jnp.ones_like(x),
             lambda x: x),
    (2, 2): (lambda x: ((1.0 + x) / 2.0) ** 2,
             lambda x: ((1.0 + x) / 2.0) ** 2 * (3.0 * x - 2.0)),
    (2, -2): (lambda x: ((1.0 - x) / 2.0) ** 2,
              lambda x: ((1.0 - x) / 2.0) ** 2 * (3.0 * x + 2.0)),
    (2, 0): (lambda x: jnp.sqrt(6.0) / 4.0 * (1.0 - x**2),
             lambda x: jnp.sqrt(30.0) / 4.0 * x * (1.0 - x**2)),
}


def wigner_d_sum(ells, cls, thetas_rad, mn=(0, 0)):
    """sum_l (2l+1)/(4pi) C_l d^l_{mn}(theta) by upward recurrence.

    ells: (nl,) consecutive integers starting at any l0 >= max(|m|,|n|)
    (entries below lmin would multiply d's that are identically zero, so
    l0 < lmin is also accepted and those rows are ignored);
    cls: (..., nl); thetas_rad: (nt,).  Returns (..., nt).

    Recurrence (Varshalovich 4.8.1; checked against the Legendre limit at
    m=n=0 and the tabulated d^3_{2,+-2} closed forms):

        d^{l+1} = [ (2l+1)(l(l+1) x - m n) d^l
                    - (l+1) sqrt((l^2-m^2)(l^2-n^2)) d^{l-1} ]
                  / [ l sqrt(((l+1)^2-m^2)((l+1)^2-n^2)) ]

    which is stable upward for |m|,|n| <= 2 at all angles.
    """
    m, n = int(mn[0]), int(mn[1])
    if (m, n) not in _SEEDS:
        raise ValueError(f"unsupported (m, n) = {(m, n)}; "
                         f"available: {sorted(_SEEDS)}")
    lmin = max(abs(m), abs(n))
    ells = np.asarray(ells)
    assert ells.ndim == 1 and np.all(np.diff(ells) == 1), \
        "ells must be consecutive integers"
    l0 = int(ells[0])
    x = jnp.cos(jnp.asarray(thetas_rad))
    cls = jnp.asarray(cls)

    # weights (2l+1)/(4pi) C_l on a dense l-range starting at lmin
    nl_total = int(ells[-1]) + 1 - lmin
    wcls = cls * ((2.0 * jnp.asarray(ells, dtype=cls.dtype) + 1.0)
                  / (4.0 * jnp.pi))
    w = jnp.zeros((nl_total,) + cls.shape[:-1] + (1,), dtype=cls.dtype)
    keep = ells >= lmin
    w = w.at[ells[keep] - lmin].set(
        jnp.moveaxis(wcls[..., keep], -1, 0)[..., None])

    fm, fn = float(m), float(n)

    def body(carry, wl):
        dm1, d, l, acc = carry
        acc = acc + wl * d
        num = ((2.0 * l + 1.0) * (l * (l + 1.0) * x - fm * fn) * d
               - (l + 1.0) * jnp.sqrt((l**2 - fm**2) * (l**2 - fn**2)) * dm1)
        den = l * jnp.sqrt(((l + 1.0) ** 2 - fm**2)
                           * ((l + 1.0) ** 2 - fn**2))
        return (d, num / den, l + 1.0, acc), None

    seed0_fn, seed1_fn = _SEEDS[(m, n)]
    d_lo, d_hi = seed0_fn(x), seed1_fn(x)
    # the l = lmin term is accumulated up front; the scan starts the
    # recurrence at l = lmin + 1 (whose denominator is nonzero for every
    # supported spin pair, including (0, 0))
    init = (d_lo, d_hi, jnp.asarray(float(lmin) + 1.0),
            jnp.zeros(cls.shape[:-1] + x.shape) + w[0] * d_lo)
    (_, _, _, acc), _ = jax.lax.scan(body, init, w[1:])
    return acc


def wigner_d_rows(lmax, xs, mn=(0, 0)):
    """Materialized d^l_{mn}(x) table, shape (lmax+1, nx), l = 0..lmax.

    Same three-term recurrence as :func:`wigner_d_sum`, but the scan
    STORES each row instead of contracting it — the building block for
    quadrature-based mode-coupling matrices (models/master.py), where the
    (l, x) table feeds an MXU matmul.  Rows with l < max(|m|, |n|) are
    identically zero.
    """
    m, n = int(mn[0]), int(mn[1])
    if (m, n) not in _SEEDS:
        raise ValueError(f"unsupported (m, n) = {(m, n)}; "
                         f"available: {sorted(_SEEDS)}")
    lmin = max(abs(m), abs(n))
    x = jnp.asarray(xs)
    fm, fn = float(m), float(n)

    def body(carry, l):
        dm1, d = carry
        num = ((2.0 * l + 1.0) * (l * (l + 1.0) * x - fm * fn) * d
               - (l + 1.0) * jnp.sqrt((l**2 - fm**2) * (l**2 - fn**2)) * dm1)
        den = l * jnp.sqrt(((l + 1.0) ** 2 - fm**2)
                           * ((l + 1.0) ** 2 - fn**2))
        # carry holds (d^{l-1}, d^l); emit d^{l-1} and advance to d^{l+1}
        return (d, num / den), dm1

    seed0_fn, seed1_fn = _SEEDS[(m, n)]
    d_lo, d_hi = seed0_fn(x), seed1_fn(x)
    nrec = int(lmax) - lmin + 1
    if nrec <= 0:
        return jnp.zeros((int(lmax) + 1, x.shape[0]), dtype=x.dtype)
    _, rows = jax.lax.scan(
        body, (d_lo, d_hi),
        jnp.arange(lmin + 1, lmin + 1 + nrec, dtype=x.dtype))
    # rows[i] is d^{lmin+i}; prepend the zero rows below lmin
    return jnp.concatenate(
        [jnp.zeros((lmin, x.shape[0]), dtype=x.dtype), rows], axis=0)


def wigner_d_outer_sum(ells, wls, thetas_rad, mn1=(0, 0), mn2=None,
                       thetas2_rad=None):
    """sum_l w_l d^l_{mn1}(theta_i) d^l_{mn2}(theta'_j) -> (..., nt1, nt2).

    The real-space Gaussian-covariance kernel: one lax.scan carries BOTH
    spin recurrences and accumulates the outer product per l (the (l,
    theta) d-matrices are never materialized).  wls: (..., nl) weights
    on consecutive integer ells.
    """
    if mn2 is None:
        mn2 = mn1
    for mn in (mn1, mn2):
        if tuple(int(v) for v in mn) not in _SEEDS:
            raise ValueError(f"unsupported (m, n) = {tuple(mn)}; "
                             f"available: {sorted(_SEEDS)}")
    ells = np.asarray(ells)
    assert ells.ndim == 1 and np.all(np.diff(ells) == 1), \
        "ells must be consecutive integers"
    lmin = max(max(abs(int(v)) for v in mn1),
               max(abs(int(v)) for v in mn2))
    x1 = jnp.cos(jnp.asarray(thetas_rad))
    x2 = x1 if thetas2_rad is None else jnp.cos(jnp.asarray(thetas2_rad))
    wls = jnp.asarray(wls)

    nl_total = int(ells[-1]) + 1 - lmin
    w = jnp.zeros((nl_total,) + wls.shape[:-1], dtype=wls.dtype)
    keep = ells >= lmin
    w = w.at[ells[keep] - lmin].set(jnp.moveaxis(wls[..., keep], -1, 0))

    def step(m, n, dm1, d, l, x):
        fm, fn = float(m), float(n)
        num = ((2.0 * l + 1.0) * (l * (l + 1.0) * x - fm * fn) * d
               - (l + 1.0) * jnp.sqrt((l**2 - fm**2) * (l**2 - fn**2)) * dm1)
        den = l * jnp.sqrt(((l + 1.0) ** 2 - fm**2)
                           * ((l + 1.0) ** 2 - fn**2))
        return num / den

    m1, n1 = int(mn1[0]), int(mn1[1])
    m2, n2 = int(mn2[0]), int(mn2[1])
    # seeds start at each pair's own lmin; below it d == 0 identically,
    # so seed at the shared lmin with zeros for the higher-spin pair
    def seeds(mn, x):
        lm = max(abs(mn[0]), abs(mn[1]))
        s0, s1 = _SEEDS[(int(mn[0]), int(mn[1]))]
        return lm, s0(x), s1(x)

    lm1, a0, a1 = seeds(mn1, x1)
    lm2, b0, b1 = seeds(mn2, x2)
    # advance the lower-lmin pair up to the shared lmin on host-unrolled
    # steps (at most 2 steps: spin combinations here differ by <= 2)
    while lm1 < lmin:
        a0, a1 = a1, step(m1, n1, a0, a1, float(lm1 + 1), x1)
        lm1 += 1
    while lm2 < lmin:
        b0, b1 = b1, step(m2, n2, b0, b1, float(lm2 + 1), x2)
        lm2 += 1

    def body(carry, wl):
        am1, a, bm1, b, l, acc = carry
        acc = acc + wl[..., None, None] * a[:, None] * b[None, :]
        anext = step(m1, n1, am1, a, l, x1)
        bnext = step(m2, n2, bm1, b, l, x2)
        return (a, anext, b, bnext, l + 1.0, acc), None

    # the l = lmin term pairs the SEEDS; the scan then walks w[1:]
    acc0 = (w[0][..., None, None] * a0[:, None] * b0[None, :]
            + jnp.zeros(w.shape[1:] + (x1.shape[0], x2.shape[0])))
    init = (a0, a1, b0, b1, jnp.asarray(float(lmin) + 1.0), acc0)
    (_, _, _, _, _, acc), _ = jax.lax.scan(body, init, w[1:])
    return acc


_XI_MN = {"plus": (2, 2), "minus": (2, -2), "gammat": (2, 0), "w": (0, 0)}


def xi_gaussian_cov(ells, cl_tot_1, cl_tot_2, cl_cross_a, cl_cross_b,
                    thetas_rad, kind1="plus", kind2="plus", fsky=1.0):
    """Gaussian covariance of two real-space two-point functions:

        Cov(xi_a(th_i), xi_b(th_j)) = sum_l (2l+1)/(16 pi^2 fsky)
            d^l_{a}(th_i) d^l_{b}(th_j)
            [C^tot_1(l) C^tot_2(l) + C^x_a(l) C^x_b(l)]

    from the Knox per-l covariance of the underlying spectra propagated
    through the curved-sky transforms (kinds: 'plus', 'minus', 'gammat',
    'w').  For an auto-statistic (e.g. xi_+ of one sample) pass
    cl_tot_1 = cl_tot_2 = cl_cross_a = cl_cross_b = C^EE_tot (the familiar
    2 (C+N)^2 / ((2l+1) fsky) per-l weight); for gamma_t pass
    cl_tot_1 = C^gg_tot, cl_tot_2 = C^EE_tot, cl_cross = C^gE.  Noise
    must already be included in the *_tot inputs (shape noise per
    component for EE, shot noise for gg).  EXTENSION: the reference's
    covariance module is harmonic-space only (cov.py:33-63).
    """
    k1 = _XI_MN[kind1]
    k2 = _XI_MN[kind2]
    ls = jnp.asarray(np.asarray(ells), dtype=jnp.result_type(float))
    clsum = (jnp.asarray(cl_tot_1) * jnp.asarray(cl_tot_2)
             + jnp.asarray(cl_cross_a) * jnp.asarray(cl_cross_b))
    wls = (2.0 * ls + 1.0) / (16.0 * jnp.pi**2 * fsky) * clsum
    return wigner_d_outer_sum(ells, wls, thetas_rad, mn1=k1, mn2=k2)


def kappa_to_shear_cl_factor(ells):
    """C^{gamma gamma}_l / C^{kappa kappa}_l = (l+2)(l-1)/(l(l+1)).

    From gamma_lm = sqrt((l+2)!/(l-2)!)/(l(l+1)) kappa_lm; -> 1 at high l
    (the flat-sky identification).  Zero-safe at l = 0, 1 (returns 0 --
    those multipoles carry no shear).
    """
    l = jnp.asarray(ells, dtype=jnp.result_type(float))
    den = l * (l + 1.0)
    return jnp.where(l >= 2, (l + 2.0) * (l - 1.0) / jnp.where(den > 0, den, 1.0), 0.0)


def xi_plus(ells, cl_e, thetas_rad, cl_b=None, input_kind="shear"):
    """xi_+(theta) from an E-mode (and optional B-mode) spectrum.

    input_kind='shear' treats cl_e as C^{gamma gamma,E}; 'convergence'
    treats it as C^{kappa kappa} (e.g. straight from limber.C_kk) and
    applies the full-sky (l+2)(l-1)/(l(l+1)) conversion.
    """
    cl = _to_shear_cl(ells, cl_e, input_kind)
    if cl_b is not None:
        cl = cl + _to_shear_cl(ells, cl_b, input_kind)
    return wigner_d_sum(ells, cl, thetas_rad, mn=(2, 2))


def xi_minus(ells, cl_e, thetas_rad, cl_b=None, input_kind="shear"):
    """xi_-(theta); see :func:`xi_plus`."""
    cl = _to_shear_cl(ells, cl_e, input_kind)
    if cl_b is not None:
        cl = cl - _to_shear_cl(ells, cl_b, input_kind)
    return wigner_d_sum(ells, cl, thetas_rad, mn=(2, -2))


def gamma_t(ells, cl_cross, thetas_rad, input_kind="convergence"):
    """Mean tangential shear gamma_t(theta) around the density tracer.

    cl_cross: the galaxy x lensing cross-spectrum -- C^{g kappa} (Limber
    C_kg output; input_kind='convergence', converted by
    sqrt((l+2)(l-1)/(l(l+1)))) or C^{g E} directly (input_kind='shear').
    """
    cl = jnp.asarray(cl_cross)
    if input_kind == "convergence":
        cl = cl * jnp.sqrt(kappa_to_shear_cl_factor(ells))
    elif input_kind != "shear":
        raise ValueError(f"unknown input_kind {input_kind!r}")
    return wigner_d_sum(ells, cl, thetas_rad, mn=(2, 0))


def _to_shear_cl(ells, cl, input_kind):
    cl = jnp.asarray(cl)
    if input_kind == "convergence":
        return cl * kappa_to_shear_cl_factor(ells)
    if input_kind == "shear":
        return cl
    raise ValueError(f"unknown input_kind {input_kind!r}")
