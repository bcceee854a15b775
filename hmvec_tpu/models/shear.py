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
