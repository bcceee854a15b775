"""Special functions missing from jax.scipy, vectorized for TPU.

* ``sici``: sine/cosine integrals Si(x), Ci(x).  The reference calls
  scipy.special.sici inside the analytic NFW u(k) (hmvec/hmvec.py:350-352);
  here it is a branchless piecewise evaluator -- Chebyshev fits (generated
  offline against scipy by tools/gen_special_coeffs.py) plus an asymptotic
  tail -- pure VPU elementwise math, fully differentiable.

* ``hyp2f1_growth``: the specific Gauss hypergeometric 2F1(5/6,3/2;11/6;-y)
  needed by the Heath growth integral (reference: cosmology.py:297-314),
  via the Pfaff transformation (c-a = 1 makes the transformed series a
  simple geometric-rate sum on [0,1)).

* ``Wkr``: the top-hat window with the reference's small-kR Taylor switch
  (cosmology.py:30-38).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from . import _sici_coeffs as _sc

_EULER_GAMMA = _sc.EULER_GAMMA


def _clenshaw(coef, t):
    """Evaluate a Chebyshev series (numpy coef array) at t in [-1, 1]."""
    b0 = jnp.zeros_like(t)
    b1 = jnp.zeros_like(t)
    for c in coef[::-1]:
        b0, b1 = 2.0 * t * b0 - b1 + c, b0
    # undo the last doubling: f = c0 + t*b... standard Clenshaw tail:
    return b0 - t * b1


def _cheb(coef, x, lo, hi):
    t = (2.0 * x - (lo + hi)) / (hi - lo)
    return _clenshaw(coef, t)


# 13-term asymptotic tails: f(x) ~ (1/x) sum (-1)^n (2n)!/x^{2n},
# g(x) ~ (1/x^2) sum (-1)^n (2n+1)!/x^{2n}
import math  # noqa: E402

_N_ASY = 13
_F_COEF = np.array([(-1.0) ** n * math.factorial(2 * n) for n in range(_N_ASY)])
_G_COEF = np.array([(-1.0) ** n * math.factorial(2 * n + 1) for n in range(_N_ASY)])


def _horner(coef, y):
    acc = jnp.zeros_like(y)
    for c in coef[::-1]:
        acc = acc * y + c
    return acc


def sici_with_trig(x, sinx, cosx):
    """Si(x), Ci(x) for x > 0 given precomputed sin(x), cos(x).

    Splitting out the trig lets callers that already need sin/cos of the
    same argument (e.g. the analytic NFW u(k), profiles.nfw_uk_analytic)
    share the expensive f64 transcendentals.

    Evaluation is ONE dual Clenshaw recurrence of degree 24 with
    per-element coefficient select over three domains (x<=4, 4<x<=10,
    10<x<=40) -- the serial dependency chain is the TPU bottleneck, so
    shorter chains with branchless selects beat separate per-branch series
    -- plus the closed asymptotic tail for x>40.
    """
    x = jnp.asarray(x)
    xs = jnp.maximum(x, jnp.asarray(1e-300, dtype=x.dtype))

    in0 = xs <= 4.0
    in1 = (xs > 4.0) & (xs <= 10.0)

    # domain-mapped Chebyshev variable t in [-1, 1]
    u = jnp.minimum((xs / 4.0) ** 2, 1.0)
    t0 = 2.0 * u - 1.0
    v = 1.0 / jnp.maximum(xs, 4.0)
    lo1, hi1 = 1.0 / 10.0, 1.0 / 4.0
    lo2, hi2 = 1.0 / 40.0, 1.0 / 10.0
    t1 = (2.0 * jnp.clip(v, lo1, hi1) - (lo1 + hi1)) / (hi1 - lo1)
    t2 = (2.0 * jnp.clip(v, lo2, hi2) - (lo2 + hi2)) / (hi2 - lo2)
    t = jnp.where(in0, t0, jnp.where(in1, t1, t2))

    # dual Clenshaw with coefficient select (A: Si/x or x f; B: Ci-reg or x^2 g)
    a0 = jnp.zeros_like(t)
    a1 = jnp.zeros_like(t)
    b0 = jnp.zeros_like(t)
    b1 = jnp.zeros_like(t)
    t2x = 2.0 * t
    for k in range(_sc.SICI_A0.size - 1, -1, -1):
        cA = jnp.where(in0, _sc.SICI_A0[k],
                       jnp.where(in1, _sc.SICI_A1[k], _sc.SICI_A2[k]))
        cB = jnp.where(in0, _sc.SICI_B0[k],
                       jnp.where(in1, _sc.SICI_B1[k], _sc.SICI_B2[k]))
        a0, a1 = t2x * a0 - a1 + cA, a0
        b0, b1 = t2x * b0 - b1 + cB, b0
    A = a0 - t * a1
    B = b0 - t * b1

    # small-x assembly
    si_small = xs * A
    ci_small = _EULER_GAMMA + jnp.log(xs) + B

    # mid-x assembly: f = A/x, g = B/x^2
    f_mid = A * v
    g_mid = B * v * v

    # asymptotic tail
    xl = jnp.maximum(xs, 40.0)
    y = 1.0 / (xl * xl)
    f_asy = _horner(_F_COEF, y) / xl
    g_asy = _horner(_G_COEF, y) * y

    f = jnp.where(xs > 40.0, f_asy, f_mid)
    g = jnp.where(xs > 40.0, g_asy, g_mid)

    si_large = jnp.pi / 2.0 - f * cosx - g * sinx
    ci_large = f * sinx - g * cosx

    si = jnp.where(in0, si_small, si_large)
    ci = jnp.where(in0, ci_small, ci_large)
    return si, ci


def sici(x):
    """Si(x), Ci(x) for x > 0 (vectorized, differentiable).

    Max abs error ~3e-13 (validated against scipy in tests/test_special.py).
    """
    x = jnp.asarray(x)
    xs = jnp.maximum(x, jnp.asarray(1e-300, dtype=x.dtype))
    return sici_with_trig(xs, jnp.sin(xs), jnp.cos(xs))


from . import _hyp_coeffs as _hc  # noqa: E402


def hyp2f1_growth(y):
    """2F1(5/6, 3/2; 11/6; -y) for y >= 0 (Heath growth integral).

    In w = y/(1+y) the function is smooth with its singularity at w=1, so
    four split-domain degree-26 Chebyshev fits (generated offline against
    scipy by tools/gen_hyp_coeffs.py) cover y <= ~32 below 1e-14 -- ONE
    Clenshaw recurrence with a branchless 4-way coefficient select, the
    same pattern as ``sici_with_trig``.  (Round 1 used a 400-term unrolled
    Pfaff series: correct, but the 400-deep serial chain dominated both
    XLA compile time of the fused grad graphs and VPU latency.)  Beyond
    y ~ 32.3 (omm < ~0.03 at a=1) w clamps at 0.97.
    """
    y = jnp.asarray(y)
    w = jnp.clip(y / (1.0 + y), 0.0, _hc.HYP_W_MAX)

    in0 = w <= _hc.HYP_DOM_HI[0]
    in1 = w <= _hc.HYP_DOM_HI[1]
    in2 = w <= _hc.HYP_DOM_HI[2]
    lo = jnp.where(in0, _hc.HYP_DOM_LO[0],
                   jnp.where(in1, _hc.HYP_DOM_LO[1],
                             jnp.where(in2, _hc.HYP_DOM_LO[2],
                                       _hc.HYP_DOM_LO[3])))
    hi = jnp.where(in0, _hc.HYP_DOM_HI[0],
                   jnp.where(in1, _hc.HYP_DOM_HI[1],
                             jnp.where(in2, _hc.HYP_DOM_HI[2],
                                       _hc.HYP_DOM_HI[3])))
    t = (2.0 * w - (lo + hi)) / (hi - lo)

    b0 = jnp.zeros_like(t)
    b1 = jnp.zeros_like(t)
    t2x = 2.0 * t
    for k in range(_hc.HYP_C0.size - 1, -1, -1):
        c = jnp.where(in0, _hc.HYP_C0[k],
                      jnp.where(in1, _hc.HYP_C1[k],
                                jnp.where(in2, _hc.HYP_C2[k],
                                          _hc.HYP_C3[k])))
        b0, b1 = t2x * b0 - b1 + c, b0
    return b0 - t * b1


def j0(x):
    """Bessel J0(x) for x >= 0 (max abs err ~4e-13 vs scipy).

    Needed by the 2-halo cluster-lensing kappa profile (reference imports
    scipy.special.j0 at hmvec.py:599); Chebyshev fit for x<=8 plus
    modulus/phase form beyond.
    """
    x = jnp.abs(jnp.asarray(x))
    # grad-safe clamps: jnp.minimum/maximum split the gradient 50/50 at
    # the exact tie x = 8, which halves dJ0/dx there (j1 below is the
    # autodiff of this function); where() gives the selected branch the
    # full gradient
    inside = x <= 8.0
    u = (jnp.where(inside, x, 8.0) / 8.0) ** 2
    small = _cheb(_sc.J0_SMALL, u, 0.0, 1.0)
    xl = jnp.where(inside, 8.0, x)
    v = 8.0 / xl
    t = 2.0 * v - 1.0
    P = _clenshaw(_sc.J0_P, t)
    Q = _clenshaw(_sc.J0_Q, t)
    large = jnp.sqrt(2.0 / (jnp.pi * xl)) * (P * jnp.cos(xl - jnp.pi / 4.0)
                                             + Q * jnp.sin(xl - jnp.pi / 4.0))
    return jnp.where(x <= 8.0, small, large)


def j1(x):
    """Bessel J1(x) = -dJ0/dx, by autodiff of the Chebyshev/modulus-phase
    J0 above (derivative of a ~4e-13 fit: ~1e-11-class absolute error,
    verified against scipy in tests/test_special.py).  Used by the
    flat-sky disk window of the super-sample C_ell covariance."""
    import jax
    xf = jnp.asarray(x, dtype=jnp.float64)
    flat = jnp.ravel(xf)
    vals = jax.vmap(jax.grad(lambda s: j0(s)))(flat)
    return (-vals).reshape(jnp.shape(xf))


def disk_window(x, taylor_switch=1e-3):
    """Normalized flat-sky disk window W(x) = 2 J1(x)/x, W(0) = 1."""
    xs = jnp.where(jnp.abs(x) < taylor_switch, 1.0, x)
    w = 2.0 * j1(xs) / xs
    return jnp.where(jnp.abs(x) < taylor_switch,
                     1.0 - x**2 / 8.0, w)


def Wkr_taylor(kR):
    xx = kR * kR
    return 1.0 - 0.1 * xx + 0.00357142857143 * xx * xx


def Wkr(k, R, taylor_switch=0.01):
    """Fourier top-hat window W(kR) with small-argument Taylor switch."""
    kR = k * R
    kRs = jnp.where(kR < taylor_switch, 1.0, kR)  # avoid 0/0 in dead branch
    full = 3.0 * (jnp.sin(kRs) - kRs * jnp.cos(kRs)) / kRs**3
    return jnp.where(kR < taylor_switch, Wkr_taylor(kR), full)
