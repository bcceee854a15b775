"""One-loop SPT (models/spt.py): twin parity, kernel exactness vs
sympy, IR-cancellation (Galilean invariance), quadratic-in-P gradient
identity, EdS z-scaling of the Cosmology method."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hmvec_tpu.models.cosmology import Cosmology
from hmvec_tpu.models import spt
from hmvec_tpu.twin import spt as tspt

QMIN, QMAX = 1e-4, 1e2


@pytest.fixture(scope="module")
def ptab():
    c = Cosmology(accuracy="low")
    ks_tab = np.geomspace(1e-5, 1e3, 1200)
    pk_tab = np.asarray(c.P_lin(jnp.asarray(ks_tab), np.array([0.0])))[0]
    return c, ks_tab, pk_tab


def test_p22_p13_vs_twin(ptab):
    _, ks_tab, pk_tab = ptab
    ks = np.array([0.05, 0.1, 0.2, 0.5])
    P22 = np.asarray(spt.p22(ks, ks_tab, pk_tab, qmin=QMIN, qmax=QMAX))
    P13 = np.asarray(spt.p13(ks, ks_tab, pk_tab, qmin=QMIN, qmax=QMAX))
    for i, k in enumerate(ks):
        t22 = tspt.p22_twin(k, ks_tab, pk_tab, QMIN, QMAX)
        t13 = tspt.p13_twin(k, ks_tab, pk_tab, QMIN, QMAX)
        # jax GL self-converged to ~3e-6; the twin Simpson limits at
        # ~1e-4 at the highest k
        np.testing.assert_allclose(P22[i], t22, rtol=3e-4)
        np.testing.assert_allclose(P13[i], t13, rtol=1e-5)


def test_f13_vs_sympy():
    """The switched f13 against exact sympy evaluation, including points
    inside every Taylor window."""
    import sympy as sp
    r_s = sp.symbols('r', positive=True)
    expr = (12 / r_s**2 - 158 + 100 * r_s**2 - 42 * r_s**4
            + sp.Rational(3) / r_s**3 * (r_s**2 - 1) ** 3
            * (7 * r_s**2 + 2) * sp.log((1 + r_s) / sp.Abs(1 - r_s)))
    rs = [1e-4, 1e-3, 9e-3, 1.1e-2, 0.1, 0.5, 0.9999, 0.99999,
          1.00001, 1.0001, 2.0, 10.0, 49.0, 51.0, 200.0, 1e3]
    got = np.asarray(spt.f13(jnp.asarray(rs)))
    for i, rv in enumerate(rs):
        exact = float(expr.subs(r_s, sp.Float(rv, 50)).evalf(50))
        np.testing.assert_allclose(got[i], exact, rtol=1e-9,
                                   err_msg=f"r={rv}")


def test_f2_y_substitution_identity():
    """F2^2 in (r, y) variables equals the textbook (r, x) form."""
    rng = np.random.default_rng(0)
    r = rng.uniform(0.1, 3.0, 50)
    x = rng.uniform(-0.99, 0.99, 50)
    y = np.sqrt(1.0 + r**2 - 2.0 * r * x)
    F2x = (5.0 / 7.0 + (x - r) / (2.0 * y) * (r / y + y / r)
           + 2.0 / 7.0 * (x - r) ** 2 / y**2) ** 2
    np.testing.assert_allclose(tspt.f2_squared_of_y(r, y), F2x,
                               rtol=1e-12)


def test_ir_cancellation(ptab):
    """Galilean invariance: the qmin-sensitivity of P22 and P13 cancels
    in the sum."""
    _, ks_tab, pk_tab = ptab
    k = np.array([0.2])

    def parts(qmin):
        a = float(spt.p22(k, ks_tab, pk_tab, qmin=qmin, qmax=QMAX)[0])
        b = float(spt.p13(k, ks_tab, pk_tab, qmin=qmin, qmax=QMAX)[0])
        return a, b

    a1, b1 = parts(1e-4)
    a2, b2 = parts(3e-3)
    move_a, move_b = abs(a2 - a1), abs(b2 - b1)
    move_sum = abs((a2 + b2) - (a1 + b1))
    assert move_a > 10.0 * move_sum
    assert move_b > 10.0 * move_sum
    # the individual IR shifts are equal and opposite to ~1%
    np.testing.assert_allclose(a2 - a1, -(b2 - b1),
                               rtol=2e-2)


def test_quadratic_gradient_identity(ptab):
    """Loops are quadratic functionals of P: d/dA P1loop(A*P)|_{A=1}
    = P_lin + 2 (P22 + P13)."""
    _, ks_tab, pk_tab = ptab
    ks = jnp.asarray([0.1, 0.3])

    def f(A):
        return spt.p1loop(ks, ks_tab, A * jnp.asarray(pk_tab),
                          n_q=128, n_x=64, n_q13=256,
                          qmin=QMIN, qmax=QMAX)

    g = jax.jacfwd(f)(1.0)
    tot, parts = spt.p1loop(ks, ks_tab, pk_tab, n_q=128, n_x=64,
                            n_q13=256, qmin=QMIN, qmax=QMAX,
                            return_parts=True)
    expect = parts["lin"] + 2.0 * (parts["p22"] + parts["p13"])
    np.testing.assert_allclose(np.asarray(g), np.asarray(expect),
                               rtol=1e-10)


def test_cosmology_method_and_z_scaling(ptab):
    """P_mm_1loop: z=0 equals the module, and the loop part scales as
    D^4 (EdS kernels)."""
    c, ks_tab, pk_tab = ptab
    ks = np.geomspace(0.02, 0.4, 12)
    P0 = np.asarray(c.P_mm_1loop(np.array([0.0]), ks))[0]
    direct = np.asarray(spt.p1loop(ks, ks_tab, pk_tab,
                                   qmin=QMIN, qmax=QMAX))
    np.testing.assert_allclose(P0, direct, rtol=2e-3)

    zs = np.array([0.0, 1.0])
    P = np.asarray(c.P_mm_1loop(zs, ks))
    Plin = np.asarray(c.P_lin(jnp.asarray(ks), zs))
    D = np.asarray(c.D_growth(1.0 / (1.0 + zs)))
    loop_ratio = (P[1] - Plin[1]) / (P[0] - Plin[0])
    np.testing.assert_allclose(loop_ratio, (D[1] / D[0]) ** 4,
                               rtol=1e-6)
    # physical magnitude: ~tens of percent one-loop boost at
    # k = 0.2/Mpc, z=0
    i = np.argmin(np.abs(ks - 0.2))
    assert 1.2 < P0[i] / Plin[0][i] < 2.5
