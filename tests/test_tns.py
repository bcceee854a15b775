"""TNS redshift-space A/B terms (models/tns.py): parity of the
sympy-derived reduced kernels against the independent explicit-3D
twin, exact structural identities (bilinearity in P, mu-parity,
Scoccimarro limit), physical magnitude envelopes, autodiff."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hmvec_tpu.models.cosmology import Cosmology
from hmvec_tpu.models import tns, rsd, spt
from hmvec_tpu.twin import tns as ttns

QMIN, QMAX = 1e-3, 50.0


@pytest.fixture(scope="module")
def ptab():
    c = Cosmology(accuracy="low")
    ks_tab = np.geomspace(1e-5, 1e3, 1200)
    pk_tab = np.asarray(c.P_lin(jnp.asarray(ks_tab), np.array([0.0])))[0]
    return ks_tab, pk_tab


@pytest.fixture(scope="module")
def ab(ptab):
    ks_tab, pk_tab = ptab
    ks = np.array([0.08, 0.25])
    return ks, tns.tns_ab_integrals(ks, ks_tab, pk_tab,
                                    qmin=QMIN, qmax=QMAX)


def test_ab_vs_direct_3d_twin(ptab, ab):
    """The whole sympy derivation chain (tree-level B_sigma expansion,
    q -> -q remapping, analytic phi-average, (m,n) collection, codegen)
    against the explicit-vector twin that does none of those steps."""
    ks_tab, pk_tab = ptab
    ks, abv = ab
    for mu, f in ((0.6, 0.55), (-0.35, 0.9)):
        Aj = np.asarray(tns.tns_a_term(ks, mu, f, abv))
        Bj = np.asarray(tns.tns_b_term(ks, mu, f, abv))
        for i, k in enumerate(ks):
            At = ttns.tns_a_direct(k, mu, f, ks_tab, pk_tab, QMIN, QMAX,
                                   n_q=257, n_y=257)
            Bt = ttns.tns_b_direct(k, mu, f, ks_tab, pk_tab, QMIN, QMAX,
                                   n_q=257, n_y=257)
            # both sides self-converge to ~2e-5 of a common value;
            # at these (fast) node counts the gap is ~1e-4
            np.testing.assert_allclose(Aj[i], At, rtol=5e-4,
                                       err_msg=f"A k={k} mu={mu}")
            np.testing.assert_allclose(Bj[i], Bt, rtol=5e-4,
                                       err_msg=f"B k={k} mu={mu}")


def test_b_term_separate_velocity_tables(ptab):
    """pdt_tab/ptt_tab legs thread through correctly (twin parity with
    deliberately different dt/tt tables)."""
    ks_tab, pk_tab = ptab
    pdt = pk_tab * (1.0 + 0.1 * np.tanh(np.log(ks_tab / 0.3)))
    ptt = pk_tab * (1.0 - 0.15 * np.tanh(np.log(ks_tab / 0.2)))
    ks = np.array([0.2])
    abv = tns.tns_ab_integrals(ks, ks_tab, pk_tab, pdt_tab=pdt,
                               ptt_tab=ptt, qmin=QMIN, qmax=QMAX)
    mu, f = 0.7, 0.6
    Bj = float(np.asarray(tns.tns_b_term(ks, mu, f, abv))[0])
    Bt = ttns.tns_b_direct(0.2, mu, f, ks_tab, pk_tab, QMIN, QMAX,
                           pdt_tab=pdt, ptt_tab=ptt, n_q=257, n_y=257)
    np.testing.assert_allclose(Bj, Bt, rtol=5e-4)


def test_structural_identities(ptab, ab):
    """A and B are exactly bilinear in P; P_s is even in mu; f -> 0
    kills both terms; b**3/b**4 bias scaling is exact."""
    ks_tab, pk_tab = ptab
    ks, abv = ab
    ab2 = tns.tns_ab_integrals(ks, ks_tab, 2.0 * pk_tab,
                               qmin=QMIN, qmax=QMAX)
    for key in abv["A"]:
        np.testing.assert_allclose(np.asarray(ab2["A"][key]),
                                   4.0 * np.asarray(abv["A"][key]),
                                   rtol=1e-12)
    for key in abv["B"]:
        np.testing.assert_allclose(np.asarray(ab2["B"][key]),
                                   4.0 * np.asarray(abv["B"][key]),
                                   rtol=1e-12)
    mu, f, b = 0.44, 0.61, 1.8
    # mu-parity
    np.testing.assert_allclose(
        np.asarray(tns.tns_a_term(ks, -mu, f, abv)),
        np.asarray(tns.tns_a_term(ks, mu, f, abv)), rtol=1e-13)
    np.testing.assert_allclose(
        np.asarray(tns.tns_b_term(ks, -mu, f, abv)),
        np.asarray(tns.tns_b_term(ks, mu, f, abv)), rtol=1e-13)
    # f -> 0
    assert float(np.max(np.abs(np.asarray(
        tns.tns_a_term(ks, mu, 0.0, abv))))) == 0.0
    assert float(np.max(np.abs(np.asarray(
        tns.tns_b_term(ks, mu, 0.0, abv))))) == 0.0
    # exact bias scaling: b^3 A(beta) must equal the beta-evaluated
    # b=1 term times b^3 (same integrals, different polynomial point)
    beta = f / b
    np.testing.assert_allclose(
        np.asarray(tns.tns_a_term(ks, mu, f, abv, b=b)),
        b**3 * np.asarray(tns.tns_a_term(ks, mu, beta, abv, b=1.0)),
        rtol=1e-13)
    np.testing.assert_allclose(
        np.asarray(tns.tns_b_term(ks, mu, f, abv, b=b)),
        b**4 * np.asarray(tns.tns_b_term(ks, mu, beta, abv, b=1.0)),
        rtol=1e-13)


def test_scoccimarro_limit_and_multipoles(ptab, ab):
    """Zeroing the A/B integrals reduces tns_pk_mu to the Scoccimarro
    form exactly; multipoles integrate consistently with a dense
    trapezoid cross-check."""
    ks_tab, pk_tab = ptab
    ks, abv = ab
    lnk, lnp = np.log(ks_tab), np.log(pk_tab)
    P = jnp.asarray(np.exp(np.interp(np.log(ks), lnk, lnp)))
    zero = {"A": {k_: jnp.zeros_like(v) for k_, v in abv["A"].items()},
            "B": {k_: jnp.zeros_like(v) for k_, v in abv["B"].items()}}
    mus = np.linspace(-0.9, 0.9, 7)
    b, f, sv = 1.6, 0.52, 4.0
    got = tns.tns_pk_mu(ks, mus, P, P, P, b, f, zero, sigma_v=sv)
    want = rsd.scoccimarro_pk_mu(ks, mus, P, P, P, b, f, sigma_v=sv)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-12)
    # multipoles: GL result vs dense Simpson of the same pk_mu
    # (GL is converged: identical at n_mu = 16/32/64)
    from scipy.integrate import simpson
    mp = tns.tns_multipoles(ks, P, P, P, b, f, abv, sigma_v=sv)
    mud = np.linspace(-1.0, 1.0, 4001)
    psd = np.asarray(tns.tns_pk_mu(ks, mud, P, P, P, b, f, abv,
                                   sigma_v=sv))
    for ell in (0, 2, 4):
        leg = np.polynomial.legendre.Legendre.basis(ell)(mud)
        want_l = simpson(psd * leg[:, None], x=mud, axis=0) \
            * (2 * ell + 1) / 2.0
        np.testing.assert_allclose(np.asarray(mp[ell]), want_l,
                                   rtol=2e-6)


def test_physical_magnitudes_and_grad(ptab):
    """A is a few-to-ten percent of the Kaiser monopole at quasi-linear
    k for Planck-like P (the regime the term matters in BOSS/DESI
    analyses), |B| < |A| there, both vanish toward low k relative to
    P; end-to-end tns_power runs and is differentiable in f."""
    ks_tab, pk_tab = ptab
    ks = np.array([0.02, 0.2])
    abv = tns.tns_ab_integrals(ks, ks_tab, pk_tab, qmin=QMIN, qmax=QMAX)
    f = 0.53
    lnk, lnp = np.log(ks_tab), np.log(pk_tab)
    P = np.exp(np.interp(np.log(ks), lnk, lnp))
    A = np.asarray(tns.tns_a_term(ks, 0.6, f, abv))
    B = np.asarray(tns.tns_b_term(ks, 0.6, f, abv))
    # k = 0.2/Mpc ~ 0.29 h/Mpc is strongly quasi-linear for a z=0
    # spectrum: the A term is a large O(tens of %) correction there
    assert 0.005 < abs(A[1]) / P[1] < 1.5
    assert abs(B[1]) < abs(A[1])
    assert abs(A[0]) / P[0] < 0.1 * abs(A[1]) / P[1]

    mp, diag = tns.tns_power(ks, ks_tab, pk_tab, b=1.9, f=f,
                             n_q=128, n_x=64, qmin=QMIN, qmax=QMAX)
    assert np.all(np.isfinite(np.asarray(mp[0])))
    assert float(mp[0][0]) > 0.0
    assert float(diag["sigma_v"]) > 0.0

    # UV-conditioning guard (regression): on the FULL table support
    # (qmax/k ~ 5e4 at k = 0.02) the uncapped A-term kernels cancel
    # catastrophically; the r_max cap must keep the default evaluation
    # at the converged value, and the low-k monopole Kaiser-positive.
    ab_full = tns.tns_ab_integrals(ks, ks_tab, pk_tab)     # table range
    ab_capped = tns.tns_ab_integrals(ks, ks_tab, pk_tab,
                                     qmin=QMIN, qmax=QMAX)
    A_full = np.asarray(tns.tns_a_term(ks, 0.6, f, ab_full))
    A_capped = np.asarray(tns.tns_a_term(ks, 0.6, f, ab_capped))
    np.testing.assert_allclose(A_full[0], A_capped[0], rtol=2e-2)
    mp_lo, _ = tns.tns_power(np.array([0.01, 0.02]), ks_tab, pk_tab,
                             b=2.0, f=0.75, n_q=128, n_x=64)
    assert np.all(np.asarray(mp_lo[0]) > 0.0)

    def loss(fv):
        abv_ = tns.tns_ab_integrals(ks, ks_tab, pk_tab, n_q=64, n_x=32,
                                    qmin=QMIN, qmax=QMAX)
        return jnp.sum(tns.tns_a_term(ks, 0.6, fv, abv_)
                       + tns.tns_b_term(ks, 0.6, fv, abv_))
    g = jax.grad(loss)(jnp.asarray(f))
    assert np.isfinite(float(g)) and float(g) != 0.0
