"""Pseudo-C_l (MASTER) mode coupling — exact sympy-3j oracle + identities.

EXTENSION beyond the reference (fsky-Knox covariance only, cov.py:33-63).
"""

import numpy as np
import pytest

from hmvec_tpu.models import master as M

LMAX = 12

# a random, physically-shaped mask power spectrum
_RNG = np.random.default_rng(0)
WMASK = _RNG.uniform(0.1, 1.0, LMAX + 1) / (1.0 + np.arange(LMAX + 1)) ** 2


@pytest.fixture(scope="module")
def sympy_matrices():
    """All four coupling matrices from exact rational Wigner-3j symbols."""
    from sympy.physics.wigner import wigner_3j

    def tj(l1, l2, l3, m1, m2, m3):
        return float(wigner_3j(l1, l2, l3, m1, m2, m3))

    out = {k: np.zeros((LMAX + 1, LMAX + 1))
           for k in ("00", "02", "++", "--")}
    for l1 in range(LMAX + 1):
        for l2 in range(LMAX + 1):
            acc = dict.fromkeys(out, 0.0)
            for l3 in range(abs(l1 - l2), min(l1 + l2, LMAX) + 1):
                t0 = tj(l1, l2, l3, 0, 0, 0)
                t2 = tj(l1, l2, l3, 2, -2, 0)
                par = (1 + (-1) ** (l1 + l2 + l3)) / 2
                w3 = (2 * l3 + 1) * WMASK[l3]
                acc["00"] += w3 * t0**2
                acc["02"] += w3 * t0 * t2
                acc["++"] += w3 * t2**2 * par
                acc["--"] += w3 * t2**2 * (1 - par)
            for k in out:
                out[k][l1, l2] = (2 * l2 + 1) / (4 * np.pi) * acc[k]
    return out


def test_coupling_vs_exact_3j(sympy_matrices):
    got00 = np.asarray(M.coupling_matrix(LMAX, WMASK, (0, 0)))
    got02 = np.asarray(M.coupling_matrix(LMAX, WMASK, (0, 2)))
    g22 = M.coupling_matrix(LMAX, WMASK, (2, 2))
    np.testing.assert_allclose(got00, sympy_matrices["00"], atol=1e-13)
    np.testing.assert_allclose(got02, sympy_matrices["02"], atol=1e-13)
    np.testing.assert_allclose(np.asarray(g22["++"]), sympy_matrices["++"],
                               atol=1e-13)
    np.testing.assert_allclose(np.asarray(g22["--"]), sympy_matrices["--"],
                               atol=1e-13)


def test_full_sky_is_identity():
    wl = np.zeros(LMAX + 1)
    wl[0] = 4.0 * np.pi          # mask == 1 everywhere
    m00 = np.asarray(M.coupling_matrix(LMAX, wl, (0, 0)))
    np.testing.assert_allclose(m00, np.eye(LMAX + 1), atol=1e-13)
    m22 = M.coupling_matrix(LMAX, wl, (2, 2))
    eye2 = np.eye(LMAX + 1)
    eye2[:2, :2] = 0.0           # l < 2 carries no spin-2 power
    np.testing.assert_allclose(np.asarray(m22["++"]), eye2, atol=1e-13)
    np.testing.assert_allclose(np.asarray(m22["--"]), 0.0, atol=1e-13)


def test_cap_mask_identities():
    theta = np.deg2rad(40.0)
    lmax = 4000
    wl = np.asarray(M.cap_mask_cl(lmax, theta))
    fsky = (1.0 - np.cos(theta)) / 2.0
    # binary-mask identity sum (2l+1) W_l / 4pi -> fsky
    got = np.sum((2 * np.arange(lmax + 1) + 1) * wl) / (4 * np.pi)
    np.testing.assert_allclose(got, fsky, rtol=2e-3)
    # W_l against GL quadrature of int_c^1 P_l dx (nodes mapped into the
    # cap so the integrand is polynomial -> exact)
    from numpy.polynomial.legendre import leggauss
    xs, ws = leggauss(64)
    c = np.cos(theta)
    xm = c + (xs + 1.0) * (1.0 - c) / 2.0
    wm = ws * (1.0 - c) / 2.0
    for l in (0, 1, 5, 37):
        I = np.sum(wm * np.polynomial.legendre.Legendre.basis(l)(xm))
        np.testing.assert_allclose(wl[l], np.pi * I**2, atol=1e-14)


def test_row_sum_approaches_mean_w2():
    # For l1 << lmax every coupled mode is retained, so the row sum equals
    # sum_l3 (2l3+1) W_l3 / 4pi = <w^2> = fsky for a binary mask.
    theta = np.deg2rad(60.0)
    lmax_mask = 100
    wl = np.asarray(M.cap_mask_cl(lmax_mask, theta))
    # the row sum needs every coupled l2 <= l1 + lmax_mask inside the
    # matrix, so build out to lmax = 10 + lmax_mask and check small rows
    m00 = np.asarray(M.coupling_matrix(10 + lmax_mask, wl, (0, 0)))
    mean_w2 = np.sum((2 * np.arange(lmax_mask + 1) + 1) * wl) / (4 * np.pi)
    np.testing.assert_allclose(m00[5].sum(), mean_w2, rtol=1e-9)
    np.testing.assert_allclose(m00[0].sum(), mean_w2, rtol=1e-9)


def test_quadrature_exactness():
    """Doubling the GL node count must not change the matrix (the default
    count already integrates the polynomial integrand exactly)."""
    base = np.asarray(M.coupling_matrix(LMAX, WMASK, (0, 0)))
    xs, ws = np.polynomial.legendre.leggauss(
        2 * ((2 * LMAX + LMAX) // 2 + 1))
    import jax.numpy as jnp
    from hmvec_tpu.models.shear import wigner_d_rows
    xi = np.asarray(M.mask_correlation(WMASK, jnp.asarray(xs)))
    D = np.asarray(wigner_d_rows(LMAX, jnp.asarray(xs), (0, 0)))
    twol2p1 = 2 * np.arange(LMAX + 1) + 1.0
    dense = 0.5 * (D * (ws * xi)[None, :]) @ D.T * twol2p1[None, :]
    np.testing.assert_allclose(base, dense, atol=1e-14)


def test_couple_decouple_round_trip():
    lmax = 60
    theta = np.deg2rad(50.0)
    wl = np.asarray(M.cap_mask_cl(2 * lmax, theta))
    edges = np.array([2, 10, 20, 35, 61])
    B, P = M.bin_operator(lmax, edges)
    # piecewise-constant spectrum -> decoupling is EXACT
    cb_true = np.array([5.0, 3.0, 2.0, 1.2])
    cl = np.asarray(P @ cb_true)
    m00 = M.coupling_matrix(lmax, wl, (0, 0))
    pseudo = M.couple_cls(m00, cl)
    cb = np.asarray(M.decouple_bandpowers(m00, pseudo, lmax, edges))
    np.testing.assert_allclose(cb, cb_true, rtol=1e-10)
    # spin-2 block round trip incl. E/B mixing
    m22 = M.coupling_matrix(lmax, wl, (2, 2))
    ls = np.arange(lmax + 1, dtype=float)
    cle = np.asarray(P @ np.array([4.0, 2.0, 1.0, 0.5]))
    clb = np.asarray(P @ np.array([0.4, 0.3, 0.2, 0.1]))
    pe, pb = M.couple_cls(m22, (cle, clb))
    # coupling really mixes E and B
    assert not np.allclose(pe, np.asarray(m22["++"] @ cle))
    eb = M.decouple_bandpowers(m22, (pe, pb), lmax, edges)
    np.testing.assert_allclose(np.asarray(eb[0]), [4.0, 2.0, 1.0, 0.5],
                               rtol=1e-8)
    np.testing.assert_allclose(np.asarray(eb[1]), [0.4, 0.3, 0.2, 0.1],
                               rtol=1e-8)


def test_bin_operator_identity():
    B, P = M.bin_operator(30, np.array([0, 10, 20, 31]))
    np.testing.assert_allclose(np.asarray(B @ P), np.eye(3), atol=1e-14)
    # weighted variant still satisfies B P = I
    w = 1.0 + np.arange(31.0)
    Bw, Pw = M.bin_operator(30, np.array([0, 10, 20, 31]), weights=w)
    np.testing.assert_allclose(np.asarray(Bw @ Pw), np.eye(3), atol=1e-14)


# ---------------------------------------------------------------------------
# NKA Gaussian covariance vs the EXACT masked-spectrum covariance
# ---------------------------------------------------------------------------

def test_nka_covariance_vs_exact_azimuthal():
    """For an azimuthal (m-preserving) weight mask the covariance of the
    pseudo-spectrum is exactly computable via the Gaunt coupling
    K^m_{l l1}; the NKA must track it to a few % on the diagonal.  The
    same K-route mean also pins the coupling matrix through a fully
    independent formula."""
    from sympy.physics.wigner import wigner_3j

    LMAXC, LMASK = 8, 4
    b = np.zeros(LMASK + 1)
    b[0] = 0.8 * np.sqrt(4 * np.pi)
    b[1:] = [0.35, 0.25, -0.15, 0.1]

    xs, ws = np.polynomial.legendre.leggauss(60)

    def legv(L, x):
        return np.polynomial.legendre.Legendre.basis(L)(x)

    wtheta = sum(b[L] * np.sqrt((2 * L + 1) / (4 * np.pi)) * legv(L, xs)
                 for L in range(LMASK + 1))
    Wmask = b**2 / (2 * np.arange(LMASK + 1) + 1)
    LSQ = 2 * LMASK
    bsq = np.array([2 * np.pi * np.sqrt((2 * L + 1) / (4 * np.pi))
                    * np.sum(ws * wtheta**2 * legv(L, xs))
                    for L in range(LSQ + 1)])
    Wsq = bsq**2 / (2 * np.arange(LSQ + 1) + 1)

    ls = np.arange(LMAXC + 1)
    C = 10.0 / (1.0 + ls) ** 2

    def tj(*a):
        return float(wigner_3j(*a))

    D = {}
    for m in range(LMAXC + 1):
        K = np.zeros((LMAXC + 1, LMAXC + 1))
        for l in range(m, LMAXC + 1):
            for l1 in range(m, LMAXC + 1):
                K[l, l1] = sum(
                    b[L] * (-1) ** m
                    * np.sqrt((2 * l + 1) * (2 * l1 + 1) * (2 * L + 1)
                              / (4 * np.pi))
                    * tj(l1, L, l, 0, 0, 0) * tj(l1, L, l, m, 0, -m)
                    for L in range(LMASK + 1))
        D[m] = K @ np.diag(C) @ K.T

    mean = np.array([sum((2 if m > 0 else 1) * D[m][l, l]
                         for m in range(l + 1)) / (2 * l + 1)
                     for l in range(LMAXC + 1)])
    cov = np.zeros((LMAXC + 1, LMAXC + 1))
    for l in range(LMAXC + 1):
        for lp in range(LMAXC + 1):
            cov[l, lp] = (2.0 / ((2 * l + 1) * (2 * lp + 1))
                          * sum((2 if m > 0 else 1) * D[m][l, lp] ** 2
                                for m in range(min(l, lp) + 1)))

    # independent-formula parity of the coupling matrix (Gaunt route)
    M00 = np.asarray(M.coupling_matrix(LMAXC, Wmask, (0, 0)))
    np.testing.assert_allclose(M00 @ C, mean, rtol=1e-12)

    nka = np.asarray(M.gaussian_covariance_nka(LMAXC, Wsq, C, C, C, C))
    ratio = np.diag(nka) / np.diag(cov)
    assert np.all((ratio > 0.9) & (ratio < 1.1)), ratio
    assert np.linalg.norm(nka - cov) / np.linalg.norm(cov) < 0.1


def test_nka_full_sky_is_knox():
    lmax = 20
    wl = np.zeros(2 * lmax + 1)
    wl[0] = 4.0 * np.pi            # w = 1 -> w^2 = 1
    ls = np.arange(lmax + 1.0)
    c13 = 1.0 / (1 + ls) ** 2
    c24 = 2.0 / (1 + ls) ** 1.5
    c14 = 0.5 / (1 + ls) ** 2.2
    c23 = 0.7 / (1 + ls) ** 1.8
    cov = np.asarray(M.gaussian_covariance_nka(lmax, wl, c13, c24, c14, c23))
    want = np.diag((c13 * c24 + c14 * c23) / (2 * ls + 1))
    np.testing.assert_allclose(cov, want, atol=1e-13)
    # decoupled through full-sky binning = plain bin average of the diag
    edges = np.array([2, 8, 14, 21])
    m00 = M.coupling_matrix(lmax, wl, (0, 0))
    covb = np.asarray(M.decoupled_covariance(m00, cov, lmax, edges))
    B, _ = M.bin_operator(lmax, edges)
    np.testing.assert_allclose(covb, np.asarray(B) @ want @ np.asarray(B).T,
                               atol=1e-13)
