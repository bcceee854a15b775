"""RSD Kaiser multipoles, correlation multipoles, pairwise velocity, and
cluster counts (extensions beyond the reference, which has no
redshift-space or abundance APIs).  Oracles: closed-form Kaiser factors
(exact for Gauss-Legendre on the polynomial integrand), scipy quadrature
for FoG multipoles and the j_ell transforms, the twin halo model +
explicit trapz for counts."""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.integrate import quad
from scipy.special import spherical_jn, eval_legendre

from hmvec_tpu.models import rsd
from hmvec_tpu.models.halo_model import HaloModel
from hmvec_tpu.ops.fftlog import fftlog_sphbessel_jl, fftlog_lnkr

KS = np.geomspace(1e-4, 1e2, 1024)


def _toy_pk(ks):
    # smooth, localized in log k: a broad bump resembling P(k)
    return 1e4 * (ks / 0.02) / (1.0 + (ks / 0.02) ** 3.2)


def test_kaiser_multipoles_analytic():
    pk = jnp.asarray(_toy_pk(KS))
    b, f = 1.7, 0.52
    got = rsd.rsd_multipoles(KS, pk, b, f, sigma_v=0.0)
    fac = rsd.kaiser_multipole_factors(b, f)
    for ell in (0, 2, 4):
        np.testing.assert_allclose(np.asarray(got[ell]),
                                   fac[ell] * np.asarray(pk), rtol=1e-12)


def test_fog_multipoles_vs_quad():
    pk = _toy_pk(KS)
    b, f, sv = 2.0, 0.7, 4.5
    got = rsd.rsd_multipoles(KS, jnp.asarray(pk), b, f, sigma_v=sv,
                             fog="lorentzian", n_mu=64)
    for ik in (400, 700):
        k = KS[ik]
        for ell in (0, 2, 4):
            val, _ = quad(
                lambda mu: (b + f * mu**2) ** 2
                / (1.0 + (k * mu * sv) ** 2 / 2.0)
                * eval_legendre(ell, mu) * (2 * ell + 1) / 2.0,
                -1.0, 1.0, limit=200)
            np.testing.assert_allclose(np.asarray(got[ell])[ik],
                                       val * pk[ik], rtol=1e-9)


def test_sphbessel_transform_vs_quad():
    """FFTLog j_ell transform against direct scipy quadrature on a
    log-localized smooth function."""
    def f(k):
        return np.exp(-0.5 * (np.log(k / 0.05) / 0.7) ** 2)

    lnkr0 = fftlog_lnkr(KS, mu=0.5)
    for ell in (1, 2, 4):
        rs, F = fftlog_sphbessel_jl(jnp.asarray(f(KS)), KS, ell,
                                    lnkr=lnkr0)
        rs = np.asarray(rs)
        F = np.asarray(F)
        for r_target in (5.0, 30.0, 120.0):
            i = np.argmin(np.abs(rs - r_target))
            val, _ = quad(lambda k: f(k) * spherical_jn(ell, k * rs[i])
                          * k**2, 1e-4, 1e2, limit=800)
            assert abs(F[i] - val) < 2e-5 * abs(F).max(), (ell, r_target)


def test_correlation_multipoles_common_grid():
    pk = jnp.asarray(_toy_pk(KS))
    b, f = 1.7, 0.52
    pls = rsd.rsd_multipoles(KS, pk, b, f)
    ss, xis = rsd.correlation_multipoles(KS, pls)
    assert set(xis) == {0, 2, 4}
    for ell in (0, 2, 4):
        assert np.all(np.isfinite(np.asarray(xis[ell])))
    # ell = 0 must equal the plain correlation_function of P0
    from hmvec_tpu.ops.fftlog import correlation_function
    rs0, xi0 = correlation_function(KS, pls[0])
    np.testing.assert_allclose(np.asarray(ss), np.asarray(rs0), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(xis[0]), np.asarray(xi0),
                               rtol=1e-10, atol=1e-12)
    # Kaiser quadrupole is negative around the linear regime (squashing)
    rs = np.asarray(ss)
    sel = (rs > 20.0) & (rs < 60.0)
    assert np.all(np.asarray(xis[2])[sel] < 0.0)


def test_pairwise_velocity_vs_quad():
    pk = _toy_pk(KS)
    f, aH = 0.8, 70.0
    rs, v12 = rsd.mean_pairwise_velocity(KS, jnp.asarray(pk), f, aH)
    rs = np.asarray(rs)
    v12 = np.asarray(v12)
    assert np.all(np.isfinite(v12))
    for r_target in (10.0, 40.0):
        i = np.argmin(np.abs(rs - r_target))
        r = rs[i]
        xi, _ = quad(lambda k: k**2 * _toy_pk(k) * spherical_jn(0, k * r),
                     1e-4, 1e2, limit=800)
        xi /= 2.0 * np.pi**2
        xibar, _ = quad(lambda k: k * _toy_pk(k) * spherical_jn(1, k * r),
                        1e-4, 1e2, limit=800)
        xibar *= 3.0 / (2.0 * np.pi**2 * r)
        ref = -(2.0 / 3.0) * f * aH * r * xibar / (1.0 + xi)
        np.testing.assert_allclose(v12[i], ref, rtol=2e-4)
    # infall: v12 < 0 where xi > 0
    sel = (rs > 5.0) & (rs < 50.0)
    assert np.all(v12[sel] < 0.0)


def test_cluster_counts_vs_twin():
    from hmvec_tpu.twin.halo import TwinHaloModel
    zs = np.array([0.2, 0.5, 0.9])
    ks = np.geomspace(1e-3, 1.0, 16)
    ms = np.geomspace(1e13, 1e16, 128)
    hc = HaloModel(zs, ks, ms=ms)
    tw = TwinHaloModel(zs, ks, ms)
    mmin = 3e14
    dndz, ntot = hc.cluster_counts(mmin, fsky=0.4)
    # twin: same grid-level trapz
    w = np.zeros_like(ms)
    dm = np.diff(ms)
    w[:-1] += dm / 2.0
    w[1:] += dm / 2.0
    nofz = (tw.nzm * np.where(ms >= mmin, w, 0.0)[None, :]).sum(-1)
    chi = np.array([tw.comoving_radial_distance(z) for z in zs])
    hz = np.array([tw.h_of_z(z) for z in zs])
    expected = 0.4 * 4.0 * np.pi * chi**2 / hz * nofz
    np.testing.assert_allclose(np.asarray(dndz), expected, rtol=1e-6)
    np.testing.assert_allclose(float(ntot), np.trapezoid(expected, zs),
                               rtol=1e-6)
    # sanity: full-sky massive-cluster counts in a sensible range
    _, n_all = hc.cluster_counts(3e14, fsky=1.0)
    assert 1e2 < float(n_all) < 1e6
