"""Covariance + cluster-lensing + Limber tests."""

import numpy as np
import jax.numpy as jnp

from hmvec_tpu.models.cov import GaussianCov, bin_annuli, knox_cov, shot_noise
from hmvec_tpu.models import background as bgm
from hmvec_tpu.models import limber as limb
from hmvec_tpu.params import merge_params


def _bg():
    return bgm.background(merge_params())


def test_bin_annuli_matches_scipy():
    from scipy.stats import binned_statistic
    ells = np.arange(2, 2000, dtype=np.float64)
    cls = 1.0 / ells**2
    edges = np.array([10, 100, 500, 1500])
    got = np.asarray(bin_annuli(ells, cls, edges))
    numer = binned_statistic(ells, ells * cls, bins=edges,
                             statistic=np.nanmean)[0]
    denom = binned_statistic(ells, ells, bins=edges, statistic=np.nanmean)[0]
    np.testing.assert_allclose(got, numer / denom, rtol=1e-12)


def test_gaussian_cov_knox():
    edges = np.array([10, 100, 500, 1500])
    gc = GaussianCov(edges)
    ells = np.arange(2, 3000, dtype=np.float64)
    gc.add_cls("k", "k", ells, 1e-8 * np.ones_like(ells),
               ellsn=ells, ncls=1e-9 * np.ones_like(ells))
    cov = np.asarray(gc.get_cov("k", "k", "k", "k", fsky=0.4))
    # Knox: 2 (C+N)^2 / ((2l+1) dl fsky)
    want = 2 * (1e-8 + 1e-9) ** 2 / (2 * gc.ls + 1) / gc.dls / 0.4
    np.testing.assert_allclose(cov, want, rtol=1e-10)
    # standalone function agrees
    t = np.asarray(gc.get_tcls("k", "k"))
    np.testing.assert_allclose(np.asarray(knox_cov(t * t / t, t, t, t,
                                                   gc.ls, gc.dls, 0.4)),
                               cov, rtol=1e-12)


def test_shot_noise():
    assert shot_noise(1.0) == 1.0 / 1.18e7


def test_sigma_nfw_against_numeric_projection():
    """Sigma(R) closed form vs brute-force LOS integration of rho_NFW."""
    from hmvec_tpu.models.cluster_lensing import sigma_nfw
    rs, rhoscale = 0.3, 1e15
    R = np.array([0.05, 0.1, 0.3, 0.5, 1.0, 2.0])
    got = np.asarray(sigma_nfw(R, rs, rhoscale))
    los = np.linspace(0, 400 * rs, 400001)
    want = []
    for r in R:
        rad = np.sqrt(r**2 + los**2) / rs
        rho = rhoscale / rad / (1 + rad) ** 2
        want.append(2 * np.trapezoid(rho, los))
    np.testing.assert_allclose(got, np.asarray(want), rtol=2e-3)


def test_kappa_profiles_shapes():
    from hmvec_tpu.models.halo_model import HaloModel
    zs = np.array([0.3, 0.6])
    ks = np.geomspace(1e-3, 20, 200)
    ms = np.geomspace(1e12, 1e16, 40)
    hm = HaloModel(zs, ks, ms=ms)
    thetas = np.geomspace(1e-4, 1e-2, 5)
    concs = np.array([5.0, 4.0])
    k1 = np.asarray(hm.kappa_1h_profiles(thetas, 2e14, concs, zsource=1.5))
    assert k1.shape == (2, 5)
    assert np.all(k1 > 0) and np.all(np.isfinite(k1))
    assert np.all(np.diff(k1, axis=1) < 0)  # decreasing with theta
    k2 = np.asarray(hm.kappa_2h_profiles(thetas, 2e14, zsource=1.5))
    assert k2.shape == (5, 2)
    assert np.all(np.isfinite(k2))


def test_j0_special():
    from hmvec_tpu.ops.special import j0
    import scipy.special as sp
    x = np.geomspace(1e-3, 1e4, 100000)
    got = np.asarray(j0(x))
    assert np.max(np.abs(got - sp.j0(x))) < 1e-11


def test_limber_against_brute_force():
    """limber_integral vs direct quadrature of the same interpolated P."""
    bg = _bg()
    zs = np.linspace(0.1, 2.0, 24)
    ks = np.geomspace(1e-4, 50, 1600)  # dense: isolates interp error O(dlnk^2)
    # analytic toy power: P(z,k) = (1+z) * k^-2
    P = (1 + zs)[:, None] * ks[None, :] ** -2.0
    ells = np.array([50.0, 200.0, 800.0])
    chis = np.asarray(bgm.comoving_radial_distance(bg, zs))
    hzs = np.asarray(bgm.h_of_z(bg, zs))
    W = np.ones_like(zs)
    got = np.asarray(limb.limber_integral(ells, zs, ks, P, zs, W, W, hzs, chis))
    want = []
    for ell in ells:
        kev = (ell + 0.5) / chis
        pv = (1 + zs) * kev**-2.0
        pv[(kev < ks[0]) | (kev > ks[-1])] = np.nan
        integrand = pv * hzs * W * W / chis**2
        want.append(np.trapezoid(integrand, zs))
    np.testing.assert_allclose(got, np.asarray(want), rtol=2e-4)


def test_ckk_positive_sensible():
    bg = _bg()
    zs = np.linspace(0.1, 3.0, 30)
    ks = np.geomspace(1e-4, 20, 300)
    from hmvec_tpu.models.linear_power import plin_approx
    P = np.asarray(plin_approx(bg, zs, ks))
    ells = np.geomspace(30, 2000, 16)
    ckk = np.asarray(limb.C_kk(bg, ells, zs, ks, P, lzs1=1100.0, lzs2=1100.0))
    assert np.all(ckk > 0)
    # CMB lensing convergence power at ell~100 is ~1e-7 (linear theory,
    # z<=3 portion of the kernel)
    assert 1e-9 < ckk[np.argmin(np.abs(ells - 100))] < 5e-7


def test_angular_correlation_vs_scipy_legendre():
    """w(theta) Legendre sum (EXTENSION): the lax.scan upward recurrence
    must match a direct scipy eval_legendre sum at ~1e-13, broadcast
    over leading axes, and reject non-consecutive ells."""
    import pytest
    from scipy.special import eval_legendre
    from hmvec_tpu.models.cov import angular_correlation

    ells = np.arange(2, 400)
    cls = 100.0 / ells**2 * (1.0 + 0.3 * np.sin(ells / 30.0))
    th = np.deg2rad(np.array([0.1, 0.5, 1.0, 3.0, 10.0]))
    w = np.asarray(angular_correlation(ells, cls, th))
    ref = sum((2 * l + 1) / (4 * np.pi) * c * eval_legendre(l, np.cos(th))
              for l, c in zip(ells, cls))
    np.testing.assert_allclose(w, ref, rtol=1e-12)
    wb = np.asarray(angular_correlation(ells, np.stack([cls, 2 * cls]), th))
    assert wb.shape == (2, th.size)
    np.testing.assert_allclose(wb[1], 2.0 * w, rtol=1e-12)
    with pytest.raises(AssertionError, match="consecutive"):
        angular_correlation(np.array([2, 4, 6]), cls[:3], th)
