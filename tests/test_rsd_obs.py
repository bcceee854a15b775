"""AP distortions + Gaussian multipole covariance (models/rsd_obs.py):
pointwise-TNS consistency, AP identities (alpha=1 exactness, isotropic
power-law dilation closed form), scipy-quad covariance oracle, SNR
hand-check, alpha-gradients."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import hmvec_tpu as h
from hmvec_tpu.models import tns, rsd_obs

QMIN, QMAX = 1e-3, 50.0


@pytest.fixture(scope="module")
def setup():
    cos = h.Cosmology(accuracy="low")
    ks_tab = np.geomspace(1e-5, 1e3, 1200)
    pk_tab = np.asarray(cos.P_lin(jnp.asarray(ks_tab),
                                  np.array([0.0])))[0]
    ks = np.geomspace(0.03, 0.25, 20)
    from hmvec_tpu.models import spt
    pv = spt.pk_velocity_1loop(ks, ks_tab, pk_tab, n_q=128, n_x=64,
                               n_q13=256, qmin=QMIN, qmax=QMAX)
    ab = tns.tns_ab_integrals(ks, ks_tab, pk_tab, n_q=128, n_x=64,
                              qmin=QMIN, qmax=QMAX)
    pars = dict(b=1.9, f=0.7, sigma_v=3.5)
    return ks, pv, ab, pars


def _points_fn(ks, pv, ab, pars):
    return lambda kp, mp: rsd_obs.tns_pk_mu_points(
        kp, mp, ks, pv["dd"], pv["dt"], pv["tt"], pars["b"], pars["f"],
        ab, sigma_v=pars["sigma_v"])


def test_points_vs_grid_eval(setup):
    """tns_pk_mu_points at the table nodes reproduces tns_pk_mu."""
    ks, pv, ab, pars = setup
    mus = np.array([-0.8, 0.1, 0.6])
    grid = tns.tns_pk_mu(ks, mus, pv["dd"], pv["dt"], pv["tt"],
                         pars["b"], pars["f"], ab,
                         sigma_v=pars["sigma_v"])
    kg = jnp.broadcast_to(jnp.asarray(ks)[None, :], (3, len(ks)))
    mg = jnp.broadcast_to(jnp.asarray(mus)[:, None], kg.shape)
    pts = _points_fn(ks, pv, ab, pars)(kg, mg)
    np.testing.assert_allclose(np.asarray(pts), np.asarray(grid),
                               rtol=1e-12)


def test_ap_identity_and_dilation(setup):
    """alpha = 1 returns the undistorted multipoles exactly; an
    isotropic dilation of a pure power law has the closed form
    P_obs = A (k/alpha)^n / alpha^3."""
    ks, pv, ab, pars = setup
    fn = _points_fn(ks, pv, ab, pars)
    mp_ap = rsd_obs.ap_multipoles(ks, fn, 1.0, 1.0)
    mp = tns.tns_multipoles(ks, pv["dd"], pv["dt"], pv["tt"], pars["b"],
                            pars["f"], ab, sigma_v=pars["sigma_v"])
    for ell in (0, 2, 4):
        np.testing.assert_allclose(np.asarray(mp_ap[ell]),
                                   np.asarray(mp[ell]), rtol=1e-12)
    A, nidx, al = 5e3, -1.7, 1.07
    plaw = lambda kp, mp_: A * kp**nidx           # noqa: E731
    mp_d = rsd_obs.ap_multipoles(ks, plaw, al, al)
    np.testing.assert_allclose(np.asarray(mp_d[0]),
                               A * (ks / al) ** nidx / al**3, rtol=1e-12)
    assert float(np.max(np.abs(np.asarray(mp_d[2])))) < 1e-9 * A


def test_ap_quadrupole_generation_and_grad(setup):
    """Anisotropic alphas generate a quadrupole from an isotropic
    spectrum; d P0 / d alpha_par is finite and nonzero."""
    ks, pv, ab, pars = setup
    plaw = lambda kp, mp_: 5e3 * kp**-1.7         # noqa: E731
    mp = rsd_obs.ap_multipoles(ks, plaw, 1.1, 0.95)
    assert float(np.min(np.abs(np.asarray(mp[2])))) > 0.0
    fn = _points_fn(ks, pv, ab, pars)
    g = jax.grad(lambda a: jnp.sum(
        rsd_obs.ap_multipoles(ks, fn, a, 1.0)[0]))(jnp.asarray(1.0))
    assert np.isfinite(float(g)) and float(g) != 0.0


def test_covariance_vs_quad_and_structure(setup):
    """Each (l, l', k) entry against adaptive scipy quad; symmetry and
    positive-definiteness; shot-noise-only closed form."""
    from scipy.integrate import quad
    ks, pv, ab, pars = setup
    fn = _points_fn(ks, pv, ab, pars)
    nbar, V = 3e-4, 1e9
    cov = np.asarray(rsd_obs.multipole_covariance(ks, fn, nbar, V))
    assert cov.shape == (3, 3, len(ks))
    np.testing.assert_allclose(cov, np.swapaxes(cov, 0, 1), rtol=1e-12)
    # SPD per k
    for i in (0, len(ks) // 2, len(ks) - 1):
        w = np.linalg.eigvalsh(cov[:, :, i])
        assert np.all(w > 0)
    # quad oracle at one k for every (l, l') pair
    i = len(ks) // 2
    lnk = np.log(ks)
    dki = (np.exp(0.5 * (lnk[i] + lnk[i + 1]))
           - np.exp(0.5 * (lnk[i] + lnk[i - 1])))
    Nk = V * ks[i] ** 2 * dki / (2.0 * np.pi**2)
    legs = {0: lambda m: np.ones_like(m),
            2: lambda m: 0.5 * (3 * m**2 - 1),
            4: lambda m: (35 * m**4 - 30 * m**2 + 3) / 8.0}
    for a, la in enumerate((0, 2, 4)):
        for bidx, lb in enumerate((0, 2, 4)):
            val = quad(lambda m: legs[la](np.array([m]))[0]
                       * legs[lb](np.array([m]))[0]
                       * (float(fn(jnp.asarray([ks[i]]),
                                   jnp.asarray([m]))[0])
                          + 1.0 / nbar) ** 2, 0.0, 1.0, limit=200)[0]
            want = (2 * la + 1) * (2 * lb + 1) * 2.0 / Nk * val
            np.testing.assert_allclose(cov[a, bidx, i], want, rtol=1e-8,
                                       err_msg=f"l={la} l'={lb}")
    # shot-noise-only: C00 = 2 (1/nbar)^2 / Nk exactly
    zerofn = lambda kp, mp_: jnp.zeros_like(kp)   # noqa: E731
    cov0 = np.asarray(rsd_obs.multipole_covariance(
        np.array([ks[i]]), zerofn, nbar, V, dk=np.array([dki]),
        ells=(0,)))
    np.testing.assert_allclose(cov0[0, 0, 0],
                               2.0 / (nbar**2 * Nk), rtol=1e-12)


def test_snr_hand_check(setup):
    """multipole_snr against the explicit per-k quadratic form."""
    ks, pv, ab, pars = setup
    fn = _points_fn(ks, pv, ab, pars)
    nbar, V = 3e-4, 1e9
    cov = rsd_obs.multipole_covariance(ks, fn, nbar, V)
    mp = rsd_obs.ap_multipoles(ks, fn, 1.0, 1.0)
    snr = float(rsd_obs.multipole_snr(mp, cov))
    # explicit
    tot = 0.0
    C = np.asarray(cov)
    for i in range(len(ks)):
        P = np.array([float(np.asarray(mp[ell])[i]) for ell in (0, 2, 4)])
        tot += P @ np.linalg.solve(C[:, :, i], P)
    np.testing.assert_allclose(snr, np.sqrt(tot), rtol=1e-10)
    assert snr > 10.0      # a 1 Gpc^3 survey detects RSD easily