"""FFTLog profile transform (experimental log-sampled path)."""

import numpy as np
import jax.numpy as jnp

from hmvec_tpu.ops.fftlog import fftlog_sine_j0, fftlog_profile_transform
from hmvec_tpu.models.profiles import nfw_uk_analytic


def test_gaussian_oracle_spectral_interior():
    """int x^2 e^{-x^2/2} j0(kx) dx = sqrt(pi/2) e^{-k^2/2}: spectral in
    the interior of the reciprocal window."""
    xs = np.geomspace(1e-4, 1e3, 1024)
    fx = jnp.asarray(np.exp(-(xs**2) / 2.0))[None, None, :]
    ks, F = fftlog_sine_j0(fx, xs)
    ks, F = np.asarray(ks), np.asarray(F)[0, 0]
    want = np.sqrt(np.pi / 2.0) * np.exp(-(ks**2) / 2.0)
    sel = (ks > 0.5) & (ks < 20)
    assert np.max(np.abs(F[sel] - want[sel])) < 1e-9


def test_nfw_fftlog_accuracy_budget():
    """Hard-truncation NFW: low-k Taylor branch exact; mid/high-k limited
    by cutoff ringing (documented ~1e-3)."""
    zs = np.array([0.3, 1.2])
    nm = 10
    rng = np.random.default_rng(1)
    cs = jnp.asarray(rng.uniform(2, 15, (2, nm)))
    rss = jnp.asarray(rng.uniform(0.02, 1.0, (2, nm)))
    ks_t = np.geomspace(1e-3, 100, 200)

    def rho(x):
        return jnp.broadcast_to(1.0 / (x * (1 + x) ** 2), (2, nm, x.size))

    _, u_log = fftlog_profile_transform(rho, cs, rss, zs, ks_t,
                                        xmin=1e-6, xmax=1e3, n=2048)
    u_exact = np.asarray(nfw_uk_analytic(ks_t, zs, cs, rss))
    err = np.abs(np.asarray(u_log) - u_exact)
    assert err.max() < 1e-2, err.max()  # worst case at the Taylor/FFTLog seam
    # low-k (Taylor branch) is tight
    sel_lowk = u_exact > 0.995
    assert err[sel_lowk].max() < 1e-4, err[sel_lowk].max()


def test_steep_profile_high_accuracy():
    """A Battaglia-like steep profile (beta~4.5): negligible cutoff jump,
    so the FFTLog branch is accurate through mid-k."""
    zs = np.array([0.5])
    cs = jnp.asarray([[4.0]])
    rss = jnp.asarray([[0.4]])
    ks_t = np.geomspace(1e-3, 50, 150)

    def rho_steep_j(x):
        return jnp.broadcast_to(x**-0.2 * (1 + x) ** -4.3, (1, 1, x.size))

    _, u_log = fftlog_profile_transform(rho_steep_j, cs, rss, zs, ks_t,
                                        xmin=1e-6, xmax=1e3, n=2048)
    # brute-force truncated quadrature oracle
    xs = np.linspace(1e-6, 4.0, 400000)
    rho = xs**-0.2 * (1 + xs) ** -4.3
    m = np.trapezoid(4 * np.pi * xs**2 * rho, xs)
    s = 0.4 * 1.5  # rs (1+z)
    u_ref = []
    for k in ks_t:
        kp = k * s
        u_ref.append(np.trapezoid(4 * np.pi * xs**2 * rho
                                  * np.sinc(kp * xs / np.pi), xs) / m)
    u_ref = np.asarray(u_ref)
    err = np.abs(np.asarray(u_log)[0, 0] - u_ref)
    assert err.max() < 5e-4, err.max()


def test_correlation_function_gaussian_oracle():
    """xi(r) from P(k) = exp(-a k^2) has the closed form
    exp(-r^2/4a) / (8 pi^{3/2} a^{3/2}); FFTLog must hit it to ~2e-4
    (window-aliasing floor) over the physically-supported r range, and
    broadcast over leading axes."""
    import hmvec_tpu as hm
    a = 4.0
    ks = np.geomspace(1e-4, 1e3, 2048)
    rs, xi = hm.correlation_function(ks, np.exp(-a * ks**2))
    rs, xi = np.asarray(rs), np.asarray(xi)
    xi_ref = np.exp(-rs**2 / (4 * a)) / (8 * np.pi**1.5 * a**1.5)
    sel = (rs > 0.05) & (rs < 10.0)
    assert np.max(np.abs(xi[sel] / xi_ref[sel] - 1.0)) < 1e-3
    _, xib = hm.correlation_function(ks, np.stack([np.exp(-a * ks**2)] * 3))
    assert np.asarray(xib).shape == (3, ks.size)
    np.testing.assert_allclose(np.asarray(xib)[1], xi, rtol=0, atol=0)


def test_correlation_function_bao_peak_and_quad():
    """Real linear P(k): the BAO peak must appear at r ~ 100-110 Mpc/h in
    r^2 xi(r), and three scipy piecewise-quad cross-checks must agree to
    a few e-4 (the quadrature itself is oscillation-limited there)."""
    from scipy.integrate import quad
    from scipy.interpolate import interp1d
    import hmvec_tpu as hm

    c = hm.Cosmology()
    h = c.p["H0"] / 100.0
    ks = np.geomspace(1e-4, 1e2, 4096)
    pk = np.asarray(c.P_mm_linear(np.array([0.0]), ks))[0]
    rs, xi = hm.correlation_function(ks, pk)
    rs, xi = np.asarray(rs), np.asarray(xi)
    m = (rs > 110.0) & (rs < 190.0)
    rpk_h = rs[m][np.argmax(rs[m] ** 2 * xi[m])] * h
    assert 95.0 < rpk_h < 112.0, rpk_h   # EH98 sound horizon, Mpc/h

    lnpk = interp1d(np.log(ks), np.log(pk), kind="cubic")

    def integrand(k, r):
        return (k**2 * np.exp(lnpk(np.log(k)))
                * np.sinc(k * r / np.pi) / (2 * np.pi**2))

    for r in (20.0, 50.0):
        val = sum(quad(integrand, lo, hi, args=(r,), limit=400)[0]
                  for lo, hi in zip([1e-4, 0.1, 1.0, 10.0],
                                    [0.1, 1.0, 10.0, 60.0]))
        assert abs(np.interp(r, rs, xi) / val - 1.0) < 1e-3, r


def test_projected_correlation_oracles():
    """w_p(R) (EXTENSION): closed-form Gaussian transform
    e^{-R^2/4a}/(4 pi a) at the xi-accuracy floor, and a direct
    line-of-sight xi quadrature on a real linear spectrum."""
    from scipy.interpolate import interp1d
    import hmvec_tpu as hm
    from hmvec_tpu.ops.fftlog import (projected_correlation,
                                      correlation_function)

    a = 4.0
    ks = np.geomspace(1e-4, 1e3, 2048)
    rs, wp = projected_correlation(ks, np.exp(-a * ks**2))
    rs, wp = np.asarray(rs), np.asarray(wp)
    ref = np.exp(-rs**2 / (4 * a)) / (4 * np.pi * a)
    sel = (rs > 0.05) & (rs < 8.0)
    assert np.max(np.abs(wp[sel] / ref[sel] - 1.0)) < 2e-3

    c = hm.Cosmology()
    ks2 = np.geomspace(1e-4, 1e2, 4096)
    pk2 = np.asarray(c.P_mm_linear(np.array([0.0]), ks2))[0]
    rs2, xi2 = correlation_function(ks2, pk2)
    rsp, wp2 = projected_correlation(ks2, pk2)
    rs2, xi2 = np.asarray(rs2), np.asarray(xi2)
    rsp, wp2 = np.asarray(rsp), np.asarray(wp2)
    xif = interp1d(rs2, xi2, kind="cubic", bounds_error=False,
                   fill_value=0.0)
    for R in (5.0, 20.0):
        pis = np.linspace(0.0, 2000.0, 60000)
        val = 2.0 * np.trapezoid(xif(np.sqrt(R**2 + pis**2)), pis)
        assert abs(np.interp(R, rsp, wp2) / val - 1.0) < 2e-3, R
    # batched leading axis passes through
    _, wpb = projected_correlation(ks, np.stack([np.exp(-a * ks**2)] * 2))
    assert np.asarray(wpb).shape == (2, ks.size)
