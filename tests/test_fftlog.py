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
