"""Resummed flat-sky lensed Cls (correlation-function method).

Oracles: (1) an independent numpy/scipy.special.jn twin; (2) epsilon-
linearization against the INDEPENDENT first-order convolution module
(models/lensed_cls.py -- different algorithm, different grids); (3) the
exact pass-through identity at C_pp = 0; (4) device Bessel kernels vs
scipy on the (l*theta) range the method actually uses.
"""

import numpy as np
import pytest

from hmvec_tpu.models import lensed_cf as lcf
from hmvec_tpu.twin import lensed_cf as tlcf

LMAX = 1200


@pytest.fixture(scope="module")
def spectra():
    """Planck-like smooth toy spectra: acoustic-modulated damped TT/EE/TE
    (not physical to the percent, but with realistic magnitudes, peak
    structure, and a C_pp ~ l^-4 tail -- what the method's accuracy
    actually depends on)."""
    ls = np.arange(LMAX + 1, dtype=np.float64)
    lsafe = np.maximum(ls, 1.0)
    # D_l ~ 5000 muK^2 scale with acoustic wiggles and damping
    env = 5000.0 * np.exp(-((ls / 1600.0) ** 2)) / (1.0 + (ls / 2300.0) ** 4)
    osc = 1.0 + 0.3 * np.cos(ls / 95.0)
    dl_tt = env * osc
    dl_ee = 0.04 * env * (1.0 + 0.6 * np.sin(ls / 95.0)) * (ls / 500.0) ** 2 \
        / (1.0 + (ls / 500.0) ** 2)
    dl_te = 0.25 * np.sqrt(np.abs(dl_tt * dl_ee)) * np.cos(ls / 95.0 + 0.7)
    fac = 2.0 * np.pi / (lsafe * (lsafe + 1.0))
    cl = np.zeros((LMAX + 1, 4))
    cl[:, 0] = dl_tt * fac
    cl[:, 1] = dl_ee * fac
    cl[:, 3] = dl_te * fac
    cl[:2] = 0.0
    # C_pp with the standard ~l^-4 shape scaled to sigma(inf)^2 ~ (2.6')^2
    clpp = 2e-8 / (lsafe**4 + 2e4)
    clpp[:2] = 0.0
    return cl, clpp


def test_matches_scipy_twin(spectra):
    cl, clpp = spectra
    got = np.asarray(lcf.lens_cls_flat_sky_resummed(cl, clpp, n_theta=3000))
    want = tlcf.lens_cls_flat_sky_resummed(cl, clpp, n_theta=3000)
    # same method, independent Bessel evaluations and contraction order
    scale = np.abs(want).max(axis=0)
    np.testing.assert_allclose(got, want, atol=1e-10 * scale[None, :].max(),
                               rtol=1e-9)


def test_passthrough_at_zero_potential(spectra):
    cl, clpp = spectra
    out = np.asarray(lcf.lens_cls_flat_sky_resummed(
        cl, np.zeros_like(clpp), n_theta=1500))
    np.testing.assert_allclose(out[2:], cl[2:], rtol=0.0, atol=1e-300)


def test_linearization_matches_first_order_module(spectra):
    """As C_pp -> 0 the resummed method must linearize to the independent
    first-order convolution (different algorithm: l'-space convolution at
    spline nodes vs CF quadrature)."""
    from hmvec_tpu.models.lensed_cls import lens_cls_flat_sky
    cl, clpp = spectra
    eps = 1e-2
    res = np.asarray(lcf.lens_cls_flat_sky_resummed(cl, eps * clpp,
                                                    n_theta=3000))
    first = lens_cls_flat_sky(cl, eps * clpp)
    ls = np.arange(LMAX + 1)
    sel = (ls >= 40) & (ls <= 900)   # away from both methods' edges
    for col in range(4):
        d_res = (res[sel, col] - cl[sel, col])
        d_fo = (first[sel, col] - cl[sel, col])
        # measured agreement is 0.1-0.5%; the atol floor absorbs the
        # correction's own zero crossings (where a ratio is meaningless)
        np.testing.assert_allclose(
            d_res, d_fo, rtol=0.02, atol=0.02 * np.abs(d_fo).max())


def test_resummation_bounded_in_tail(spectra):
    """At full lensing strength the resummed damping stays bounded
    (e^{-l^2 sigma^2/2} in (0, 1]) while producing the standard
    peak-smoothing signature: lensing REDUCES |d ln C/d ln l| contrast."""
    cl, clpp = spectra
    res = np.asarray(lcf.lens_cls_flat_sky_resummed(cl, 40.0 * clpp,
                                                    n_theta=3000))
    ls = np.arange(LMAX + 1)
    sel = (ls >= 100) & (ls <= 1000)
    # damping-tail suppression: power moves out of the tail, but the
    # resummed factor e^{-l^2 sigma^2/2} keeps the result bounded and
    # positive (the first-order (1 - l^2 R) prefactor has no such bound)
    tail = (ls >= 1100)
    assert np.all(res[tail, 0] < cl[tail, 0])
    assert np.all(res[tail, 0] > 0.2 * cl[tail, 0])
    # total power at fixed l stays positive and finite
    assert np.all(np.isfinite(res)) and np.all(res[sel, 0] > 0)
    # lensed BB generated from EE is positive across the acoustic range
    assert np.all(res[sel, 2] > 0)


def test_device_bessel_vs_scipy():
    from scipy.special import jn
    x = np.concatenate([np.geomspace(1e-4, 0.19, 40),
                        np.linspace(0.2, 30.0, 200),
                        np.geomspace(30.0, 4000.0, 200)])
    import jax.numpy as jnp
    j0, j2, j4, j6 = (np.asarray(a)
                      for a in lcf._jn_even_upto6(jnp.asarray(x)))
    np.testing.assert_allclose(j0, jn(0, x), atol=5e-13)
    np.testing.assert_allclose(j2, jn(2, x), atol=1e-10)
    np.testing.assert_allclose(j4, jn(4, x), atol=1e-9)
    np.testing.assert_allclose(j6, jn(6, x), atol=1e-8)


def test_jit_and_grad(spectra):
    import jax
    import jax.numpy as jnp
    cl, clpp = spectra
    cl_s, clpp_s = cl[:301], clpp[:301]

    @jax.jit
    def f(amp):
        out = lcf.lens_cls_flat_sky_resummed(cl_s, amp * clpp_s,
                                             n_theta=600)
        return jnp.sum(out[:, 0] ** 2)

    g = jax.grad(f)(jnp.asarray(1.0))
    assert np.isfinite(float(g)) and float(g) != 0.0
