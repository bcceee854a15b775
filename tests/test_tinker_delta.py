"""General-overdensity Tinker mass functions (EXTENSION).

The reference hard-asserts delta == 200 in both Tinker mass functions with
"FIXME: interpolate for any value of delta" (tinker.py:51,71).  The rebuild
closes that FIXME: Tinker-2008 Table-2 / Tinker-2010 Table-4 parameters
interpolated by a natural cubic spline in log10(Delta), jit/grad-safe, with
z-dependent Delta for mdef='vir' (Delta_v(z)/Omega_m(z)).

Oracles: the published table values at the nodes (exact), an INDEPENDENT
scipy CubicSpline twin (twin/halo.py), and the bias-consistency identity
int f(nu) b(nu) dnu = 1 which must hold at ANY overdensity by construction
of the on-device alpha normalization.
"""

import numpy as np
import jax
import jax.numpy as jnp

from hmvec_tpu.models import mass_function as mfm
from hmvec_tpu.models.halo_model import HaloModel
from hmvec_tpu.twin.halo_ext import TwinHaloModelExt

ZS = np.linspace(0.1, 2.0, 4)
KS = np.geomspace(1e-3, 10, 32)
MS = np.geomspace(1e11, 1e16, 24)


def test_delta200_is_reference_path():
    """At the Delta = 200 node the spline returns the published values
    EXACTLY, so the default path is bit-identical to the fixed-parameter
    reference transcription (tinker.py:54-57, :74-77)."""
    b0, g0, p0, e0 = [float(v) for v in mfm.tinker2010_params(200.0)]
    assert (b0, g0, p0, e0) == (0.589, 0.864, -0.729, -0.243)
    A, a, b, c = [float(v) for v in mfm.tinker2008_params(200.0)]
    assert (A, a, b, c) == (0.186, 1.47, 2.57, 1.19)


def test_spline_reproduces_all_table_nodes():
    deltas = np.array([200., 300., 400., 600., 800., 1200., 1600., 2400.,
                       3200.])
    t10 = np.stack([np.asarray(v) for v in mfm.tinker2010_params(deltas)])
    np.testing.assert_allclose(t10.T, mfm._T10_ROWS, rtol=0, atol=1e-14)
    t08 = np.stack([np.asarray(v) for v in mfm.tinker2008_params(deltas)])
    np.testing.assert_allclose(t08.T, mfm._T08_ROWS, rtol=0, atol=1e-14)


def test_midpoint_brackets_monotone_columns():
    """Between nodes the spline stays inside the bracketing values for
    the monotone Table-2 'a' and 'c' columns (no ringing)."""
    for dlo, dhi in [(200., 300.), (600., 800.), (2400., 3200.)]:
        dmid = 10 ** (0.5 * (np.log10(dlo) + np.log10(dhi)))
        _, a_m, _, c_m = [float(v) for v in mfm.tinker2008_params(dmid)]
        _, a_l, _, c_l = [float(v) for v in mfm.tinker2008_params(dlo)]
        _, a_h, _, c_h = [float(v) for v in mfm.tinker2008_params(dhi)]
        assert a_l < a_m < a_h
        assert c_l < c_m < c_h


def test_jax_vs_twin_fixed_delta():
    """nzm/bh at Delta = 400 and 1100 (off-node): jax natural spline vs
    the INDEPENDENT scipy CubicSpline twin."""
    for delta in (400.0, 1100.0):
        hm = HaloModel(ZS, KS, MS, mass_function="tinker", mdef="mean",
                       skip_nfw=True, tinker_delta=delta)
        tw = TwinHaloModelExt(ZS, KS, MS, mass_function="tinker",
                              mdef="mean", tinker_delta=delta)
        np.testing.assert_allclose(np.asarray(hm.nzm), tw.nzm, rtol=1e-10)
        np.testing.assert_allclose(np.asarray(hm.bh), tw.bh, rtol=1e-10)


def test_jax_vs_twin_vir_auto():
    """tinker_delta='auto' with mdef='vir': z-dependent
    Delta_v(z)/Omega_m(z) threads through f(nu), alpha(z) and the bias."""
    hm = HaloModel(ZS, KS, MS, mass_function="tinker", mdef="vir",
                   skip_nfw=True, tinker_delta="auto")
    tw = TwinHaloModelExt(ZS, KS, MS, mass_function="tinker", mdef="vir",
                          tinker_delta="auto")
    np.testing.assert_allclose(np.asarray(hm.nzm), tw.nzm, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(hm.bh), tw.bh, rtol=1e-10)
    # and it actually differs from the clamped-200 reference behavior
    hm200 = HaloModel(ZS, KS, MS, mass_function="tinker", mdef="vir",
                      skip_nfw=True)
    assert np.max(np.abs(np.asarray(hm.nzm) / np.asarray(hm200.nzm) - 1)) \
        > 0.01


def test_default_unchanged():
    """tinker_delta=None keeps the reference's fixed 200 bit-for-bit."""
    hm_def = HaloModel(ZS, KS, MS, mass_function="tinker", mdef="mean",
                       skip_nfw=True)
    hm_200 = HaloModel(ZS, KS, MS, mass_function="tinker", mdef="mean",
                       skip_nfw=True, tinker_delta=200.0)
    np.testing.assert_array_equal(np.asarray(hm_def.nzm),
                                  np.asarray(hm_200.nzm))
    np.testing.assert_array_equal(np.asarray(hm_def.bh),
                                  np.asarray(hm_200.bh))


def test_bias_consistency_any_delta():
    """int f(nu) b(nu) dnu = 1 at every overdensity (the alpha integral
    renormalizes on device -- exactly what Tinker-2010's published alpha
    column enforces at z = 0)."""
    nus = mfm._ALPHA_NUS
    w = mfm._ALPHA_W
    for delta in (300.0, 800.0, 3200.0):
        f = np.asarray(mfm.f_nu(nus[None, :], np.array([[0.0], [1.5]]),
                                delta=delta))
        b = np.asarray(mfm.bias_tinker(jnp.asarray(nus), delta))
        np.testing.assert_allclose((f * b[None, :]) @ w, 1.0, rtol=1e-6)


def test_t08_z_evolution():
    """Tinker-2008 eqs. 5-8: z = 0 matches the z-free path; the amplitude
    decreases with redshift at fixed nu."""
    nu = np.array([0.8, 1.5, 3.0])
    f0 = np.asarray(mfm.simple_f_nu_tinker2008(nu, 350.0))
    fz0 = np.asarray(mfm.simple_f_nu_tinker2008(nu, 350.0, zs=0.0))
    np.testing.assert_allclose(f0, fz0, rtol=1e-14)
    fz2 = np.asarray(mfm.simple_f_nu_tinker2008(np.array([1.5]), 350.0,
                                                zs=2.0))
    assert fz2[0] < f0[1]


def test_grad_through_auto_delta():
    """'auto' makes Delta(z) = Delta_v(z)/Omega_m(z) a function of the
    cosmology; the whole chain must stay differentiable."""
    sigma2 = jnp.asarray(np.linspace(0.3, 4.0, 8)[None, :].repeat(3, 0))
    zs = jnp.asarray(np.linspace(0.1, 1.0, 3))

    def total(omm):
        delta = (178.0 * omm ** 0.45) / omm   # a Delta_v-like traced form
        nzm, bh = mfm.mass_function_grid(
            sigma2, zs, jnp.asarray(MS[:8]), 8.5e10, "tinker", {},
            delta=jnp.full(3, delta))
        return jnp.sum(nzm * 1e14) + jnp.sum(bh)

    g = jax.grad(total)(0.31)
    assert np.isfinite(float(g)) and float(g) != 0.0


# ---- Tinker-2008 as a HaloModel mass-function mode (EXTENSION) ---------

def test_tinker2008_mode_matches_twin():
    """'tinker2008' (nzm, bh) parity vs the independent scipy-spline twin,
    incl. the eq. 5-8 z evolution, at a non-node Delta."""
    h = HaloModel(ZS, KS, ms=MS, mass_function="tinker2008",
                  tinker_delta=350.0)
    t = TwinHaloModelExt(ZS, KS, ms=MS, mass_function="tinker2008",
                         tinker_delta=350.0)
    np.testing.assert_allclose(np.asarray(h.nzm), t.nzm, rtol=1e-8)
    np.testing.assert_allclose(np.asarray(h.bh), t.bh, rtol=1e-8)


def test_tinker2008_z0_delta200_is_published_form():
    """At z ~ 0 and Delta = 200 the mode reduces to the reference's own
    simple_f_nu constants (tinker.py:74-77)."""
    zs = np.array([0.0])
    h = HaloModel(zs, KS, ms=MS, mass_function="tinker2008")
    sigma = np.sqrt(np.asarray(h.sigma2))
    A, a, b, c = 0.186, 1.47, 2.57, 1.19
    f_expected = A * (1.0 + (sigma / b) ** -a) * np.exp(-c / sigma**2)
    ln_sigma_inv = -0.5 * np.log(np.asarray(h.sigma2))
    dln = np.gradient(ln_sigma_inv, np.log(MS), axis=-1)
    nzm_expected = (np.asarray(h.rho_matter_z(0.0)) * f_expected * dln
                    / MS[None, :] ** 2)
    np.testing.assert_allclose(np.asarray(h.nzm), nzm_expected, rtol=1e-10)


def test_tinker2008_tracks_tinker2010_mass_function():
    """The two calibrations agree to tens of percent over the calibrated
    mass range -- a physics envelope, not an identity."""
    h08 = HaloModel(ZS, KS, ms=MS, mass_function="tinker2008")
    h10 = HaloModel(ZS, KS, ms=MS, mass_function="tinker")
    n08, n10 = np.asarray(h08.nzm), np.asarray(h10.nzm)
    sel = (MS[None, :] > 1e12) & (MS[None, :] < 1e15) & (ZS[:, None] < 1.5)
    ratio = n08[np.broadcast_to(sel, n08.shape)] / n10[np.broadcast_to(sel, n10.shape)]
    assert np.all((ratio > 0.5) & (ratio < 2.0)), (ratio.min(), ratio.max())


def test_tinker2008_z_evolution_clamps_at_3():
    """Beyond z = 3 the eq. 5-8 parameter evolution freezes (the paper
    calibrates to z ~ 2.5; matches the module's Tinker-2010 clamp)."""
    f5 = np.asarray(mfm.simple_f_nu_tinker2008(2.0, 300.0, zs=5.0))
    f3 = np.asarray(mfm.simple_f_nu_tinker2008(2.0, 300.0, zs=3.0))
    np.testing.assert_allclose(f5, f3, rtol=0, atol=0)
    f2 = np.asarray(mfm.simple_f_nu_tinker2008(2.0, 300.0, zs=2.0))
    assert not np.allclose(f2, f3)
