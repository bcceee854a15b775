"""HMcode-2016 ('mead') nonlinear power: structural/property tests.

No CAMB exists in this environment, so these pin the model's *structure*
(linear limit, nonlinear boost, feedback direction, Takahashi agreement
envelope, jit/grad) plus a self-generated golden regression value; see the
provenance note in models/hmcode.py.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hmvec_tpu.models.cosmology import Cosmology
from hmvec_tpu.models.hmcode import hmcode_power, hmcode_nonlinear, _KG
from hmvec_tpu.models.halofit import halofit_power


@pytest.fixture(scope="module")
def cosmo():
    return Cosmology()


@pytest.fixture(scope="module")
def pnl_grid(cosmo):
    zs = np.array([0.0, 0.5, 1.0, 2.0])
    ks = np.geomspace(1e-4, 50.0, 160)
    return zs, ks, np.asarray(hmcode_power(cosmo, zs, ks))


def test_linear_limit_and_boost(cosmo, pnl_grid):
    zs, ks, pnl = pnl_grid
    plin = np.asarray(cosmo.P_lin(ks, zs))
    r = pnl / plin
    # two-halo damping vanishes at k -> 0 (tanh^2 ~ k^2)
    assert np.allclose(r[:, 0], 1.0, atol=1e-4)
    # strong nonlinear boost at small scales, decreasing with z
    i1 = np.argmin(np.abs(ks - 1.0))
    assert np.all(r[:, i1] > 2.0)
    assert np.all(np.diff(r[:, i1]) < 0)
    assert np.all(np.isfinite(pnl)) and np.all(pnl > 0)


def test_agreement_with_takahashi(cosmo, pnl_grid):
    """HMcode and Takahashi-2012 are independent fits to simulations; they
    agree at the O(10%) level for k <~ 1 and O(50%) out to k ~ 10
    (Mead 2015 fig. 2 comparisons)."""
    zs, ks, pnl = pnl_grid
    ptak = np.asarray(halofit_power(cosmo, zs, ks))
    sel_mid = (ks > 0.03) & (ks < 1.0)
    r = (pnl / ptak)[:, sel_mid]
    assert r.max() < 1.25 and r.min() > 0.80, (r.min(), r.max())
    sel_hi = (ks >= 1.0) & (ks < 10.0)
    rh = (pnl / ptak)[:, sel_hi]
    assert rh.max() < 1.7 and rh.min() > 0.55, (rh.min(), rh.max())


def test_feedback_knob_direction(cosmo):
    """Lower concentration amplitude A = stronger baryonic feedback =
    suppressed small-scale power (Mead 2015 fig. 6), no effect at k->0."""
    zs = np.array([0.0, 1.0])
    ks = np.geomspace(1e-3, 10.0, 64)
    p_dm = np.asarray(hmcode_power(cosmo, zs, ks, A_bary=3.13))
    p_fb = np.asarray(hmcode_power(cosmo, zs, ks, A_bary=2.0))
    i5 = np.argmin(np.abs(ks - 5.0))
    supp = (p_fb / p_dm)[:, i5]
    assert np.all(supp < 0.9) and np.all(supp > 0.4)
    assert np.allclose((p_fb / p_dm)[:, 0], 1.0, atol=1e-3)


def test_amplitude_scaling(cosmo):
    """Higher As -> more nonlinear structure: the boost at k=1 grows."""
    zs = np.array([0.0])
    ks = np.geomspace(1e-3, 2.0, 48)
    chi = Cosmology({"As": 2.6e-9})
    p_lo = np.asarray(hmcode_power(cosmo, zs, ks))
    p_hi = np.asarray(hmcode_power(chi, zs, ks))
    l_lo = np.asarray(cosmo.P_lin(ks, zs))
    l_hi = np.asarray(chi.P_lin(ks, zs))
    i1 = np.argmin(np.abs(ks - 1.0))
    assert (p_hi / l_hi)[0, i1] > (p_lo / l_lo)[0, i1]


def test_halomodel_mead_dispatch():
    """HaloModel(halofit='mead') populates nPzk through HMcode (the
    reference's default CAMB halofit_version, cosmology.py:174)."""
    from hmvec_tpu.models.halo_model import HaloModel
    zs = np.array([0.0, 1.0])
    ks = np.geomspace(1e-3, 10.0, 40)
    ms = np.geomspace(1e11, 1e15, 24)
    hm = HaloModel(zs, ks, ms=ms, halofit="mead")
    c = Cosmology()
    expect = np.asarray(hmcode_power(c, zs, ks))
    assert np.allclose(np.asarray(hm.nPzk), expect, rtol=1e-10)


def test_jit_and_grad(cosmo):
    zs = jnp.asarray([0.0, 1.0])
    ks = jnp.geomspace(1e-2, 5.0, 24)
    bg = cosmo.bg
    kgj = jnp.asarray(_KG)

    def total(a_bary):
        plin_g = cosmo.engine.plin(bg, zs, kgj)
        plin = cosmo.engine.plin(bg, zs, ks)
        # num_iter=20: enough for finite-grad structure, 3x less to compile
        pnl = hmcode_nonlinear(bg, zs, ks, plin_g, plin,
                               jnp.asarray(0.8484), A_bary=a_bary,
                               num_iter=20)
        return jnp.sum(jnp.log(pnl))

    f = jax.jit(total)
    v = f(jnp.asarray(3.13))
    g = jax.grad(total)(jnp.asarray(3.13))
    assert np.isfinite(float(v)) and np.isfinite(float(g))
    assert float(g) > 0.0  # more concentration -> more power


def test_golden_regression(cosmo):
    """Self-generated golden values (regression guard, not external truth)."""
    ks = np.array([0.1, 1.0, 10.0])
    pnl = np.asarray(hmcode_power(cosmo, np.array([0.0]), ks))[0]
    golden = np.array([1.227140839321e+04, 9.475194951900e+02,
                       1.857015624000e+01])
    assert np.allclose(pnl, golden, rtol=5e-4), pnl


def test_hmcode_wcdm_smoke():
    """w0/wa cosmologies: background terms exact, growth keeps the LCDM
    closed form (documented deviation, MIGRATION.md #7) -- results must
    stay finite and deviate from LCDM in the right direction."""
    ks = np.geomspace(1e-3, 10.0, 48)
    zs = np.array([0.0, 1.0])
    p_l = np.asarray(hmcode_power(Cosmology(), zs, ks))
    p_w = np.asarray(hmcode_power(Cosmology({"w0": -0.9, "wa": 0.2}),
                                  zs, ks))
    assert np.all(np.isfinite(p_w)) and np.all(p_w > 0)
    assert np.max(np.abs(p_w / p_l - 1.0)) > 1e-3  # w actually matters
