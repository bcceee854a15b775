"""kSZ template-cross and CMB auto-spectrum paths: twin-oracle parity.

Each jax signal path (models/ksz.py) is pinned against an independent
explicit-loop numpy implementation (twin/ksz.py) at scientific tolerance,
plus a pinned golden value per path as cross-session regression (the
reference's own versions are bit-rotted -- stale `pksz.pars` at
ksz.py:632,:847 -- so these integrals cannot be run there).

Round 3: each (jax, twin) pair is computed ONCE in a module-scoped
fixture over a merged ell list and shared by the parity, consistency and
golden tests (the explicit-loop mafry twin dominated the suite's wall
time; per-ell results are independent, so merging ells leaves every
pinned value unchanged).
"""

import numpy as np
import pytest

from hmvec_tpu.models.ksz import (get_ksz_template_signal_snapshot,
                                  get_ksz_auto_signal_mafry,
                                  get_ksz_auto_squeezed)
from hmvec_tpu.twin.ksz import (twin_template_signal, twin_auto_mafry,
                                twin_auto_squeezed)

KW = dict(num_kL_bins=16, num_kS_bins=17, num_mu_bins=8,
          ms=np.geomspace(1e10, 1e16, 40), electron_profile_nxs=300,
          electron_profile_xmax=10)
AUTO_KW = dict(num_k_bins=24, num_mu_bins=8,
               ms=np.geomspace(1e10, 1e16, 40), electron_profile_nxs=300,
               electron_profile_xmax=10)

TMPL_ELLS = np.array([50.0, 500.0, 2000.0, 3000.0, 5000.0])
AUTO_ELLS = np.array([2000.0, 3000.0, 4000.0])


@pytest.fixture(scope="module")
def tmpl_pair():
    cl, fksz, pksz = get_ksz_template_signal_snapshot(
        TMPL_ELLS, 10.0, 0.55, 1e-4, bg=2.0, **KW)
    cl_t = twin_template_signal(TMPL_ELLS, 10.0, 0.55, 1e-4, bg=2.0, **KW)
    return np.asarray(cl), cl_t


@pytest.fixture(scope="module")
def squeezed_pair():
    _, cl_s, _ = get_ksz_auto_squeezed(
        AUTO_ELLS, 10.0, [0.4, 0.8], 1e-4, bgs=None, **AUTO_KW)
    cl_t = twin_auto_squeezed(AUTO_ELLS, 10.0, [0.4, 0.8], 1e-4, bgs=None,
                              **AUTO_KW)
    return np.asarray(cl_s), cl_t


@pytest.fixture(scope="module")
def mafry_pair():
    _, cl_m = get_ksz_auto_signal_mafry(
        AUTO_ELLS, 10.0, [0.4, 0.8], 1e-4, bg=2.0, **AUTO_KW)
    cl_t = twin_auto_mafry(AUTO_ELLS, 10.0, [0.4, 0.8], 1e-4, bg=2.0,
                           **AUTO_KW)
    return np.asarray(cl_m), cl_t


def test_template_signal_vs_twin(tmpl_pair):
    cl, cl_t = tmpl_pair
    assert np.all(np.isfinite(cl))
    assert float(cl[0]) == 0.0  # below k_S range -> zero fill
    np.testing.assert_allclose(cl[1:], cl_t[1:], rtol=1e-6)


def test_template_signal_fid_vs_true_params_vs_twin():
    """Separate fiducial/true parameter sets (reference ksz.py:340-419)."""
    ells = np.array([800.0, 3000.0])
    true = {"omch2": 0.125}
    cl, *_ = get_ksz_template_signal_snapshot(
        ells, 10.0, 0.55, 1e-4, bg=2.0, params=true, **KW)
    cl_t = twin_template_signal(ells, 10.0, 0.55, 1e-4, bg=2.0,
                                params=true, **KW)
    np.testing.assert_allclose(np.asarray(cl), cl_t, rtol=1e-6)


def test_auto_squeezed_vs_twin(squeezed_pair):
    cl_s, cl_t = squeezed_pair
    np.testing.assert_allclose(cl_s, cl_t, rtol=1e-6)


def test_auto_squeezed_template_mode_vs_twin():
    ells = np.array([2000.0, 4000.0])
    bgs = [2.0, 2.2]
    _, cl_s, _ = get_ksz_auto_squeezed(
        ells, 10.0, [0.4, 0.8], 1e-4, bgs=bgs, template=True,
        ngals_mpc3_for_v=2e-4, **AUTO_KW)
    cl_t = twin_auto_squeezed(ells, 10.0, [0.4, 0.8], 1e-4, bgs=bgs,
                              template=True, ngals_mpc3_for_v=2e-4,
                              **AUTO_KW)
    np.testing.assert_allclose(np.asarray(cl_s), cl_t, rtol=1e-6)


def test_auto_mafry_vs_twin(mafry_pair):
    cl_m, cl_t = mafry_pair
    np.testing.assert_allclose(cl_m, cl_t, rtol=1e-6)


def test_auto_mafry_and_squeezed_consistent_scale(mafry_pair,
                                                  squeezed_pair):
    """Physics sanity: squeezed limit within a factor ~5 of the full B28
    integral on this coarse grid."""
    cl_m, _ = mafry_pair
    cl_s, _ = squeezed_pair
    assert np.all(np.isfinite(cl_m)) and np.all(cl_m > 0)
    assert np.all(np.isfinite(cl_s)) and np.all(cl_s > 0)
    ratio = cl_m / cl_s
    assert np.all(ratio > 0.2) and np.all(ratio < 5.0), ratio


def test_golden_values_regression(tmpl_pair, squeezed_pair, mafry_pair):
    """Pinned golden values (computed by both jax and twin at their first
    agreeing revision) guard against silent normalization drift, e.g. a
    factor-of-(2pi)^2 slip in the double integrals.  Per-ell results are
    independent, so the ell=3000 entries of the merged fixtures equal the
    original single-ell evaluations."""
    np.testing.assert_allclose(float(tmpl_pair[0][3]), GOLDEN["template"],
                               rtol=1e-5)
    np.testing.assert_allclose(float(squeezed_pair[0][1]),
                               GOLDEN["squeezed"], rtol=1e-5)
    np.testing.assert_allclose(float(mafry_pair[0][1]), GOLDEN["mafry"],
                               rtol=1e-5)


# Pinned at the first revision where jax and the explicit-loop twin agree
# to <=1e-6 (ell=3000, the grids above); uK^2.
GOLDEN = {
    "template": 1.325585140854451e-07,
    "squeezed": 5.047533065426659e-07,
    "mafry": 4.84835068553666e-07,
}
