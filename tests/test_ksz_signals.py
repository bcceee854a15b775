"""kSZ template-cross and CMB auto-spectrum paths (smoke + sanity)."""

import numpy as np

from hmvec_tpu.models.ksz import (get_ksz_template_signal_snapshot,
                                  get_ksz_auto_signal_mafry,
                                  get_ksz_auto_squeezed)

KW = dict(num_kL_bins=16, num_kS_bins=17, num_mu_bins=8,
          ms=np.geomspace(1e10, 1e16, 40), electron_profile_nxs=300,
          electron_profile_xmax=10)


def test_template_signal():
    ells = np.array([500.0, 2000.0, 5000.0])
    cl, fksz, pksz = get_ksz_template_signal_snapshot(
        ells, 10.0, 0.55, 1e-4, bg=2.0, **KW)
    cl = np.asarray(cl)
    assert np.all(np.isfinite(cl))
    assert np.all(cl >= 0)
    assert cl[1] > 0  # in-range ells give signal
    # below k_S range -> zero by the fill rule (reference utils.interp
    # fill_value=0)
    cl_low, *_ = get_ksz_template_signal_snapshot(
        np.array([50.0]), 10.0, 0.55, 1e-4, bg=2.0, **KW)
    assert float(cl_low[0]) == 0.0


def test_auto_mafry_and_squeezed_consistent_scale():
    ells = np.array([2000.0, 4000.0])
    _, cl_m = get_ksz_auto_signal_mafry(
        ells, 10.0, [0.4, 0.8], 1e-4, bg=2.0, num_k_bins=24, num_mu_bins=8,
        ms=np.geomspace(1e10, 1e16, 40), electron_profile_nxs=300,
        electron_profile_xmax=10)
    _, cl_s, _ = get_ksz_auto_squeezed(
        ells, 10.0, [0.4, 0.8], 1e-4, bgs=None, num_k_bins=24, num_mu_bins=8,
        ms=np.geomspace(1e10, 1e16, 40), electron_profile_nxs=300,
        electron_profile_xmax=10)
    cl_m, cl_s = np.asarray(cl_m), np.asarray(cl_s)
    assert np.all(np.isfinite(cl_m)) and np.all(cl_m > 0)
    assert np.all(np.isfinite(cl_s)) and np.all(cl_s > 0)
    # squeezed limit and full integral should agree within a factor ~5
    ratio = cl_m / cl_s
    assert np.all(ratio > 0.2) and np.all(ratio < 5.0), ratio
