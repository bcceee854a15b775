"""Zheng-05 five-parameter HOD (EXTENSION beyond the reference, which
ships only the Behroozi-SMHM threshold family): analytic-oracle parity,
structural properties, the ngal -> log10 Mmin solve, grad safety, and
end-to-end galaxy power through the family-agnostic HaloModel machinery."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.special import erf as serf

from hmvec_tpu.models.halo_model import HaloModel
from hmvec_tpu.models.hod import (avg_nc_zheng05, avg_ns_zheng05,
                                  build_hod_zheng05)

ZS = np.array([0.3, 0.55, 0.8])     # canonical nz=3
KS = np.geomspace(1e-3, 10.0, 64)
MS = np.geomspace(1e10, 1e16, 80)


@pytest.fixture(scope="module")
def hc():
    return HaloModel(ZS, KS, ms=MS)


def test_occupation_shapes_and_oracle(hc):
    """<Nc>, <Ns>, ngal, bg against a direct numpy/scipy evaluation of
    the Zheng-05 formulas (erf + power law with the M0 cutoff)."""
    hod = hc.add_hod("zg", family="zheng05")
    l10m = np.log10(MS)
    Nc_ref = 0.5 * (1.0 + serf((l10m - 12.0) / 0.2))[None, :]
    M0, M1 = 10.0**11.7, 10.0**13.0
    Ns_ref = Nc_ref * np.where(MS > M0, np.maximum(MS - M0, 0.0) / M1,
                               0.0) ** 1.0
    np.testing.assert_allclose(np.asarray(hod["Nc"]),
                               np.broadcast_to(Nc_ref, (ZS.size, MS.size)),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(hod["Ns"]),
                               np.broadcast_to(Ns_ref, (ZS.size, MS.size)),
                               rtol=1e-12)
    nzm, bh = np.asarray(hc.nzm), np.asarray(hc.bh)
    ngal_ref = np.trapezoid(nzm * (Nc_ref + Ns_ref), MS, axis=-1)
    bg_ref = np.trapezoid(nzm * (Nc_ref + Ns_ref) * bh, MS,
                          axis=-1) / ngal_ref
    np.testing.assert_allclose(np.asarray(hod["ngal"]), ngal_ref,
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(hod["bg"]), bg_ref, rtol=1e-12)
    # structure: Nc monotone 0 -> 1; Ns zero below M0, ~ (M/M1)^alpha at
    # high mass; bias > 1 for a Mmin ~ 1e12 sample
    Nc = np.asarray(hod["Nc"])[0]
    assert Nc[0] < 1e-10 and abs(Nc[-1] - 1.0) < 1e-10
    assert np.all(np.diff(Nc) >= 0)
    Ns = np.asarray(hod["Ns"])[0]
    assert np.all(Ns[MS <= M0] == 0.0)
    assert abs(Ns[-1] / (MS[-1] / M1) - 1.0) < 2e-3   # M >> M0 asymptote
    assert np.all(np.asarray(hod["bg"]) > 1.0)


def test_ngal_solve_and_grad(hc):
    """ngal -> log10 Mmin bisection hits the target (HALO-mass bracket,
    not the Leauthaud stellar one), and the occupation responds to
    Mmin with a finite negative gradient."""
    target = np.full(ZS.size, 1e-4)
    hod = hc.add_hod("zg_solved", family="zheng05", ngal=target)
    np.testing.assert_allclose(np.asarray(hod["ngal"]), target, rtol=1e-8)
    mmin = np.asarray(hod["log10mthresh"]).ravel()
    assert 13.0 < mmin[0] < 16.0 and mmin[0] > mmin[1]  # rarer at low z?
    hp = {k: v for k, v in hc.p.items() if k.startswith("hod_")}

    def loss(l10mmin):
        hp2 = dict(hp)
        hp2["hod_zheng_log10Mmin"] = l10mmin
        return build_hod_zheng05(hc.zs, MS, hc.nzm, hc.bh, hp2).ngal[0]

    g = float(jax.grad(loss)(12.0))
    assert np.isfinite(g) and g < 0.0


def test_power_spectra_through_family_agnostic_machinery(hc):
    """P_gg(1h+2h) and P_gm through get_power with the zheng05 family:
    finite, positive, 2h -> bg^2 P_mm at large scales."""
    hc2 = HaloModel(ZS, KS, ms=MS)
    hc2.add_hod("g", family="zheng05")
    pgg = np.asarray(hc2.get_power("g", verbose=False))
    pgm = np.asarray(hc2.get_power("g", "nfw", verbose=False))
    pmm = np.asarray(hc2.get_power("nfw", verbose=False))
    assert np.isfinite(pgg).all() and np.isfinite(pgm).all()
    assert np.all(pgg[:, KS < 0.05] > 0)
    bg = np.asarray(hc2.hods["g"]["bg"])
    r = pgg[:, 1] / pmm[:, 1]
    np.testing.assert_allclose(r, bg**2, rtol=0.05)
    rx = pgm[:, 1] / pmm[:, 1]
    np.testing.assert_allclose(rx, bg, rtol=0.05)


def test_family_validation(hc):
    with pytest.raises(ValueError, match="zheng05"):
        hc.add_hod("bad", family="nope")
