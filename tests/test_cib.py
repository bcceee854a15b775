"""CIB halo model (extension; Shang et al 2012 forms): explicit-loop twin
parity, SED identities, cross-tracer pairings, Limber projection
properties (Cauchy-Schwarz across frequencies)."""

import numpy as np
import jax.numpy as jnp
import pytest

from hmvec_tpu.models.halo_model import HaloModel
from hmvec_tpu.models import cib as cibm
from hmvec_tpu.twin import cib as tcib

ZS = np.array([0.5, 1.5, 3.0])
KS = np.geomspace(1e-3, 20.0, 64)   # canonical nk=64 (shape-shared traces)
MS = np.geomspace(1e10, 1e15, 80)
P = dict(cibm.default_cib_params)


@pytest.fixture(scope="module")
def hc():
    h = HaloModel(ZS, KS, ms=MS)
    h.add_cib_tracer("cib545", 545.0)
    h.add_cib_tracer("cib217", 217.0)
    return h


def test_sed_identities():
    """Graybody continuity at nu0, Rayleigh-Jeans slope beta+2 at low
    frequency, exact -gamma power law above the transition, and the
    log-slope matching condition at nu0."""
    z = 1.0
    xstar = tcib.sed_transition_x(P["cib_beta"], P["cib_gamma"])
    td = P["cib_T0"] * (1.0 + z) ** P["cib_alpha"]
    nu0_obs = xstar * td / tcib._HK_GHZ / (1.0 + z)  # observed GHz
    # continuity (evaluate just below/above)
    lo = float(cibm.sed_graybody(nu0_obs * 0.9999, np.array([z]), P)[0])
    hi = float(cibm.sed_graybody(nu0_obs * 1.0001, np.array([z]), P)[0])
    assert abs(hi / lo - 1.0) < 2e-3
    # log-slope matching at nu0: numeric slope both sides ~ -gamma
    eps = 1.003
    sl_lo = (np.log(cibm.sed_graybody(nu0_obs / eps, np.array([z]), P)[0]
                    / cibm.sed_graybody(nu0_obs / eps**2, np.array([z]), P)[0])
             / np.log(eps))
    assert abs(sl_lo - (-P["cib_gamma"])) < 0.06  # graybody curvature
    # Rayleigh-Jeans: Theta ~ nu^(beta+2)
    s = (np.log(cibm.sed_graybody(2.0, np.array([z]), P)[0]
                / cibm.sed_graybody(1.0, np.array([z]), P)[0]) / np.log(2.0))
    assert abs(s - (P["cib_beta"] + 2.0)) < 0.02
    # exact power law above nu0
    r = (cibm.sed_graybody(nu0_obs * 4.0, np.array([z]), P)[0]
         / cibm.sed_graybody(nu0_obs * 2.0, np.array([z]), P)[0])
    np.testing.assert_allclose(float(r), 2.0 ** (-P["cib_gamma"]), rtol=1e-10)


def test_tracer_twin_parity(hc):
    tr = hc.cib_tracers["cib545"]
    us = np.asarray(hc.uk_profiles["nfw"])
    fc_tw, fs_tw, _ = tcib.tracer_grids(MS, ZS, 545.0, us, P)
    np.testing.assert_allclose(np.asarray(tr.fc), fc_tw, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(tr.fs), fs_tw, rtol=1e-8)


def test_power_twin_parity(hc):
    t1 = hc.cib_tracers["cib545"]
    t2 = hc.cib_tracers["cib217"]
    us = np.asarray(hc.uk_profiles["nfw"])
    nzm = np.asarray(hc.nzm)
    bh = np.asarray(hc.bh)
    pzk = np.asarray(hc.Pzk)
    fc1, fs1 = np.asarray(t1.fc), np.asarray(t1.fs)
    fc2, fs2 = np.asarray(t2.fc), np.asarray(t2.fs)
    p1_tw = tcib.p1h(fc1, fs1, us, fc2, fs2, us, nzm, MS, KS,
                     kstar=hc.p["kstar_damping"])
    p2_tw = tcib.p2h(fc1, fs1, us, fc2, fs2, us, nzm, bh, MS, pzk)
    np.testing.assert_allclose(np.asarray(hc.get_power_1halo("cib545", "cib217")),
                               p1_tw, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(hc.get_power_2halo("cib545", "cib217")),
                               p2_tw, rtol=1e-9)


def test_cross_tracer_pairings(hc):
    """CIB x matter, CIB x pressure, CIB x HOD all flow through the
    generic machinery and give finite, mostly-positive spectra."""
    hc2 = hc
    if "y" not in hc2.pk_profiles:
        hc2.add_battaglia_pres_profile("y")
    if "g" not in hc2.hods:
        hc2.add_hod("g", ngal=np.full(len(ZS), 1e-4))
    for other in ("nfw", "y", "g"):
        p = np.asarray(hc2.get_power("cib545", other))
        assert p.shape == (len(ZS), len(KS))
        assert np.all(np.isfinite(p))
        assert np.all(p > 0.0)


def test_cib_cls_properties(hc):
    ells = np.geomspace(50, 3000, 24)
    c55 = np.asarray(hc.get_cib_cls(ells, "cib545"))
    c22 = np.asarray(hc.get_cib_cls(ells, "cib217"))
    c25 = np.asarray(hc.get_cib_cls(ells, "cib545", "cib217"))
    assert np.all(c55 > 0) and np.all(c22 > 0) and np.all(c25 > 0)
    # Cauchy-Schwarz across frequencies
    assert np.all(c25**2 <= c55 * c22 * (1.0 + 1e-12))
    # 545 GHz is brighter than 217 at these z (SED rising)
    assert np.all(c55 > c22)
    # 2-halo plateau at low ell, then decreasing C_l in the 1-halo regime
    assert np.all(np.diff(np.log(c55))[ells[:-1] > 300] < 0.0)


def test_mean_intensity_monotone_in_L0(hc):
    i545 = float(hc.get_cib_mean_intensity("cib545"))
    assert np.isfinite(i545) and i545 > 0
    jbar = np.asarray(hc.get_cib_mean_emissivity("cib545"))
    assert jbar.shape == (len(ZS),)
    # explicit trapz cross-check of the intensity integral
    hz = np.asarray(hc.h_of_z(hc.zs))
    expected = np.trapezoid(jbar / (1.0 + ZS) / hz, ZS)
    np.testing.assert_allclose(i545, expected, rtol=1e-10)
    # linear in L0
    tr2 = cibm.build_cib_tracer(MS, ZS, 545.0, hc.uk_profiles["nfw"],
                                params={"cib_L0": 2.0})
    np.testing.assert_allclose(
        np.asarray(cibm.mean_emissivity(hc.nzm, MS, tr2)), 2.0 * jbar,
        rtol=1e-12)
