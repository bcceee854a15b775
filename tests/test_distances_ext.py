"""Extended background quantities: conformal time, recombination, BAO,
CMB lensing Limber."""

import numpy as np

from hmvec_tpu.models.cosmology import Cosmology
from hmvec_tpu.models import distances_ext as dx


def test_conformal_time_values():
    c = Cosmology()
    eta0 = float(dx.conformal_age(c.bg))
    # Planck-like conformal age ~ 14000-14500 Mpc
    assert 13000 < eta0 < 15500, eta0
    eta1 = float(dx.conformal_time(c.bg, 1.0))
    assert eta1 < eta0
    # eta(0) - eta(z) == comoving distance chi(z)
    chi1 = float(c.comoving_radial_distance(1.0))
    assert abs((eta0 - eta1) - chi1) / chi1 < 1e-6


def test_z_of_tau_roundtrip():
    c = Cosmology()
    z = np.array([0.5, 2.0, 20.0])
    tau = np.asarray(dx.conformal_time(c.bg, z))
    z_back = np.asarray(dx.z_of_tau(c.bg, tau))
    np.testing.assert_allclose(z_back, z, rtol=1e-6)


def test_z_star_and_tau_star():
    c = Cosmology()
    zstar = float(dx.z_star_hu_sugiyama(c.bg))
    assert 1050 < zstar < 1120, zstar
    taustar = float(c.get_tau_star())
    # conformal time at recombination ~ 280 Mpc
    assert 200 < taustar < 400, taustar


def test_rs_drag():
    c = Cosmology()
    rs = float(dx.rs_drag_eh(c.bg))
    assert 140 < rs < 160, rs  # ~147 Mpc for Planck-like params


def test_bao_rs_dv():
    c = Cosmology()
    r = np.asarray(c.get_bao_rs_dV(np.array([0.15, 0.57])))
    # BOSS-era values: rs/DV(0.15) ~ 0.22, rs/DV(0.57) ~ 0.073
    assert 0.18 < r[0] < 0.26, r
    assert 0.06 < r[1] < 0.09, r


def test_cmb_lensing_limber():
    c = Cosmology()
    ls, cl = c.cmb_lensing_limber(400)
    ls, cl = np.asarray(ls), np.asarray(cl)
    assert ls[0] == 2 and ls[-1] == 400
    assert np.all(np.isfinite(cl)) and np.all(cl > 0)
    # C_L^kappakappa at L=100: [L(L+1)]^2 C_phi/4-convention value ~1e-7
    v = cl[ls == 100][0]
    assert 1e-9 < v < 1e-6, v
