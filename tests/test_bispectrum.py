"""Halo-model bispectra: twin parity, SPT identities, physical limits.

Extension beyond the reference (which ships power spectra only).  The
oracle is the explicit-loop numpy twin (hmvec_tpu/twin/bispectrum.py);
the tree-level and low-k consistency limits are independent physics
checks that do not share code with either side.
"""

import numpy as np
import pytest

from hmvec_tpu.models.halo_model import HaloModel
from hmvec_tpu.models import bispectrum as bsp
from hmvec_tpu.twin.halo_ext import TwinHaloModelExt
from hmvec_tpu.twin import bispectrum as tbsp

ZS = np.array([0.3, 0.65, 1.0])    # canonical nz=3 (shape-shared traces)
MS = np.geomspace(2e10, 1e16, 80)  # canonical nm=80
KS = np.geomspace(1e-3, 30.0, 64)  # canonical nk=64


@pytest.fixture(scope="module")
def pair():
    hm = HaloModel(ZS, KS, ms=MS)
    hm.add_battaglia_pres_profile("y", family="pres", nxs=500, xmax=12)
    hm.add_hod("g", ngal=np.full(ZS.size, 1e-4))
    tw = TwinHaloModelExt(ZS, KS, MS)
    tw.add_battaglia_pres_profile("y", family="pres", nxs=500, xmax=12)
    tw.add_hod("g", ngal=np.full(ZS.size, 1e-4))
    return hm, tw


# ------------------------------------------------------------- SPT kernel

def test_f2_identities():
    # equilateral: mu = -1/2, F2 = 5/7 - 1/2 + 1/14 = 2/7 exactly
    np.testing.assert_allclose(float(bsp.f2_kernel(0.2, 0.2, 0.2)),
                               2.0 / 7.0, rtol=1e-14)
    # closure angle for a right triangle k3^2 = k1^2 + k2^2 -> mu = 0
    np.testing.assert_allclose(
        float(bsp.mu12_from_closure(0.3, 0.4, 0.5)), 0.0, atol=1e-14)
    # folded/collinear: k1 = k2 = k3/2 -> mu = +1, F2 = 5/7+1+2/7 = 2
    np.testing.assert_allclose(float(bsp.f2_kernel(0.1, 0.1, 0.2)),
                               2.0, rtol=1e-13)


def test_b2_press_schechter_closed_form():
    # PS (a=1, p=0): b2 = (8/21)(nu^2-1)/dc + nu^2(nu^2-3)/dc^2 (Mo-White)
    dc = 1.686
    params = {"st_a": 1.0, "st_p": 0.0, "st_deltac": dc}
    sigma2 = np.array([0.25, 1.0, 4.0])
    nu2 = dc**2 / sigma2
    expected = (8.0 / 21.0) * (nu2 - 1.0) / dc + nu2 * (nu2 - 3.0) / dc**2
    got = np.asarray(bsp.b2_sheth_torman(sigma2, params))
    np.testing.assert_allclose(got, expected, rtol=1e-13)
    # twin uses the same closed form independently transcribed
    np.testing.assert_allclose(tbsp.b2_sheth_torman(sigma2, params),
                               expected, rtol=1e-13)
    # high-peak asymptote: b2 -> a^2 nu^4 / dc^2
    params_st = {"st_a": 0.707, "st_p": 0.3, "st_deltac": dc}
    s2 = 1e-4
    lead = (0.707 * dc**2 / s2) ** 2 / dc**2
    assert abs(float(bsp.b2_sheth_torman(s2, params_st)) / lead - 1.0) < 0.05


# ------------------------------------------------------------ twin parity

SCALENE = (np.array([0.05, 0.1, 0.8]),
           np.array([0.07, 0.2, 1.1]),
           np.array([0.09, 0.25, 1.5]))


@pytest.mark.parametrize("terms", ["1h", "2h", "3h"])
def test_matter_bispectrum_parity(pair, terms):
    hm, tw = pair
    k1, k2, k3 = SCALENE
    bj = np.asarray(hm.get_bispectrum(k1, k2, k3, "nfw", terms=terms))
    bt = tbsp.bispectrum(tw, "nfw", "nfw", "nfw", k1, k2, k3, terms=terms)
    np.testing.assert_allclose(bj, bt, rtol=1e-8)


def test_equilateral_total_parity(pair):
    hm, tw = pair
    keq = KS[8:-8:6]
    bj = np.asarray(hm.get_bispectrum(keq, name="nfw", terms="total"))
    bt = tbsp.bispectrum(tw, "nfw", "nfw", "nfw", keq, keq, keq, "total")
    np.testing.assert_allclose(bj, bt, rtol=1e-8)


def test_hod_bispectrum_parity(pair):
    hm, tw = pair
    k1, k2, k3 = SCALENE
    # same-tracer triple exercises the factorial-moment structure
    bj = np.asarray(hm.get_bispectrum(k1, k2, k3, "g", terms="total"))
    bt = tbsp.bispectrum(tw, "g", "g", "g", k1, k2, k3, "total")
    np.testing.assert_allclose(bj, bt, rtol=1e-8)
    # shared pair + distinct third leg (g, g, nfw)
    bj = np.asarray(hm.get_bispectrum(k1, k2, k3, "g", "g", "nfw", "total"))
    bt = tbsp.bispectrum(tw, "g", "g", "nfw", k1, k2, k3, "total")
    np.testing.assert_allclose(bj, bt, rtol=1e-8)
    # fully mixed (g, y, nfw): factorized cross-terms
    bj = np.asarray(hm.get_bispectrum(k1, k2, k3, "g", "y", "nfw", "total"))
    bt = tbsp.bispectrum(tw, "g", "y", "nfw", k1, k2, k3, "total")
    np.testing.assert_allclose(bj, bt, rtol=1e-8)


def test_b2_term_parity(pair):
    hm, tw = pair
    k1, k2, k3 = SCALENE
    bj = np.asarray(hm.get_bispectrum(k1, k2, k3, "nfw", terms="3h",
                                      include_b2=True))
    bt = tbsp.bispectrum(tw, "nfw", "nfw", "nfw", k1, k2, k3, "3h",
                         include_b2=True)
    np.testing.assert_allclose(bj, bt, rtol=1e-8)
    # the quadratic-bias term changes the answer (not a silent no-op)
    b0 = np.asarray(hm.get_bispectrum(k1, k2, k3, "nfw", terms="3h"))
    assert np.max(np.abs(bj / b0 - 1.0)) > 1e-3


def test_per_z_leg_broadcast(pair):
    """(nz, nq) per-z legs (the Limber shape) agree with evaluating each
    z row's configuration explicitly via a shared-leg call."""
    hm, tw = pair
    kq = np.array([[0.05, 0.5], [0.06, 0.7],
                   [0.08, 0.9]])               # (nz=3, nq=2)
    bj = np.asarray(hm.get_bispectrum(kq, kq, kq, "nfw", terms="total"))
    bt = tbsp.bispectrum(tw, "nfw", "nfw", "nfw", kq, kq, kq, "total")
    np.testing.assert_allclose(bj, bt, rtol=1e-8)


# --------------------------------------------------------- physics limits

def test_matter_leg_low_k_consistency(pair):
    """The completed matter leg I_1 -> 1 as k -> 0 (mass-integral
    completion), so B_3h -> B_tree on large scales."""
    hm, _ = pair
    t = hm._tracer("nfw")
    I1 = np.asarray(bsp._leg_completed(
        t, hm.nzm, hm.bh, hm.ms, hm.ks, hm.rho_matter_z(0.0),
        bsp._normalize_kq(np.array([1e-3]), ZS.size)))
    np.testing.assert_allclose(I1, 1.0, rtol=0.02)


def test_hod_leg_low_k_is_bg(pair):
    """The completed HOD leg -> b_g as k -> 0."""
    hm, _ = pair
    t = hm._tracer("g")
    I1 = np.asarray(bsp._leg_completed(
        t, hm.nzm, hm.bh, hm.ms, hm.ks, hm.rho_matter_z(0.0),
        bsp._normalize_kq(np.array([1e-3]), ZS.size)))
    bg = np.asarray(hm.hods["g"]["bg"])
    np.testing.assert_allclose(I1[:, 0], bg, rtol=0.02)


def test_tree_level_limit(pair):
    """On large scales the total matter bispectrum reduces to the
    tree-level SPT bispectrum (1h damped away, 2h/3h corrections small)."""
    hm, _ = pair
    k = np.array([5e-3])
    btot = np.asarray(hm.get_bispectrum(k, name="nfw", terms="total"))[0, 0]
    P = np.interp(np.log(k), np.log(KS), np.asarray(hm.Pzk)[0])
    btree = float(bsp.tree_bispectrum(P, P, P, k, k, k)[0])
    assert abs(btot / btree - 1.0) < 0.15
    # and the 3h term alone is within 5% of tree (I1 -> 1)
    b3h = np.asarray(hm.get_bispectrum(k, name="nfw", terms="3h"))[0, 0]
    assert abs(b3h / btree - 1.0) < 0.05


def test_squeezed_positive_hierarchy(pair):
    """Sanity on shapes: equilateral B at small k below squeezed B with
    one long leg (squeezed configurations are tree-enhanced), and the
    1-halo term dominates deep in the nonlinear regime."""
    hm, _ = pair
    b1h = np.asarray(hm.get_bispectrum(np.array([5.0]), name="nfw",
                                       terms="1h"))
    b3h = np.asarray(hm.get_bispectrum(np.array([5.0]), name="nfw",
                                       terms="3h"))
    assert np.all(b1h > b3h)
    assert np.all(b1h > 0)


# --------------------------------------------------------------- angular

def test_angular_bispectrum_parity(pair):
    hm, tw = pair
    ells = np.array([100.0, 300.0, 1000.0])
    bj = np.asarray(hm.get_angular_bispectrum(ells, name="y"))
    bt = tbsp.projected_bispectrum(tw, ells, ells, ells, "y", "y", "y")
    np.testing.assert_allclose(bj, bt, rtol=1e-8)
    assert np.all(bj > 0)          # tSZ bispectrum is positive
    # mixed-ell triplet
    bj = np.asarray(hm.get_angular_bispectrum(200.0, 400.0, 500.0,
                                              name="y"))
    bt = tbsp.projected_bispectrum(tw, 200.0, 400.0, 500.0, "y", "y", "y")
    np.testing.assert_allclose(bj, bt, rtol=1e-8)


def test_cib_triple_inline_oracle(pair):
    """CIB 1-halo bispectrum against an inline numpy contraction of the
    registered tracer's (fc, fs, us) grids -- the central appears at most
    once per same-halo tuple (same exclusion as the pair term)."""
    hm, _ = pair
    t = hm.add_cib_tracer("cib545", 545.0)
    k1, k2, k3 = (np.array([0.3]), np.array([0.5]), np.array([0.8]))
    bj = np.asarray(hm.get_bispectrum(k1, k2, k3, "cib545", terms="1h"))

    fc = np.asarray(t.fc)
    fs = np.asarray(t.fs)
    us = np.asarray(t.us)
    lks = np.log(KS)
    nzm = np.asarray(hm.nzm)
    expected = np.zeros(ZS.size)
    for iz in range(ZS.size):
        u = [np.array([np.interp(np.log(kk[0]), lks, us[iz, im])
                       for im in range(MS.size)]) for kk in (k1, k2, k3)]
        trip = (fc[iz] * fs[iz] ** 2 * u[1] * u[2]
                + fs[iz] * fc[iz] * fs[iz] * u[0] * u[2]
                + fs[iz] ** 2 * fc[iz] * u[0] * u[1]
                + fs[iz] ** 3 * u[0] * u[1] * u[2])
        val = np.trapezoid(nzm[iz] * trip, MS)
        for kk in (k1, k2, k3):
            val *= 1.0 - np.exp(-((kk[0] / hm.p["kstar_damping"]) ** 2))
        expected[iz] = val
    np.testing.assert_allclose(bj[:, 0], expected, rtol=1e-8)


def test_total_equals_sum_of_terms(pair):
    """Regression for the shared-work refactor: terms='total' must equal
    the sum of the three individually requested terms exactly."""
    hm, _ = pair
    k1, k2, k3 = SCALENE
    tot = np.asarray(hm.get_bispectrum(k1, k2, k3, "g", terms="total"))
    parts = sum(np.asarray(hm.get_bispectrum(k1, k2, k3, "g", terms=t))
                for t in ("1h", "2h", "3h"))
    np.testing.assert_allclose(tot, parts, rtol=1e-12)


def test_cib_cross_frequency_population_convention(pair):
    """Cross-frequency CIB legs share ONE galaxy population: the same-halo
    pair/triple terms keep the central-self-pair exclusion of
    power._cib_square_term instead of factorizing as if two independent
    populations were observed.  Inline numpy contraction oracle."""
    from hmvec_tpu.models import power as pwr
    hm, _ = pair
    t545 = (hm.cib_tracers.get("cib545")
            or hm.add_cib_tracer("cib545", 545.0))
    t217 = hm.add_cib_tracer("cib217", 217.0)

    # pair convention at equal wavenumbers == power.one_halo_square_term
    kq = np.array([0.4])
    bj = np.asarray(hm.get_bispectrum(kq, kq, kq, "cib217", "cib545",
                                      "cib545", terms="1h"))
    fc = [np.asarray(t.fc) for t in (t217, t545, t545)]
    fs = [np.asarray(t.fs) for t in (t217, t545, t545)]
    us = [np.asarray(t.us) for t in (t217, t545, t545)]
    lks = np.log(KS)
    nzm = np.asarray(hm.nzm)
    expected = np.zeros(ZS.size)
    for iz in range(ZS.size):
        u = [np.array([np.interp(np.log(kq[0]), lks, uu[iz, im])
                       for im in range(MS.size)]) for uu in us]
        trip = (fc[0][iz] * fs[1][iz] * fs[2][iz] * u[1] * u[2]
                + fc[1][iz] * fs[0][iz] * fs[2][iz] * u[0] * u[2]
                + fc[2][iz] * fs[0][iz] * fs[1][iz] * u[0] * u[1]
                + fs[0][iz] * fs[1][iz] * fs[2][iz] * u[0] * u[1] * u[2])
        val = np.trapezoid(nzm[iz] * trip, MS)
        val *= (1.0 - np.exp(-((kq[0] / hm.p["kstar_damping"]) ** 2))) ** 3
        expected[iz] = val
    np.testing.assert_allclose(bj[:, 0], expected, rtol=1e-8)

    # and the 2-wavenumber pair term reduces to the power-spectrum pair
    # term of the SAME two distinct-frequency tracers at ka == kb
    # (evaluated AT grid points of KS so the per-piece lerps are exact --
    # lerp(u1)*lerp(u2) != lerp(u1*u2) between nodes)
    from hmvec_tpu.models import bispectrum as bspm
    knodes = np.asarray(KS)[[30, 55]]
    kq2 = bspm._normalize_kq(knodes, ZS.size)
    legA = bspm._Leg(t217, MS, float(hm.rho_matter_z(0.0)), KS, kq2)
    legB = bspm._Leg(t545, MS, float(hm.rho_matter_z(0.0)), KS, kq2)
    got_pair = np.asarray(bspm._pair_term(legA, legB))
    sq = np.asarray(pwr.one_halo_square_term(
        t217, t545, MS, float(hm.rho_matter_z(0.0))))
    want_pair = sq[:, :, [30, 55]]
    np.testing.assert_allclose(got_pair, want_pair, rtol=1e-7)
