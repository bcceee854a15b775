"""Class-level RSD multipole API (Cosmology.get_rsd_multipoles,
HaloModel.get_galaxy_rsd_multipoles): exact D-power z-carrying of the
loop ingredients, Kaiser anchor, HOD bias threading."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import hmvec_tpu as h
from hmvec_tpu.models import rsd

KW = dict(n_q=128, n_x=64, n_q13=256)


@pytest.fixture(scope="module")
def cos():
    return h.Cosmology(accuracy="low")


def test_kaiser_anchor(cos):
    """model='kaiser' at sigma_v=0 equals the closed-form Kaiser
    factors times P_lin(z) exactly."""
    ks = np.geomspace(0.02, 0.2, 12)
    zs = np.array([0.5, 1.5])
    b = 1.7
    mp = cos.get_rsd_multipoles(zs, ks, b=b, model="kaiser", sigma_v=0.0)
    Plin = np.asarray(cos.P_lin(jnp.asarray(ks), zs))
    fz = np.asarray(cos.get_growth_rate_f(zs))
    for i in range(len(zs)):
        fac = rsd.kaiser_multipole_factors(b, fz[i])
        for ell in (0, 2, 4):
            np.testing.assert_allclose(np.asarray(mp[ell])[i],
                                       fac[ell] * Plin[i], rtol=1e-12)


def test_d4_carrying_is_exact(cos):
    """The z-carrying (loops ~ D^4, bilinear A/B ~ D^4) must equal
    computing the loop integrals directly from the z > 0 linear table:
    P_lin(z) = D(z)^2 P_lin(0) holds exactly in this engine tier, and
    the integrals are exactly bilinear on identical nodes."""
    from hmvec_tpu.models import spt, tns
    ks = np.geomspace(0.05, 0.2, 8)
    z = 1.0
    ks_tab = np.geomspace(1e-5, 1e3, 1200)
    pk0 = np.asarray(cos.P_lin(jnp.asarray(ks_tab), np.array([0.0])))[0]
    pkz = np.asarray(cos.P_lin(jnp.asarray(ks_tab), np.array([z])))[0]
    D2 = np.exp(np.mean(np.log(pkz / pk0)))
    # the engine tier is exactly D^2-separable
    np.testing.assert_allclose(pkz, D2 * pk0, rtol=1e-10)
    mp = cos.get_rsd_multipoles(np.array([z]), ks, b=1.4, model="tns",
                                sigma_v=0.0, **KW)
    # direct: all ingredients from the z table, assembled identically
    pv = spt.pk_velocity_1loop(ks, ks_tab, pkz, n_q=128, n_x=64,
                               n_q13=256, qmin=1e-4, qmax=1e2)
    ab = tns.tns_ab_integrals(ks, ks_tab, pkz, n_q=128, n_x=64,
                              qmin=1e-4, qmax=1e2)
    fz = float(np.asarray(cos.get_growth_rate_f(np.array([z])))[0])
    want = tns.tns_multipoles(ks, pv["dd"], pv["dt"], pv["tt"], 1.4, fz,
                              ab, sigma_v=0.0)
    for ell in (0, 2, 4):
        np.testing.assert_allclose(np.asarray(mp[ell])[0],
                                   np.asarray(want[ell]), rtol=1e-9)


def test_galaxy_wrapper_threads_hod_bias(cos):
    ks = np.geomspace(0.02, 0.2, 10)
    zs = np.array([0.5, 1.0])
    hm = h.HaloModel(zs, ks, ms=np.geomspace(1e10, 1e16, 50))
    hm.add_hod("g", ngal=np.array([1e-4, 1e-4]))
    mp = hm.get_galaxy_rsd_multipoles("g", model="scoccimarro", **KW)
    bg = np.asarray(hm.hods["g"]["bg"])
    assert bg[1] > bg[0] > 1.0     # same ngal -> higher bias at higher z
    want = hm.get_rsd_multipoles(zs, ks, b=bg, model="scoccimarro", **KW)
    for ell in (0, 2, 4):
        np.testing.assert_allclose(np.asarray(mp[ell]),
                                   np.asarray(want[ell]), rtol=1e-12)
    # monopole boosted by bias^2 at low k, quadrupole positive there
    assert float(np.asarray(mp[0])[0, 0]) > 0
    assert float(np.asarray(mp[2])[0, 0]) > 0


def test_sigma_v_and_model_validation(cos):
    ks = np.geomspace(0.05, 0.2, 6)
    zs = np.array([0.5])
    with pytest.raises(ValueError):
        cos.get_rsd_multipoles(zs, ks, model="nonsense", **KW)
    # per-z sigma_v array accepted; damping lowers the monopole
    mp0 = cos.get_rsd_multipoles(zs, ks, b=2.0, model="scoccimarro",
                                 sigma_v=0.0, **KW)
    mp5 = cos.get_rsd_multipoles(zs, ks, b=2.0, model="scoccimarro",
                                 sigma_v=np.array([5.0]), **KW)
    assert np.all(np.asarray(mp5[0]) < np.asarray(mp0[0]))
