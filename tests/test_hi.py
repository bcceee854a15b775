"""HI / 21 cm halo model (models/hi.py): explicit-contraction parity,
published-magnitude envelopes, low-k bias limit, P_21 assembly."""

import numpy as np
import jax.numpy as jnp
import pytest

from hmvec_tpu.models.halo_model import HaloModel
from hmvec_tpu.models import hi as him

ZS = np.array([0.5, 1.0, 1.5])
MS = np.geomspace(1e9, 1e16, 80)    # canonical nm=80 (shape-shared traces)
KS = np.geomspace(1e-3, 20.0, 64)


@pytest.fixture(scope="module")
def hm():
    h = HaloModel(ZS, KS, ms=MS)
    h.add_hi_tracer("hi")
    return h


def test_mhi_shape():
    mh = np.asarray(him.m_hi(MS))
    assert np.all(np.diff(mh) > 0)              # monotone in M
    # exponential suppression well below Mmin
    lo = float(him.m_hi(jnp.asarray(3e10)))
    hi_ = float(him.m_hi(jnp.asarray(1e14)))
    assert lo < 1e-2 * hi_


def test_omega_hi_and_tb_magnitude(hm):
    om = np.asarray(hm.get_omega_hi("hi"))
    # post-reionization Omega_HI sits at a few 1e-4 observationally;
    # the VN18 z~0 parameters on this grid should land in the decade
    assert np.all(om > 5e-5) and np.all(om < 3e-3)
    from hmvec_tpu.models import background as bgmod
    ez = np.asarray(bgmod.e_of_z(hm.bg, hm.zs))
    tb = np.asarray(him.mean_brightness_temp_mk(ZS, ez, om, hm.h))
    assert np.all(tb > 0.02) and np.all(tb < 0.6)   # mK scale


def test_power_vs_explicit_contraction(hm):
    """1h/2h HI auto vs explicit numpy trapz contractions."""
    nzm = np.asarray(hm.nzm)
    bh = np.asarray(hm.bh)
    uk = np.asarray(hm.uk_profiles["nfw"])
    mh = np.asarray(him.m_hi(MS, hm._hi_params["hi"]))
    rho = np.trapezoid(nzm * mh[None, :], MS, axis=1)
    f = mh[None, :] / rho[:, None]
    kstar = hm.p["kstar_damping"]
    damp = 1.0 - np.exp(-(np.asarray(KS) / kstar) ** 2)

    p1h_ref = np.trapezoid(nzm[..., None] * (f[..., None] * uk) ** 2,
                       MS, axis=1) * damp[None, :]
    p1h = np.asarray(hm.get_power_1halo("hi"))
    np.testing.assert_allclose(p1h, p1h_ref, rtol=1e-10)

    leg = np.trapezoid((nzm * bh)[..., None] * f[..., None] * uk, MS, axis=1)
    plin = np.asarray(hm.Pzk)
    p2h_ref = plin * leg**2
    p2h = np.asarray(hm.get_power_2halo("hi"))
    np.testing.assert_allclose(p2h, p2h_ref, rtol=1e-10)


def test_low_k_bias_limit(hm):
    """P_2h / P_lin -> b_HI^2 at the lowest k (u -> 1)."""
    p2h = np.asarray(hm.get_power_2halo("hi"))
    plin = np.asarray(hm.Pzk)
    b = np.asarray(hm.get_hi_bias("hi"))
    np.testing.assert_allclose(p2h[:, 0] / plin[:, 0], b**2, rtol=2e-3)
    # HI bias is modestly positive and grows with z
    assert np.all(b > 0.7) and np.all(b < 3.0)
    assert b[-1] > b[0]


def test_p21_assembly_and_cross(hm):
    from hmvec_tpu.models import background as bgmod
    p21 = np.asarray(hm.get_p21("hi"))
    ez = np.asarray(bgmod.e_of_z(hm.bg, hm.zs))
    om = np.asarray(hm.get_omega_hi("hi"))
    tb = np.asarray(him.mean_brightness_temp_mk(ZS, ez, om, hm.h))
    P = np.asarray(hm.get_power("hi"))
    np.testing.assert_allclose(p21, tb[:, None] ** 2 * P, rtol=1e-12)
    # cross with matter runs through the same machinery
    pxm = np.asarray(hm.get_power("hi", "nfw"))
    assert np.all(np.isfinite(pxm)) and np.all(pxm > 0)


def test_conc_scatter_threads_into_hi_1halo():
    hm2 = HaloModel(ZS, KS, ms=MS)
    hm2.add_nfw_profile("nfwsc", conc_scatter=0.35, ignore_existing=True)
    hm2.add_hi_tracer("hi", profile_name="nfwsc")
    hm3 = HaloModel(ZS, KS, ms=MS)
    hm3.add_nfw_profile("nfwsc", ignore_existing=True)
    hm3.add_hi_tracer("hi", profile_name="nfwsc")
    p_sc = np.asarray(hm2.get_power_1halo("hi"))
    p_ns = np.asarray(hm3.get_power_1halo("hi"))
    # Jensen: <u^2> >= <u>^2 boosts the 1-halo tail
    assert p_sc[:, -1].min() > p_ns[:, -1].min()
