"""Lognormal concentration scatter for NFW profiles (EXTENSION).

<u> (linear terms) and <u^2> (1-halo auto term) under ln c ~
N(ln cbar, sigma^2): 9-node Gauss-Hermite on the jax side vs an
INDEPENDENT 481-point dense-trapz lognormal expectation in the twin.
The reference has no concentration scatter at all.
"""

import numpy as np
import jax
import jax.numpy as jnp

from hmvec_tpu.models.halo_model import HaloModel
from hmvec_tpu.models import profiles as prof
from hmvec_tpu.twin.halo_ext import TwinHaloModelExt

ZS = np.linspace(0.2, 1.5, 3)
KS = np.geomspace(1e-3, 50.0, 64)   # canonical nk=64
MS = np.geomspace(1e11, 1e16, 80)   # canonical nm=80
SIG = 0.35


def _pair():
    hm = HaloModel(ZS, KS, ms=MS)
    hm.add_nfw_profile("nfws", conc_scatter=SIG)
    tw = TwinHaloModelExt(ZS, KS, MS)
    tw.add_nfw_profile("nfws", conc_scatter=SIG)
    return hm, tw


def test_moments_vs_twin():
    hm, tw = _pair()
    np.testing.assert_allclose(np.asarray(hm.uk_profiles["nfws"]),
                               tw.uk_profiles["nfws"], rtol=2e-6)
    np.testing.assert_allclose(np.asarray(hm.uk2_profiles["nfws"]),
                               tw.uk2_profiles["nfws"], rtol=2e-6)


def test_power_parity_and_cross():
    hm, tw = _pair()
    # auto: 1h carries <u^2>, 2h carries <u>
    np.testing.assert_allclose(np.asarray(hm.get_power("nfws")),
                               tw.get_power("nfws"), rtol=1e-5)
    # cross with the unscattered profile: linear in each -> <u> * u
    np.testing.assert_allclose(np.asarray(hm.get_power("nfws", "nfw")),
                               tw.get_power("nfws", "nfw"), rtol=1e-5)


def test_zero_scatter_limit():
    hm = HaloModel(ZS, KS, ms=MS)
    hm.add_nfw_profile("nfws", conc_scatter=1e-9)
    np.testing.assert_allclose(np.asarray(hm.uk_profiles["nfws"]),
                               np.asarray(hm.uk_profiles["nfw"]),
                               rtol=1e-9)
    np.testing.assert_allclose(np.asarray(hm.uk2_profiles["nfws"]),
                               np.asarray(hm.uk_profiles["nfw"]) ** 2,
                               rtol=1e-8)


def test_jensen_and_onehalo_boost():
    """<u^2> >= <u>^2 everywhere, so scatter BOOSTS the 1-halo auto term;
    the mean profile still normalizes to u(k->0) = 1."""
    hm, _ = _pair()
    uk = np.asarray(hm.uk_profiles["nfws"])
    uk2 = np.asarray(hm.uk2_profiles["nfws"])
    assert np.all(uk2 >= uk**2 - 1e-12)
    # u(k->0) -> 1: at kmin = 1e-3 the truncated profile deviates by
    # O((k r_s (1+c))^2) ~ 1e-4 for the heaviest halos
    np.testing.assert_allclose(uk[..., 0], 1.0, atol=3e-3)
    p1_s = np.asarray(hm.get_power_1halo("nfws"))
    hm2 = HaloModel(ZS, KS, ms=MS)
    p1 = np.asarray(hm2.get_power_1halo("nfw"))
    assert p1_s[-1, -1] > p1[-1, -1]


def test_grad_wrt_sigma():
    """sigma_lnc may be traced (a Fisher/forecast parameter)."""
    hm = HaloModel(ZS, KS, ms=MS)
    cs = hm.concentration()
    rvirs = hm.rvir(hm.ms[None, :], hm.zs[:, None])

    def f(sig):
        um, u2 = prof.nfw_uk_scatter(hm.ks, hm.zs, cs, rvirs, sig)
        return jnp.sum(um) + jnp.sum(u2)

    g = jax.grad(f)(0.3)
    assert np.isfinite(float(g)) and float(g) != 0.0


def test_reregistration_drops_stale_uk2():
    """Re-registering a profile WITHOUT conc_scatter must clear the old
    <u^2> entry, else the 1-halo auto silently stays scattered."""
    hm = HaloModel(ZS, KS, ms=MS)
    hm.add_nfw_profile("p", conc_scatter=0.4)
    assert "p" in hm.uk2_profiles
    p_sc = np.asarray(hm.get_power_1halo("p"))
    hm.add_nfw_profile("p", ignore_existing=True)
    assert "p" not in hm.uk2_profiles
    p_plain = np.asarray(hm.get_power_1halo("p"))
    ref = np.asarray(hm.get_power_1halo("nfw"))
    np.testing.assert_allclose(p_plain, ref, rtol=1e-13)
    assert p_sc[-1, -1] > p_plain[-1, -1]


def test_hod_satellites_use_u2_and_match_twin():
    """HOD on a conc-scatter satellite profile: the same-halo sat-sat
    pair term carries <u^2> (Jensen boost at high k) and matches the
    independent dense-trapz twin."""
    from hmvec_tpu.twin.halo_ext import TwinHaloModelExt

    ngal = np.full(ZS.size, 1e-4)
    hm = HaloModel(ZS, KS, ms=MS)
    hm.add_nfw_profile("nfw_sc", conc_scatter=0.35)
    hm.add_hod("g", ngal=ngal, satellite_profile_name="nfw_sc")
    pgg = np.asarray(hm.get_power_1halo("g"))

    tw = TwinHaloModelExt(ZS, KS, ms=MS)
    tw.add_nfw_profile("nfw_sc", conc_scatter=0.35)
    tw.add_hod("g", ngal=ngal, satellite_profile_name="nfw_sc")
    pgg_t = tw.get_power_1halo("g")
    np.testing.assert_allclose(pgg, pgg_t, rtol=1e-6)

    # Jensen: scattered satellites boost the sat-sat tail vs no scatter
    hm0 = HaloModel(ZS, KS, ms=MS)
    hm0.add_hod("g", ngal=ngal)
    pgg0 = np.asarray(hm0.get_power_1halo("g"))
    assert pgg[-1, -1] > pgg0[-1, -1]


def test_cib_shared_scatter_profile_uses_u2():
    """Two CIB frequencies on ONE registered scattered profile share the
    same concentration realization per halo: the sat-sat term carries
    <u^2> (checked against an inline contraction), and the 1-halo cross
    exceeds the product-of-means form at high k."""
    from hmvec_tpu.models import power as pwr
    from hmvec_tpu.utils.weights import trapz_weights

    hm = HaloModel(ZS, KS, ms=MS)
    hm.add_nfw_profile("nfw_sc", conc_scatter=0.35)
    hm.add_cib_tracer("c545", 545.0, satellite_profile="nfw_sc")
    hm.add_cib_tracer("c217", 217.0, satellite_profile="nfw_sc")
    t1, t2 = hm._tracer("c545"), hm._tracer("c217")
    assert t1.us2 is t2.us2 and t1.us2 is not None

    p1h = np.asarray(hm.get_power_1halo("c545", "c217"))
    uk = np.asarray(hm.uk_profiles["nfw_sc"])
    uk2 = np.asarray(hm.uk2_profiles["nfw_sc"])
    fc1, fs1 = np.asarray(t1.fc), np.asarray(t1.fs)
    fc2, fs2 = np.asarray(t2.fc), np.asarray(t2.fs)
    square = (fc1[..., None] * fs2[..., None] * uk
              + fc2[..., None] * fs1[..., None] * uk
              + fs1[..., None] * fs2[..., None] * uk2)
    w = trapz_weights(np.asarray(hm.ms))
    integral = np.einsum("zmk,m->zk", np.asarray(hm.nzm)[..., None] * square, w)
    damping = 1.0 - np.exp(-((np.asarray(hm.ks)
                              / hm.p["kstar_damping"]) ** 2))
    np.testing.assert_allclose(p1h, integral * damping[None, :], rtol=1e-10)
