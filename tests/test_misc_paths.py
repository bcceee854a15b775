"""Remaining API paths: rootfind oracle, Nvv errs/robust, survey SNR,
SH Battaglia family, b1/b2 bias overrides."""

import numpy as np
import jax.numpy as jnp

from hmvec_tpu.ops.rootfind import invert_monotone, solve_bisection_root


def test_invert_monotone_square():
    """Direct analogue of the reference's utils.test_bisection_search
    (utils.py:45-51): invert y -> sqrt(y) to solve x = y^... y = x^2."""
    xs = jnp.asarray([2.0, 4.0, 6.0])
    got = np.asarray(invert_monotone(jnp.sqrt, xs, 1.0, 40.0,
                                     num_iter=60, increasing=True))
    np.testing.assert_allclose(got, np.asarray([4.0, 16.0, 36.0]),
                               rtol=1e-12)


def test_solve_bisection_root():
    f = lambda y: 5.0 - jnp.exp(y)  # decreasing; root at ln 5
    got = float(solve_bisection_root(f, jnp.asarray(0.0), jnp.asarray(5.0)))
    assert abs(got - np.log(5.0)) < 1e-12


def test_nvv_errs_and_robust_paths():
    from hmvec_tpu.models.ksz import Nvv_core_integral
    mu = jnp.linspace(-1, 1, 8)
    kL = jnp.geomspace(1e-3, 0.1, 10)
    kS = jnp.geomspace(0.1, 10, 20)
    Cls = 1e-5 * np.ones(10000)
    Pge = jnp.ones(20) * 100.0
    Pgg = jnp.ones(20) * 1e4
    nvv_e, ret = Nvv_core_integral(3000.0, 1.0, mu, kL, kS, Cls, Pge, Pgg,
                                   errs=True)
    assert np.all(np.isfinite(np.asarray(nvv_e)))
    np.testing.assert_array_equal(np.asarray(ret), np.asarray(Pge))
    nvv_base = Nvv_core_integral(3000.0, 1.0, mu, kL, kS, Cls, Pge, Pgg)
    nvv_r = Nvv_core_integral(3000.0, 1.0, mu, kL, kS, Cls, Pge, Pgg,
                              Pgg_photo_tot=Pgg * 2.0, robust_term=True)
    assert np.all(np.isfinite(np.asarray(nvv_r)))
    # robust term with Pgg_photo = 2 Pgg doubles the integrand -> halves Nvv
    np.testing.assert_allclose(np.asarray(nvv_r), np.asarray(nvv_base) / 2.0,
                               rtol=1e-10)


def test_sh_family_profile():
    from hmvec_tpu.models.halo_model import HaloModel
    zs = np.array([0.5])
    ks = np.geomspace(1e-2, 10, 40)
    ms = np.geomspace(1e11, 1e15, 20)
    hm = HaloModel(zs, ks, ms=ms)
    hm.add_battaglia_profile("e_sh", family="SH", nxs=300, xmax=10)
    hm.add_battaglia_profile("e_agn", family="AGN", nxs=300, xmax=10)
    u_sh = np.asarray(hm.uk_profiles["e_sh"])
    u_agn = np.asarray(hm.uk_profiles["e_agn"])
    assert np.all(np.isfinite(u_sh))
    assert not np.allclose(u_sh, u_agn)  # families differ


def test_bias_override_b1_b2():
    from hmvec_tpu.models.halo_model import HaloModel
    zs = np.array([0.5, 1.0])
    ks = np.geomspace(1e-3, 5, 30)
    ms = np.geomspace(1e11, 1e16, 25)
    hm = HaloModel(zs, ks, ms=ms)
    p_def = np.asarray(hm.get_power_2halo("nfw"))
    b = np.array([1.5, 1.7])
    p_b = np.asarray(hm.get_power_2halo("nfw", b1_in=b, b2_in=b))
    assert not np.allclose(p_def, p_b)
    # at low k the consistency-corrected 2h -> b1 b2 Plin
    plin = np.asarray(hm.Pzk)
    np.testing.assert_allclose(p_b[:, 0] / plin[:, 0], b**2, rtol=5e-3)


def test_ksz_snr_survey_smoke():
    from hmvec_tpu.models.ksz import get_ksz_snr_survey
    zs = np.linspace(0.3, 0.9, 30)
    dndz = np.exp(-((zs - 0.6) ** 2) / 0.02)
    Cls = 1e-5 * np.ones(10000)
    vols, ngals, zcents, bgs, snrs, tot = get_ksz_snr_survey(
        zs, dndz, zedges=[0.4, 0.8], Cls=Cls, fsky=0.3, Ngals=1e6)
    assert len(snrs) == 1 and np.isfinite(tot) and tot > 0
    assert 0.5 < bgs[0] < 6.0


def test_survey_class_api_kwarg_falls_back_to_per_bin_path():
    """get_ksz_snr_survey with a class-API-only kwarg (nfw_numeric) must
    run the per-bin path instead of TypeError-ing the fused builder."""
    zs = np.linspace(0.1, 1.2, 30)
    dndz = np.exp(-((zs - 0.6) / 0.3) ** 2)
    zedges = np.array([0.2, 0.9])
    Cls = 1e-5 * np.ones(10000)
    from hmvec_tpu.models.ksz import get_ksz_snr_survey
    out = get_ksz_snr_survey(
        zs, dndz, zedges, Cls, fsky=0.4, Ngals=1e6,
        nfw_numeric=False,           # class-API-only name
        ms=np.geomspace(1e10, 1e16, 30), num_kL_bins=8, num_kS_bins=9,
        num_mu_bins=8, electron_profile_nxs=200, electron_profile_xmax=10)
    tot = out[-1]
    assert np.isfinite(tot) and tot > 0
