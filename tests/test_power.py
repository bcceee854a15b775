"""End-to-end Pmm (1h+2h) parity: JAX pipeline vs the numpy twin, on the
README quickstart grid (reference README.rst:55-57 semantics)."""

import numpy as np
import pytest

from hmvec_tpu.models.halo_model import HaloModel
from hmvec_tpu.twin.halo import TwinHaloModel

ZS = np.linspace(0.1, 3.0, 20)
MS = np.geomspace(2e10, 1e17, 200)
KS = np.geomspace(1e-4, 100, 1001)


@pytest.fixture(scope="module")
def models():
    hm = HaloModel(ZS, KS, ms=MS)
    tw = TwinHaloModel(ZS, KS, MS)
    return hm, tw


def test_sigma2_nzm_bh_parity(models):
    hm, tw = models
    np.testing.assert_allclose(np.asarray(hm.sigma2), tw.sigma2, rtol=1e-11)
    np.testing.assert_allclose(np.asarray(hm.nzm), tw.nzm, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(hm.bh), tw.bh, rtol=1e-11)


def test_nfw_uk_parity(models):
    hm, tw = models
    np.testing.assert_allclose(np.asarray(hm.uk_profiles["nfw"]),
                               tw.uk_profiles["nfw"], rtol=1e-10, atol=1e-13)


def test_nfw_uk_low_k_limit(models):
    hm, _ = models
    uk = np.asarray(hm.uk_profiles["nfw"])
    # u(k->0) -> 1 (mass normalization)
    assert np.allclose(uk[:, :, 0], 1.0, atol=1e-4)


def test_pmm_1h_2h_parity(models):
    hm, tw = models
    p1 = np.asarray(hm.get_power_1halo("nfw"))
    p1t = tw.get_power_1halo("nfw")
    np.testing.assert_allclose(p1, p1t, rtol=1e-9)
    p2 = np.asarray(hm.get_power_2halo("nfw"))
    p2t = tw.get_power_2halo("nfw")
    np.testing.assert_allclose(p2, p2t, rtol=1e-9)
    # headline metric: total power within 1e-5 relative
    tot = p1 + p2
    tott = p1t + p2t
    rel = np.max(np.abs(tot - tott) / np.abs(tott))
    assert rel < 1e-5, rel


def test_2halo_consistency_low_k(models):
    """P_2h(k->0) -> b^2 P_lin via the consistency subtraction
    (reference hmvec.py:566-572)."""
    hm, _ = models
    p2 = np.asarray(hm.get_power_2halo("nfw"))
    plin = np.asarray(hm.Pzk)
    np.testing.assert_allclose(p2[:, 0], plin[:, 0], rtol=1e-3)


def test_tinker_mode_parity():
    hm = HaloModel(ZS[:5], KS[::50], ms=MS[::10], mass_function="tinker",
                   mdef="mean")
    tw = TwinHaloModel(ZS[:5], KS[::50], MS[::10], mass_function="tinker",
                       mdef="mean")
    np.testing.assert_allclose(np.asarray(hm.nzm), tw.nzm, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(hm.bh), tw.bh, rtol=1e-11)
    p = np.asarray(hm.get_power("nfw"))
    pt = tw.get_power("nfw")
    np.testing.assert_allclose(p, pt, rtol=1e-8)


def test_tinker_alpha_consistency_z0():
    """alpha(0) should reproduce Tinker et al 2010's published 0.368
    (the recipe the reference's data generator asserts,
    bin/generate_bias_consistency_data.py:23-26)."""
    from hmvec_tpu.models.mass_function import tinker_alpha_consistency
    alpha0 = float(tinker_alpha_consistency(np.array([0.0]))[0])
    assert abs(alpha0 - 0.368) < 0.002, alpha0


def test_nfw_numeric_vs_analytic():
    """Numeric sine-DFT NFW against the analytic Si/Ci oracle
    (reference validation: bin/test_generic_fft.py:9-22).  The numeric
    path's accuracy is discretization-limited at the default sampling --
    the reference itself flags nxs=40000 as 'not sufficient'
    (params.py:59) -- so the oracle tolerance is ~1%."""
    zs = np.array([0.3, 1.0])
    ms = np.geomspace(1e12, 1e15, 8)
    ks = np.geomspace(1e-3, 20, 100)
    hm_a = HaloModel(zs, ks, ms=ms)
    hm_n = HaloModel(zs, ks, ms=ms, nfw_numeric=True)
    ua = np.asarray(hm_a.uk_profiles["nfw"])
    un = np.asarray(hm_n.uk_profiles["nfw"])
    assert np.max(np.abs(un - ua)) < 1e-2


def test_generic_profile_fft_parity_with_twin():
    """TPU sine-DFT + gather resample vs the twin's rfft + interp loop:
    same algorithm output to f64 rounding."""
    from hmvec_tpu.ops.sine_transform import generic_profile_fft as jax_fft
    from hmvec_tpu.twin.profile_fft import generic_profile_fft as twin_fft
    import jax.numpy as jnp

    zs = np.array([0.2, 0.9, 2.1])
    nm = 12
    rng = np.random.default_rng(42)
    cmaxs = rng.uniform(2.0, 8.0, (3, nm))
    rss = rng.uniform(0.05, 0.8, (3, nm))
    ks = np.geomspace(1e-3, 50, 200)
    gamma = -0.2

    def rho_np(xs):
        return np.broadcast_to((xs**gamma) * (1 + xs) ** -2.5,
                               (3, nm, xs.size))

    def rho_jax(xs):
        return jnp.broadcast_to((xs**gamma) * (1 + xs) ** -2.5,
                                (3, nm, xs.size))

    _, u_twin = twin_fft(rho_np, cmaxs, rss, zs, ks, xmax=20, nxs=5000)
    _, u_jax = jax_fft(rho_jax, jnp.asarray(cmaxs), jnp.asarray(rss),
                       zs, ks, xmax=20, nxs=5000)
    np.testing.assert_allclose(np.asarray(u_jax), u_twin,
                               rtol=1e-9, atol=1e-12)


def test_sine_dft_gaussian_oracle():
    """fft_integral analytic check: int dx x sin(kx) exp(-x^2/2)
    = sqrt(pi/2) k exp(-k^2/2) (reference fft.py:41-43,53).

    Two layers: (a) sine_dft must equal numpy's -rfft(..).imag*step exactly
    (same discrete transform); (b) the discrete transform approaches the
    analytic integral only to O(k*h) because of the reference's one-sample
    phase-offset convention (samples at (j+1)h treated as j*step) -- a
    deliberate parity quirk, so the analytic tolerance is loose."""
    from hmvec_tpu.ops.sine_transform import sine_dft
    import jax.numpy as jnp
    n = 2048
    xs = np.linspace(0.0, 30.0, n + 1)[1:]
    step = (xs[-1] - xs[0]) / n
    yv = np.exp(-(xs**2) / 2.0) * xs
    got = np.asarray(sine_dft(jnp.asarray(yv), step))
    ref = -np.fft.rfft(yv).imag * step
    np.testing.assert_allclose(got, ref, atol=1e-13)
    kts = np.arange(n // 2 + 1) * 2 * np.pi / (n * step)
    want = np.sqrt(np.pi / 2.0) * kts * np.exp(-(kts**2) / 2.0)
    sel = kts < 8.0
    np.testing.assert_allclose(got[sel], want[sel], atol=0.05)


def test_fast_assembly_matches_f64():
    """fast_assembly=True (the TPU fast tier: native-f32 (z,m,k) products
    + tree-wise m-reduction) vs the f64 assembly: <= 1e-6 relative incl.
    the low-k 2-halo consistency cancellation (measured 2.9e-7 max /
    1.3e-9 at the lowest k)."""
    import jax.numpy as jnp
    from hmvec_tpu.pipeline import _stages
    from hmvec_tpu.models import power as pwr
    from hmvec_tpu.models import linear_power as lpm
    from hmvec_tpu.params import merge_params

    zs = np.linspace(0.1, 3.0, 4)
    ks = np.geomspace(1e-4, 100, 120)
    ms = np.geomspace(2e10, 1e17, 60)
    p = merge_params()
    bg, pzk, nzm, bh, rho_m0, uk = _stages(
        p, zs, ks, ms, "sheth-torman", "vir", "medium", lpm.EHEngine())
    t64 = pwr.MatterTracer(uk=uk)
    t32 = pwr.MatterTracer(uk=uk.astype(jnp.float32))
    p64 = np.asarray(pwr.power_total(t64, t64, nzm, bh, ms, ks, pzk,
                                     rho_m0, p["kstar_damping"]))
    p32 = np.asarray(pwr.power_total(t32, t32, nzm, bh, ms, ks, pzk,
                                     rho_m0, p["kstar_damping"],
                                     fast_assembly=True))
    r = np.abs(p32 / p64 - 1.0)
    assert r.max() < 1e-6, r.max()
    assert r[:, 0].max() < 1e-7   # consistency cancellation intact
