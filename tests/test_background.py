import numpy as np
import jax
import jax.numpy as jnp

from hmvec_tpu.params import merge_params
from hmvec_tpu.models import background as bgm
from hmvec_tpu.models import linear_power as lpm
from hmvec_tpu.twin.core import TwinCosmology

ZS = np.linspace(0.1, 3.0, 20)


def _bg():
    return bgm.background(merge_params())


def test_background_matches_twin():
    bg = _bg()
    tw = TwinCosmology()
    np.testing.assert_allclose(np.asarray(bgm.hubble_parameter(bg, ZS)),
                               tw.hubble_parameter(ZS), rtol=1e-13)
    np.testing.assert_allclose(np.asarray(bgm.comoving_radial_distance(bg, ZS)),
                               tw.comoving_radial_distance(ZS), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(bgm.rho_critical_z(bg, ZS)),
                               tw.rho_critical_z(ZS), rtol=1e-13)
    np.testing.assert_allclose(np.asarray(bgm.rho_matter_z(bg, ZS)),
                               tw.rho_matter_z(ZS), rtol=1e-13)
    np.testing.assert_allclose(np.asarray(bgm.angular_diameter_distance(bg, ZS)),
                               tw.angular_diameter_distance(ZS), rtol=1e-12)


def test_chi_inverse_roundtrip():
    bg = _bg()
    chi = bgm.comoving_radial_distance(bg, ZS)
    z_back = bgm.redshift_at_comoving_radial_distance(bg, chi)
    np.testing.assert_allclose(np.asarray(z_back), ZS, rtol=1e-8)


def test_growth_matches_twin_and_sanity():
    bg = _bg()
    tw = TwinCosmology()
    a = 1.0 / (1.0 + ZS)
    np.testing.assert_allclose(np.asarray(bgm.d_growth(bg, a)),
                               tw.d_growth(a), rtol=1e-10)
    # matter-domination limit: D(a) ~ a for small a
    small_a = jnp.asarray([1e-3, 2e-3])
    d = np.asarray(bgm.d_growth(bg, small_a, norm="anorm"))
    np.testing.assert_allclose(d, np.asarray(small_a), rtol=1e-3)


def test_growth_rate_f():
    bg = _bg()
    tw = TwinCosmology()
    f_jax = np.asarray(bgm.growth_rate_f(bg, ZS))
    f_twin = tw.growth_rate_f(ZS)
    np.testing.assert_allclose(f_jax, f_twin, rtol=1e-9)
    # LCDM sanity: f ~ Omega_m(z)^0.55
    omz = np.asarray(bgm.omz(bg, ZS))
    np.testing.assert_allclose(f_jax, omz**0.55, rtol=0.02)


def test_transfer_and_plin_match_twin():
    bg = _bg()
    tw = TwinCosmology()
    ks = np.geomspace(1e-4, 100.0, 1001)
    from hmvec_tpu.models.transfer import transfer_eh98
    for kind in ("eisenhu", "eisenhu_osc"):
        np.testing.assert_allclose(np.asarray(transfer_eh98(bg, ks, kind)),
                                   tw.transfer(ks, kind), rtol=1e-12)
    p = np.asarray(lpm.plin_approx(bg, ZS, ks))
    np.testing.assert_allclose(p, tw.plin_approx(ZS, ks), rtol=1e-12)


def test_sigma2_matches_twin():
    bg = _bg()
    tw = TwinCosmology()
    params = merge_params()
    ms = np.geomspace(2e10, 1e17, 40)
    rho0 = tw.rho_matter_z(0.0)
    R = (3.0 * ms / 4.0 / np.pi / rho0) ** (1.0 / 3.0)
    ks_s2 = lpm.sigma2_k_grid(params)
    engine = lpm.EHEngine()
    spzk = engine.plin(bg, ZS, ks_s2)
    s2 = np.asarray(lpm.sigma2_R(bg, R, ZS, spzk, ks_s2))
    s2_twin = tw.sigma2_R(R, ZS)
    np.testing.assert_allclose(s2, s2_twin, rtol=1e-11)


def test_sigma8_reasonable():
    # Planck-like params should give sigma8 ~ 0.8 with the EH engine
    bg = _bg()
    params = merge_params()
    ks_s2 = lpm.sigma2_k_grid(params)
    engine = lpm.EHEngine()
    spzk = engine.plin(bg, np.array([0.0]), ks_s2)
    R8 = 8.0 / (params["H0"] / 100.0)
    s2 = np.asarray(lpm.sigma2_R(bg, np.array([R8]), np.array([0.0]), spzk, ks_s2))
    sigma8 = float(np.sqrt(s2[0, 0]))
    assert 0.7 < sigma8 < 0.9, sigma8


def test_plin_grad():
    params = merge_params()
    ks = np.geomspace(1e-3, 10.0, 64)

    def loss(omch2):
        p = dict(params)
        p["omch2"] = omch2
        bg = bgm.background(p)
        return jnp.sum(lpm.plin_approx(bg, jnp.asarray([0.5]), ks))

    g = jax.jit(jax.grad(loss))(jnp.asarray(params["omch2"]))
    assert np.isfinite(float(g)) and float(g) != 0.0


# ---- round 3: integrated growing mode for general (w0, wa) ----

def test_growth_ode_matches_closed_form_lcdm():
    """The RK4/Hermite growth table must reproduce the Heath/2F1 closed
    form in the LCDM limit (same reduced background by construction)."""
    bg = _bg()
    tab = bgm.growth_table(bg)
    a = np.geomspace(2e-4, 1.0, 60)
    d_ode, f_ode = bgm.growth_eval(tab, a)
    np.testing.assert_allclose(np.asarray(d_ode),
                               np.asarray(bgm.growth_unnormalized(bg, a)),
                               rtol=1e-7)
    np.testing.assert_allclose(np.asarray(f_ode),
                               np.asarray(bgm.growth_rate_f(bg, 1.0 / a - 1.0)),
                               rtol=1e-6)


def test_growth_ode_matches_scipy_twin_wcdm():
    """w0/wa growing mode vs the twin's independent scipy solve_ivp
    formulation (integrated in a, not ln a)."""
    pars = {"w0": -0.85, "wa": 0.4}
    bg = bgm.background(merge_params(pars))
    tw = TwinCosmology(pars)
    tab = bgm.growth_table(bg)
    a = np.geomspace(2e-4, 1.0, 40)
    d_ode, f_ode = bgm.growth_eval(tab, a)
    np.testing.assert_allclose(np.asarray(d_ode), tw.growth_unnormalized(a),
                               rtol=1e-7)
    np.testing.assert_allclose(np.asarray(f_ode),
                               tw.growth_rate_f(1.0 / a - 1.0), rtol=1e-6)
    # d_growth/growth_rate_f dispatch through mode="ode"
    np.testing.assert_allclose(
        np.asarray(bgm.d_growth(bg, a, norm="anorm", mode="ode")),
        tw.d_growth(a, norm="anorm"), rtol=1e-7)


def test_growth_ode_below_table_and_grad():
    bg = _bg()
    tab = bgm.growth_table(bg)
    # below the table start the pure matter-domination extension D = a*C
    d_lo, f_lo = bgm.growth_eval(tab, np.array([1e-5, 5e-5]))
    np.testing.assert_allclose(np.asarray(f_lo), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(d_lo[1] / d_lo[0]), 5.0,
                               rtol=1e-12)
    # differentiable w.r.t. w0 and the derivative is nonzero
    g = jax.grad(lambda w0: bgm.growth_eval(
        bgm.growth_table(bg._replace(w0=w0)), 0.5)[0])(jnp.asarray(-1.0))
    assert np.isfinite(float(g)) and abs(float(g)) > 1e-3


def test_growth_mode_for():
    assert bgm.growth_mode_for(merge_params()) == "closed"
    assert bgm.growth_mode_for(merge_params({"w0": -0.9})) == "ode"
    assert bgm.growth_mode_for(merge_params({"wa": 0.1})) == "ode"


def test_pipeline_growth_auto_dispatch():
    """make_pmm_fn 'auto': concrete w0/wa overrides select the ODE path
    and match the twin; the Fisher derivative in w0 at the LCDM fiducial
    is nonzero (traced override -> ODE)."""
    from hmvec_tpu.pipeline import make_pmm_fn, fisher_jacobian
    from hmvec_tpu.twin.halo import TwinHaloModel

    zs = np.linspace(0.1, 2.0, 2)
    ks = np.geomspace(1e-3, 10, 16)
    ms = np.geomspace(1e11, 1e16, 16)
    fn = make_pmm_fn(zs, ks, ms, jit=False)
    pw = np.asarray(jax.jit(fn)({"w0": jnp.asarray(-0.9),
                                 "wa": jnp.asarray(0.2)}))
    tw = TwinHaloModel(zs, ks, ms, params={"w0": -0.9, "wa": 0.2})
    np.testing.assert_allclose(pw, tw.get_power("nfw"), rtol=1e-6)
    jac = fisher_jacobian(fn, {"w0": -1.0}, ("w0",))
    assert float(np.max(np.abs(np.asarray(jac)))) > 0.0
