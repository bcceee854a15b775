"""One-loop SPT (models/spt.py): twin parity, kernel exactness vs
sympy, IR-cancellation (Galilean invariance), quadratic-in-P gradient
identity, EdS z-scaling of the Cosmology method."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hmvec_tpu.models.cosmology import Cosmology
from hmvec_tpu.models import spt
from hmvec_tpu.twin import spt as tspt

QMIN, QMAX = 1e-4, 1e2


@pytest.fixture(scope="module")
def ptab():
    c = Cosmology(accuracy="low")
    ks_tab = np.geomspace(1e-5, 1e3, 1200)
    pk_tab = np.asarray(c.P_lin(jnp.asarray(ks_tab), np.array([0.0])))[0]
    return c, ks_tab, pk_tab


def test_p22_p13_vs_twin(ptab):
    _, ks_tab, pk_tab = ptab
    ks = np.array([0.05, 0.1, 0.2, 0.5])
    P22 = np.asarray(spt.p22(ks, ks_tab, pk_tab, qmin=QMIN, qmax=QMAX))
    P13 = np.asarray(spt.p13(ks, ks_tab, pk_tab, qmin=QMIN, qmax=QMAX))
    for i, k in enumerate(ks):
        t22 = tspt.p22_twin(k, ks_tab, pk_tab, QMIN, QMAX)
        t13 = tspt.p13_twin(k, ks_tab, pk_tab, QMIN, QMAX)
        # jax GL self-converged to ~3e-6; the twin Simpson limits at
        # ~1e-4 at the highest k
        np.testing.assert_allclose(P22[i], t22, rtol=3e-4)
        np.testing.assert_allclose(P13[i], t13, rtol=1e-5)


def test_f13_vs_sympy():
    """The switched f13 against exact sympy evaluation, including points
    inside every Taylor window."""
    import sympy as sp
    r_s = sp.symbols('r', positive=True)
    expr = (12 / r_s**2 - 158 + 100 * r_s**2 - 42 * r_s**4
            + sp.Rational(3) / r_s**3 * (r_s**2 - 1) ** 3
            * (7 * r_s**2 + 2) * sp.log((1 + r_s) / sp.Abs(1 - r_s)))
    rs = [1e-4, 1e-3, 9e-3, 1.1e-2, 0.1, 0.5, 0.9999, 0.99999,
          1.00001, 1.0001, 2.0, 10.0, 49.0, 51.0, 200.0, 1e3]
    got = np.asarray(spt.f13(jnp.asarray(rs)))
    for i, rv in enumerate(rs):
        exact = float(expr.subs(r_s, sp.Float(rv, 50)).evalf(50))
        np.testing.assert_allclose(got[i], exact, rtol=1e-9,
                                   err_msg=f"r={rv}")


def test_f2_y_substitution_identity():
    """F2^2 in (r, y) variables equals the textbook (r, x) form."""
    rng = np.random.default_rng(0)
    r = rng.uniform(0.1, 3.0, 50)
    x = rng.uniform(-0.99, 0.99, 50)
    y = np.sqrt(1.0 + r**2 - 2.0 * r * x)
    F2x = (5.0 / 7.0 + (x - r) / (2.0 * y) * (r / y + y / r)
           + 2.0 / 7.0 * (x - r) ** 2 / y**2) ** 2
    np.testing.assert_allclose(tspt.f2_squared_of_y(r, y), F2x,
                               rtol=1e-12)


def test_ir_cancellation(ptab):
    """Galilean invariance: the qmin-sensitivity of P22 and P13 cancels
    in the sum."""
    _, ks_tab, pk_tab = ptab
    k = np.array([0.2])

    def parts(qmin):
        a = float(spt.p22(k, ks_tab, pk_tab, qmin=qmin, qmax=QMAX)[0])
        b = float(spt.p13(k, ks_tab, pk_tab, qmin=qmin, qmax=QMAX)[0])
        return a, b

    a1, b1 = parts(1e-4)
    a2, b2 = parts(3e-3)
    move_a, move_b = abs(a2 - a1), abs(b2 - b1)
    move_sum = abs((a2 + b2) - (a1 + b1))
    assert move_a > 10.0 * move_sum
    assert move_b > 10.0 * move_sum
    # the individual IR shifts are equal and opposite to ~1%
    np.testing.assert_allclose(a2 - a1, -(b2 - b1),
                               rtol=2e-2)


def test_quadratic_gradient_identity(ptab):
    """Loops are quadratic functionals of P: d/dA P1loop(A*P)|_{A=1}
    = P_lin + 2 (P22 + P13)."""
    _, ks_tab, pk_tab = ptab
    ks = jnp.asarray([0.1, 0.3])

    def f(A):
        return spt.p1loop(ks, ks_tab, A * jnp.asarray(pk_tab),
                          n_q=128, n_x=64, n_q13=256,
                          qmin=QMIN, qmax=QMAX)

    g = jax.jacfwd(f)(1.0)
    tot, parts = spt.p1loop(ks, ks_tab, pk_tab, n_q=128, n_x=64,
                            n_q13=256, qmin=QMIN, qmax=QMAX,
                            return_parts=True)
    expect = parts["lin"] + 2.0 * (parts["p22"] + parts["p13"])
    np.testing.assert_allclose(np.asarray(g), np.asarray(expect),
                               rtol=1e-10)


def test_cosmology_method_and_z_scaling(ptab):
    """P_mm_1loop: z=0 equals the module, and the loop part scales as
    D^4 (EdS kernels)."""
    c, ks_tab, pk_tab = ptab
    ks = np.geomspace(0.02, 0.4, 12)
    P0 = np.asarray(c.P_mm_1loop(np.array([0.0]), ks))[0]
    direct = np.asarray(spt.p1loop(ks, ks_tab, pk_tab,
                                   qmin=QMIN, qmax=QMAX))
    np.testing.assert_allclose(P0, direct, rtol=2e-3)

    zs = np.array([0.0, 1.0])
    P = np.asarray(c.P_mm_1loop(zs, ks))
    Plin = np.asarray(c.P_lin(jnp.asarray(ks), zs))
    D = np.asarray(c.D_growth(1.0 / (1.0 + zs)))
    loop_ratio = (P[1] - Plin[1]) / (P[0] - Plin[0])
    np.testing.assert_allclose(loop_ratio, (D[1] / D[0]) ** 4,
                               rtol=1e-6)
    # physical magnitude: ~tens of percent one-loop boost at
    # k = 0.2/Mpc, z=0
    i = np.argmin(np.abs(ks - 0.2))
    assert 1.2 < P0[i] / Plin[0][i] < 2.5


# ---- IR resummation (spt.split_wiggle / bao_damping_sigma2 / p1loop_ir) ----

def test_sigma2_vs_quad(ptab):
    from scipy.integrate import quad
    from scipy.special import spherical_jn
    _, ks_tab, pk_tab = ptab
    ell = 147.0
    p_nw, _ = spt.split_wiggle(ks_tab, pk_tab,
                               jnp.asarray(pk_tab))  # template = itself
    # template = itself makes p_nw == pk_tab exactly; use it as a smooth
    # enough stand-in for the quad comparison of the INTEGRAL itself
    Pfun = tspt.pk_interp(ks_tab, np.asarray(p_nw))

    def integrand(q):
        x = q * ell
        kern = (1.0 - spherical_jn(0, x) + 2.0 * spherical_jn(2, x))
        return Pfun(np.array([q]))[0] * kern

    ref, _ = quad(integrand, float(ks_tab[0]), 0.2, limit=800)
    ref /= 6.0 * np.pi**2
    got = float(spt.bao_damping_sigma2(ks_tab, p_nw, ell))
    np.testing.assert_allclose(got, ref, rtol=1e-5)
    # magnitude: Sigma ~ 4-8 Mpc at z=0 for a Planck-like cosmology
    assert 16.0 < got < 120.0


def test_smooth_input_identity(ptab):
    """Template == input -> P_w = 0 -> p1loop_ir reduces to p1loop."""
    _, ks_tab, pk_tab = ptab
    ks = np.array([0.05, 0.15, 0.3])
    a = np.asarray(spt.p1loop_ir(ks, ks_tab, pk_tab,
                                 jnp.asarray(pk_tab), 147.0,
                                 n_q=128, n_x=64, n_q13=256,
                                 qmin=QMIN, qmax=QMAX))
    b = np.asarray(spt.p1loop(ks, ks_tab, pk_tab, n_q=128, n_x=64,
                              n_q13=256, qmin=QMIN, qmax=QMAX))
    np.testing.assert_allclose(a, b, rtol=1e-10)


def test_ir_resummed_wiggle_damping(ptab):
    """The resummed spectrum's BAO wiggles are damped by
    ~ (1 + k^2 S2) e^{-k^2 S2} relative to linear, and the broadband
    matches plain 1-loop."""
    c, ks_tab, pk_tab = ptab
    ks = np.geomspace(0.03, 0.35, 160)
    zs = np.array([0.0])
    P_ir = np.asarray(c.P_mm_1loop(zs, ks, ir_resum=True))[0]
    P_pl = np.asarray(c.P_mm_1loop(zs, ks))[0]
    # broadband agreement (wiggle-free comparison via wide smoothing)
    ratio = P_ir / P_pl
    assert np.all(np.abs(ratio - 1.0) < 0.05)

    # wiggle extraction: residuals around a smooth version of each
    from hmvec_tpu.models import linear_power as lpm
    from hmvec_tpu.models.transfer import _eh_scales
    tmpl = np.asarray(lpm.plin_approx(c.bg, np.array([0.0]),
                                      jnp.asarray(ks_tab), "eisenhu",
                                      growth_mode=c.growth_mode))[0]
    p_nw_tab, p_w_tab = spt.split_wiggle(ks_tab, pk_tab, jnp.asarray(tmpl))
    S2 = float(spt.bao_damping_sigma2(ks_tab, p_nw_tab,
                                      float(_eh_scales(c.bg)["sh_d"]
                                            / _eh_scales(c.bg)["h"])))
    # linear wiggle amplitude vs the resummed one: the IR factor
    # (1 + k2S2) e^{-k2S2} suppresses it several-fold, more at higher k
    lnk_tab = np.log(ks_tab)
    w_lin = np.interp(np.log(ks), lnk_tab,
                      np.asarray(p_w_tab) / np.asarray(p_nw_tab))
    # build the smooth counterpart of P_ir (wiggle-free input)
    P_nw_only = np.asarray(spt.p1loop_ir(
        ks, ks_tab, np.asarray(p_nw_tab), jnp.asarray(p_nw_tab), 147.0,
        qmin=QMIN, qmax=QMAX))
    w_res = P_ir / P_nw_only - 1.0

    def rms_fac(lo, hi):
        sel = (ks > lo) & (ks < hi)
        return (np.sqrt(np.mean(w_res[sel] ** 2))
                / np.sqrt(np.mean(w_lin[sel] ** 2)))

    fac_mid = rms_fac(0.15, 0.3)
    assert fac_mid < 0.7                  # strongly damped
    # damping grows with k (e^{-k^2 S2})
    assert rms_fac(0.22, 0.35) < rms_fac(0.08, 0.15)
    assert S2 > 16.0                      # Sigma ~ 4-9 Mpc scale


# ---- quadratic-bias one-loop integrals (spt.pt_bias_integrals) ----

def test_bias_integrals_vs_twin(ptab):
    _, ks_tab, pk_tab = ptab
    ks = np.array([0.1, 0.3])
    t = spt.pt_bias_integrals(ks, ks_tab, pk_tab, qmin=QMIN, qmax=QMAX)
    const = None
    # rebuild the subtraction constant the twin way
    from scipy.integrate import quad
    Pfun = tspt.pk_interp(ks_tab, pk_tab)
    const, _ = quad(lambda q: q**2 * Pfun(np.array([q]))[0] ** 2,
                    QMIN, QMAX, limit=800)
    const /= 2.0 * np.pi**2
    for i, k in enumerate(ks):
        I_f2 = tspt.bias_integral_twin(k, ks_tab, pk_tab, QMIN, QMAX,
                                       tspt.kern_f2)
        I_f2s2 = tspt.bias_integral_twin(
            k, ks_tab, pk_tab, QMIN, QMAX,
            lambda r, y, m: tspt.kern_f2(r, y, m) * tspt.kern_s2(r, y, m))
        I_1 = tspt.bias_integral_twin(k, ks_tab, pk_tab, QMIN, QMAX,
                                      lambda r, y, m: np.ones_like(y))
        I_s2 = tspt.bias_integral_twin(k, ks_tab, pk_tab, QMIN, QMAX,
                                       tspt.kern_s2)
        I_s22 = tspt.bias_integral_twin(
            k, ks_tab, pk_tab, QMIN, QMAX,
            lambda r, y, m: tspt.kern_s2(r, y, m) ** 2)
        np.testing.assert_allclose(float(t["Pb2_d"][i]), I_f2, rtol=3e-4)
        np.testing.assert_allclose(float(t["Pbs2_d"][i]), I_f2s2,
                                   rtol=3e-4)
        np.testing.assert_allclose(float(t["Pb22"][i]),
                                   0.5 * (I_1 - const), rtol=3e-4)
        np.testing.assert_allclose(float(t["Pb2s2"][i]),
                                   0.5 * (I_s2 - 2.0 / 3.0 * const),
                                   rtol=3e-4)
        np.testing.assert_allclose(float(t["Pbs22"][i]),
                                   0.5 * (I_s22 - 4.0 / 9.0 * const),
                                   rtol=3e-4)


def test_bias_renormalization_zeros(ptab):
    """The b22 / b2s2 / bs22 subtractions are exact k -> 0
    renormalizations: values at k = 1e-4 are tiny vs k = 0.2."""
    _, ks_tab, pk_tab = ptab
    t = spt.pt_bias_integrals(np.array([1e-4, 0.2]), ks_tab, pk_tab,
                              qmin=QMIN, qmax=QMAX)
    for name in ("Pb22", "Pb2s2", "Pbs22"):
        v0, v1 = float(t[name][0]), float(t[name][1])
        assert abs(v0) < 2e-3 * abs(v1), (name, v0, v1)


def test_pgg_pgm_assembly(ptab):
    """b2 = bs2 = 0 reduces exactly to b1-scaled matter 1-loop; bias
    terms move the spectrum; grad in b2 is finite."""
    _, ks_tab, pk_tab = ptab
    ks = np.array([0.1, 0.25])
    kw = dict(n_q=128, n_x=64, n_q13=256, qmin=QMIN, qmax=QMAX)
    pmm = np.asarray(spt.p1loop(ks, ks_tab, pk_tab, **kw))
    pgg0 = np.asarray(spt.pgg_1loop(ks, ks_tab, pk_tab, b1=2.0, b2=0.0,
                                    bs2=0.0, **kw))
    np.testing.assert_allclose(pgg0, 4.0 * pmm, rtol=1e-12)
    pgm0 = np.asarray(spt.pgm_1loop(ks, ks_tab, pk_tab, b1=2.0, b2=0.0,
                                    bs2=0.0, **kw))
    np.testing.assert_allclose(pgm0, 2.0 * pmm, rtol=1e-12)
    # default bs2 is the coevolution value
    pgg_cv = np.asarray(spt.pgg_1loop(ks, ks_tab, pk_tab, b1=2.0,
                                      b2=0.5, **kw))
    pgg_ex = np.asarray(spt.pgg_1loop(ks, ks_tab, pk_tab, b1=2.0,
                                      b2=0.5, bs2=-4.0 / 7.0, **kw))
    np.testing.assert_allclose(pgg_cv, pgg_ex, rtol=1e-12)

    g = jax.grad(lambda b2: jnp.sum(spt.pgg_1loop(
        ks, ks_tab, pk_tab, b1=2.0, b2=b2, **kw)))(0.5)
    assert np.isfinite(float(g))


# ---- one-loop velocity-divergence spectra + Scoccimarro RSD ----

def test_f13_velocity_vs_sympy():
    """The switched dt/tt kernels against exact sympy evaluation,
    including points inside every Taylor window."""
    import sympy as sp
    r_s = sp.symbols('r', positive=True)
    L = sp.log((1 + r_s) / sp.Abs(1 - r_s))
    exprs = {
        "dt": (24 / r_s**2 - 202 + 56 * r_s**2 - 30 * r_s**4
               + sp.Rational(3) / r_s**3 * (r_s**2 - 1) ** 3
               * (5 * r_s**2 + 4) * L),
        "tt": (12 / r_s**2 - 82 + 4 * r_s**2 - 6 * r_s**4
               + sp.Rational(3) / r_s**3 * (r_s**2 - 1) ** 3
               * (r_s**2 + 2) * L),
    }
    fns = {"dt": spt.f13_dt, "tt": spt.f13_tt}
    rs = [1e-4, 1e-3, 9e-3, 1.1e-2, 0.1, 0.5, 0.9999, 0.99999,
          1.00001, 1.0001, 2.0, 10.0, 49.0, 51.0, 200.0, 1e3]
    for name in ("dt", "tt"):
        got = np.asarray(fns[name](jnp.asarray(rs)))
        for i, rv in enumerate(rs):
            exact = float(exprs[name].subs(r_s, sp.Float(rv, 50))
                          .evalf(50))
            np.testing.assert_allclose(got[i], exact, rtol=1e-9,
                                       err_msg=f"{name} r={rv}")


def test_velocity_loops_vs_twin(ptab):
    _, ks_tab, pk_tab = ptab
    ks = np.array([0.1, 0.3])
    v = spt.p22_velocity(ks, ks_tab, pk_tab, qmin=QMIN, qmax=QMAX)
    P13dt = np.asarray(spt.p13_dt(ks, ks_tab, pk_tab, qmin=QMIN,
                                  qmax=QMAX))
    P13tt = np.asarray(spt.p13_tt(ks, ks_tab, pk_tab, qmin=QMIN,
                                  qmax=QMAX))
    for i, k in enumerate(ks):
        t_dd = tspt.p22_kern_twin(
            k, ks_tab, pk_tab, QMIN, QMAX,
            lambda r, y, m: tspt.kern_f2(r, y, m) ** 2)
        t_dt = tspt.p22_kern_twin(
            k, ks_tab, pk_tab, QMIN, QMAX,
            lambda r, y, m: tspt.kern_f2(r, y, m) * tspt.kern_g2(r, y, m))
        t_tt = tspt.p22_kern_twin(
            k, ks_tab, pk_tab, QMIN, QMAX,
            lambda r, y, m: tspt.kern_g2(r, y, m) ** 2)
        np.testing.assert_allclose(float(v["dd"][i]), t_dd, rtol=3e-4)
        np.testing.assert_allclose(float(v["dt"][i]), t_dt, rtol=3e-4)
        np.testing.assert_allclose(float(v["tt"][i]), t_tt, rtol=3e-4)
        np.testing.assert_allclose(
            P13dt[i], tspt.p13_kern_twin(k, ks_tab, pk_tab, QMIN, QMAX,
                                         tspt.f13_dt_direct, 252.0),
            rtol=1e-5)
        np.testing.assert_allclose(
            P13tt[i], tspt.p13_kern_twin(k, ks_tab, pk_tab, QMIN, QMAX,
                                         tspt.f13_tt_direct, 84.0),
            rtol=1e-5)
    # p22_velocity's dd channel IS p22 (shared-kernel consistency)
    P22 = np.asarray(spt.p22(ks, ks_tab, pk_tab, qmin=QMIN, qmax=QMAX))
    np.testing.assert_allclose(np.asarray(v["dd"]), P22, rtol=1e-12)


def test_velocity_ordering_and_low_k(ptab):
    """theta decoheres: P_tt < P_dt < P_dd at quasi-linear k; all three
    converge to P_lin at low k."""
    _, ks_tab, pk_tab = ptab
    p = spt.pk_velocity_1loop(np.array([0.005, 0.2]), ks_tab, pk_tab,
                              n_q=256, n_x=128, n_q13=512,
                              qmin=QMIN, qmax=QMAX)
    # tt's P22/P13 cancellation is less complete than dd's at low k
    # (the residual ~0.2% here is the physical one-loop remainder)
    assert abs(float(p["dt"][0] / p["dd"][0]) - 1.0) < 2e-3
    assert abs(float(p["tt"][0] / p["dd"][0]) - 1.0) < 6e-3
    assert float(p["tt"][1]) < float(p["dt"][1]) < float(p["dd"][1])


def test_scoccimarro_kaiser_identity(ptab):
    """P_dd = P_dt = P_tt reduces scoccimarro_pk_mu to the Kaiser
    form exactly (both FoG flavors), and the sigma_v = 0 multipoles
    match the closed-form Kaiser factors."""
    from hmvec_tpu.models import rsd
    _, ks_tab, pk_tab = ptab
    ks = np.geomspace(0.02, 0.3, 16)
    P = jnp.asarray(np.interp(np.log(ks), np.log(ks_tab), pk_tab))
    mus = np.linspace(-0.95, 0.95, 9)
    b, f = 1.7, 0.52
    for fog in ("gaussian", "lorentzian"):
        got = rsd.scoccimarro_pk_mu(ks, mus, P, P, P, b, f,
                                    sigma_v=3.1, fog=fog)
        want = rsd.kaiser_pk_mu(ks, mus, P, b, f, sigma_v=3.1, fog=fog)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-12)
    mp = rsd.scoccimarro_multipoles(ks, P, P, P, b, f, sigma_v=0.0)
    fac = rsd.kaiser_multipole_factors(b, f)
    for ell in (0, 2, 4):
        np.testing.assert_allclose(np.asarray(mp[ell]),
                                   fac[ell] * np.asarray(P), rtol=1e-12)
    # sigma_v magnitude: ~4-8 Mpc for a Planck-like z=0 spectrum
    sv = float(rsd.sigma_v_lin(ks_tab, pk_tab))
    assert 3.0 < sv < 10.0
