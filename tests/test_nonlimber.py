"""Exact (non-Limber) C_l: twin parity, Limber convergence, jit/grad.

The jax path (models/nonlimber.py) is FFTLog-based (shared-grid multi-ell
Bessel projection, j'' recurrence, j/x^2 identity); the oracle
(twin/nonlimber.py) evaluates scipy spherical_jn on linear chi grids with
the Bessel-ODE j'' identity -- independent algorithms end to end.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hmvec_tpu.params import merge_params
from hmvec_tpu.models import background as bgm, linear_power as lpm
from hmvec_tpu.models import nonlimber as nlm, limber as lim
from hmvec_tpu.twin.core import TwinCosmology
from hmvec_tpu.twin import nonlimber as tnl

ELLS = [2, 10, 50]
KS = np.geomspace(1e-5, 10.0, 600)
GZS = np.linspace(0.2, 0.9, 160)
GDNDZ = np.exp(-0.5 * ((GZS - 0.55) / 0.08) ** 2)


@pytest.fixture(scope="module")
def setup():
    params = merge_params()
    bg = bgm.background(params)
    tw = TwinCosmology(params)
    pk0 = np.asarray(lpm.plin_approx(bg, jnp.asarray([0.0]),
                                     jnp.asarray(KS)))[0]
    return params, bg, tw, pk0


def test_cgg_exact_vs_twin(setup):
    _, bg, tw, pk0 = setup
    cj = np.asarray(nlm.C_gg_exact(bg, ELLS, KS, pk0, GZS, GDNDZ, bias=2.0))
    ct = tnl.C_gg_exact(tw, ELLS, KS, pk0, GZS, GDNDZ, bias=2.0,
                        n_chi=2500, n_k=800)
    np.testing.assert_allclose(cj, ct, rtol=3e-4)


def test_cgg_rsd_vs_twin(setup):
    _, bg, tw, pk0 = setup
    cj = np.asarray(nlm.C_gg_exact(bg, ELLS, KS, pk0, GZS, GDNDZ, bias=2.0,
                                   rsd=True))
    ct = tnl.C_gg_exact(tw, ELLS, KS, pk0, GZS, GDNDZ, bias=2.0, rsd=True,
                        n_chi=2500, n_k=800)
    np.testing.assert_allclose(cj, ct, rtol=3e-4)
    # RSD must add power for an l-range where the Kaiser term is positive
    cd = np.asarray(nlm.C_gg_exact(bg, ELLS, KS, pk0, GZS, GDNDZ, bias=2.0))
    assert np.all(cj > cd)


def test_cgg_magnification_vs_twin(setup):
    _, bg, tw, pk0 = setup
    cj = np.asarray(nlm.C_gg_exact(bg, ELLS, KS, pk0, GZS, GDNDZ, bias=2.0,
                                   smag=1.2))
    ct = tnl.C_gg_exact(tw, ELLS, KS, pk0, GZS, GDNDZ, bias=2.0, smag=1.2,
                        n_chi=2500, n_k=800)
    np.testing.assert_allclose(cj, ct, rtol=3e-4)


def test_ckg_cmb_vs_twin(setup):
    _, bg, tw, pk0 = setup
    cj = np.asarray(nlm.C_kg_exact(bg, ELLS, KS, pk0, GZS, GDNDZ, bias=2.0,
                                   lzs=1100.0))
    ct = tnl.C_kg_exact(tw, ELLS, KS, pk0, GZS, GDNDZ, lzs=1100.0, bias=2.0,
                        n_chi=2500, n_k=800)
    np.testing.assert_allclose(cj, ct, rtol=1e-3)


def test_ckk_vs_twin(setup):
    _, bg, tw, pk0 = setup
    cj = np.asarray(nlm.C_kk_exact(bg, ELLS, KS, pk0, lzs1=2.0))
    ct = tnl.C_kk_exact(tw, ELLS, KS, pk0, lzs=2.0, n_chi=2500, n_k=800)
    np.testing.assert_allclose(cj, ct, rtol=4e-3)


def test_limber_converges_to_exact_at_high_ell(setup):
    """Limber must approach the exact result at high ell (O(1/l^2)) and
    be badly wrong at l=2 for this narrow window -- the module's reason
    to exist."""
    _, bg, _, pk0 = setup
    ells = [2, 20, 100]
    cj = np.asarray(nlm.C_gg_exact(bg, ells, KS, pk0, GZS, GDNDZ, bias=2.0))
    zs_l = np.linspace(0.2, 0.9, 120)
    Pzk = np.asarray(lpm.plin_approx(bg, jnp.asarray(zs_l), jnp.asarray(KS)))
    cl_lim = 4.0 * np.asarray(lim.C_gg(bg, jnp.asarray([2.0, 20.0, 100.0]),
                                       zs_l, KS, Pzk, GZS, GDNDZ))
    rel = cl_lim / cj - 1.0
    assert abs(rel[0]) > 0.2          # Limber fails at l=2 (measured -44%)
    assert abs(rel[1]) < 0.02         # converging
    assert abs(rel[2]) < 5e-3         # converged


def test_jpp_recurrence_vs_ode_identity():
    """The {l-2, l, l+2} recurrence for j_l'' against the Bessel-ODE form
    at the Delta level (not just through C_l)."""
    from scipy.special import spherical_jn
    chis = np.geomspace(50.0, 4000.0, 1024)
    phi = np.exp(-0.5 * ((chis - 1500.0) / 300.0) ** 2)
    ks, d = nlm.bessel_deltas_j2pp(jnp.asarray(phi), chis, [5],
                                   taper_frac=0.02)
    ks = np.asarray(ks)
    sel = (ks > 3e-3) & (ks < 0.3)
    x = ks[sel, None] * chis[None, :]
    j = spherical_jn(5, x)
    jp = spherical_jn(5, x, derivative=True)
    jpp = -2.0 * jp / x - (1.0 - 30.0 / x**2) * j
    ref = -np.trapezoid(phi[None, :] * jpp, chis, axis=-1)
    got = np.asarray(d)[0, sel]
    scale = np.max(np.abs(ref))
    np.testing.assert_allclose(got, ref, atol=2e-4 * scale, rtol=2e-3)


def test_jit_and_grad(setup):
    params, bg, _, pk0 = setup

    @jax.jit
    def f(omch2):
        p = dict(params)
        p["omch2"] = omch2
        b = bgm.background(p)
        return nlm.C_gg_exact(b, [10], KS, pk0, GZS, GDNDZ, bias=2.0)[0]

    g = jax.grad(f)(params["omch2"])
    assert np.isfinite(float(g))
    eps = 1e-4
    fd = (float(f(params["omch2"] + eps)) - float(f(params["omch2"] - eps))) \
        / (2 * eps)
    np.testing.assert_allclose(float(g), fd, rtol=2e-4)


def test_zinv_newton_gradient():
    """The Newton-polished z(chi) carries the implicit-function derivative
    (the bare bisection's parameter gradient is identically zero)."""
    params = merge_params()

    def zf(omch2):
        p = dict(params)
        p["omch2"] = omch2
        return bgm.redshift_at_comoving_radial_distance(
            bgm.background(p), 1000.0)

    g = float(jax.grad(zf)(params["omch2"]))
    eps = 1e-5
    fd = (float(zf(params["omch2"] + eps))
          - float(zf(params["omch2"] - eps))) / (2 * eps)
    assert g != 0.0
    np.testing.assert_allclose(g, fd, rtol=1e-7)


def test_cosmology_class_api(setup):
    from hmvec_tpu import Cosmology
    _, bg, _, pk0 = setup
    hc = Cosmology()
    cl = np.asarray(hc.C_gg_exact([10], KS, pk0, GZS, GDNDZ, bias=2.0))
    ref = np.asarray(nlm.C_gg_exact(bg, [10], KS, pk0, GZS, GDNDZ, bias=2.0))
    np.testing.assert_allclose(cl, ref, rtol=1e-12)


def test_lensing_row_requires_l_ge_2(setup):
    """The j_l/x^2 recurrence has no j_{-1}/j_{-2} legs: l < 2 must raise
    (substituting j_0 is silently wrong by ~200x at l = 1)."""
    _, bg, _, pk0 = setup
    chis = nlm.chi_loggrid(n=256)
    phi = nlm.galaxy_kernel(bg, chis, GZS, GDNDZ)
    with pytest.raises(ValueError, match="ells >= 2"):
        nlm.bessel_deltas_over_x2(phi, chis, [1, 10, 40])
    with pytest.raises(ValueError, match="ells >= 2"):
        nlm.C_kk_exact(bg, np.array([1, 20]), KS, pk0, lzs1=1.5, chis=chis)


# ---------------- hybrid exact + Limber for nonlinear spectra ----------------

def test_hybrid_separable_reduces_to_exact(setup):
    """When the 'nonlinear' spectrum IS the separable linear one, the two
    Limber terms cancel exactly and the hybrid equals the exact C_l."""
    _, bg, _, pk0 = setup
    zs_nl = np.linspace(0.05, 1.5, 40)
    from hmvec_tpu.models import background as bgm2
    D = np.asarray(bgm2.growth_unnormalized(bg, 1.0 / (1.0 + zs_nl)))
    D0 = float(bgm2.growth_unnormalized(bg, jnp.asarray(1.0)))
    bias = 1.7
    pzk_sep = bias**2 * (D / D0)[:, None] ** 2 * pk0[None, :]
    hyb = np.asarray(nlm.C_gg_hybrid(bg, ELLS, KS, pk0, zs_nl, pzk_sep,
                                     GZS, GDNDZ, bias=bias))
    exact = np.asarray(nlm.C_gg_exact(bg, ELLS, KS, pk0, GZS, GDNDZ,
                                      bias=bias))
    np.testing.assert_allclose(hyb, exact, rtol=1e-12)


def test_hybrid_tracks_limber_at_high_ell(setup):
    """With a genuinely non-separable boost, the hybrid converges to the
    Limber of the FULL spectrum at high ell (bracket ~ 1/ell^2) while
    departing from it at low ell by the known linear Limber error."""
    _, bg, _, pk0 = setup
    from hmvec_tpu.models import background as bgm2, limber as lim
    zs_nl = np.linspace(0.05, 1.5, 40)
    D = np.asarray(bgm2.growth_unnormalized(bg, 1.0 / (1.0 + zs_nl)))
    D0 = float(bgm2.growth_unnormalized(bg, jnp.asarray(1.0)))
    # toy nonlinear boost: scale- and z-dependent (non-separable)
    boost = 1.0 + (np.asarray(KS)[None, :] / 1.0) ** 1.5 \
        / (1.0 + zs_nl[:, None])
    pzk_nl = (D / D0)[:, None] ** 2 * pk0[None, :] * boost
    ells_hi = [150, 300]
    hyb = np.asarray(nlm.C_gg_hybrid(bg, ells_hi, KS, pk0, zs_nl, pzk_nl,
                                     GZS, GDNDZ))
    limb = np.asarray(lim.C_gg(bg, ells_hi, zs_nl, KS, pzk_nl, GZS, GDNDZ))
    np.testing.assert_allclose(hyb, limb, rtol=2e-3)
    # at low ell the correction is the linear Limber error: percent-level
    # positive-definite structure, not noise
    ells_lo = [2, 10]
    hyb_lo = np.asarray(nlm.C_gg_hybrid(bg, ells_lo, KS, pk0, zs_nl, pzk_nl,
                                        GZS, GDNDZ))
    limb_lo = np.asarray(lim.C_gg(bg, ells_lo, zs_nl, KS, pzk_nl, GZS,
                                  GDNDZ))
    rel = np.abs(hyb_lo / limb_lo - 1.0)
    assert rel[0] > 0.02            # Limber genuinely wrong at ell = 2
    assert np.all(np.isfinite(hyb_lo)) and np.all(hyb_lo > 0)
