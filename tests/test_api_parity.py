"""API-surface parity: the reference's public symbols exist and work."""

import numpy as np
import jax.numpy as jnp


def test_uk_validators_agree():
    """uk_fft vs uk_brute_force on an NFW-like profile (reference cross-
    check bin/test_generic_fft.py style)."""
    from hmvec_tpu.ops.sine_transform import uk_fft, uk_brute_force

    rhofunc = lambda r: 1.0 / (r / 0.3) / (1.0 + r / 0.3) ** 2
    kts, uk = uk_fft(rhofunc, jnp.asarray(2.0), dr=0.005, rmax=60.0)
    kts, uk = np.asarray(kts), np.asarray(uk)
    r = np.arange(0.005, 60.0, 0.005)
    ks_test = np.array([0.5, 1.0, 5.0])
    ub = np.asarray(uk_brute_force(jnp.asarray(r),
                                   jnp.asarray(rhofunc(r)), 2.0, ks_test))
    for i, k in enumerate(ks_test):
        u_interp = np.interp(k, kts[1:], uk[1:])
        # the fft_integral step convention carries an O(k dr) phase offset
        # vs exact quadrature (deliberate reference parity; fft.py:46-48),
        # so this is a visual-check-level agreement, not spectral
        assert abs(u_interp - ub[i]) < 2e-2, (k, u_interp, ub[i])


def test_cosmology_helpers():
    from hmvec_tpu.models.cosmology import a2z, get_eds_model, Cosmology
    np.testing.assert_allclose(np.asarray(a2z(np.array([0.5, 1.0]))),
                               [1.0, 0.0])
    eds = get_eds_model()
    c = Cosmology(params=eds)
    assert abs(c.omm0 - 1.0) < 1e-12
    assert float(c.get_Omega_nu()) == 0.0


def test_hod_aliases():
    from hmvec_tpu.models.hod import (Mstellar_halo, Mhalo_stellar, avg_Nc,
                                      avg_NsNsm1, avg_NcNs)
    zs = np.array([0.5])
    mh = np.asarray(Mhalo_stellar(zs, np.array([[10.0, 11.0]])))
    assert mh.shape == (1, 2) and np.all(np.diff(mh) > 0)
    ms = np.asarray(Mstellar_halo(zs, np.array([12.0, 13.0])))
    assert np.all(np.diff(ms) > 0)
    nc = np.asarray(avg_Nc(np.array([[12.0, 13.0, 14.0]]), zs,
                           np.array([[10.5]]), 0.2))
    assert np.all(np.diff(nc) > 0) and np.all((nc >= 0) & (nc <= 1))
    Ns = jnp.asarray([[0.5, 2.0]])
    Nc = jnp.asarray([[0.9, 1.0]])
    np.testing.assert_allclose(np.asarray(avg_NsNsm1(Nc, Ns, "min")),
                               np.asarray(Ns) ** 2)
    np.testing.assert_allclose(np.asarray(avg_NcNs(Nc, Ns, "max")),
                               np.asarray(Ns))


def test_subhalo_mass_function():
    from hmvec_tpu.models.mass_function import n_ln_m_sub, simple_f_nu_tinker2008
    out = np.asarray(n_ln_m_sub(np.geomspace(1e10, 1e12, 5),
                                np.geomspace(1e13, 1e15, 3)))
    assert out.shape == (5, 3)
    assert np.all(out >= 0)
    f = np.asarray(simple_f_nu_tinker2008(np.array([0.5, 1.0, 3.0])))
    assert np.all(f > 0)


def test_baryon_suppression_ballpark():
    """Total-matter suppression from AGN feedback should be a few percent
    at k ~ 1-10 (the reference validates visually against Schneider
    Horizon-AGN/OWLS curves, bin/tests.py:517-547)."""
    from hmvec_tpu.models.halo_model import HaloModel
    zs = np.array([0.0])
    ks = np.geomspace(0.05, 10, 60)
    ms = np.geomspace(1e10, 1e16, 80)
    hm = HaloModel(zs, ks, ms=ms)
    hm.add_battaglia_profile("e", family="AGN", nxs=800, xmax=15)
    Pnn = np.asarray(hm.get_power("nfw"))
    Pne = np.asarray(hm.get_power("nfw", "e"))
    Pee = np.asarray(hm.get_power("e"))
    Pmm = np.asarray(hm.total_matter_power_spectrum(Pnn, Pne, Pee))
    ratio = Pmm / Pnn
    sel = (ks > 1) & (ks < 10)
    assert np.all(ratio[0, sel] < 1.0)
    assert np.all(ratio[0, sel] > 0.6)


def test_pmm_linear_nonlinear_wrappers():
    """P_mm_linear / P_mm_nonlinear (reference cosmology.py:104-108 --
    `pass` stubs there, implemented here), round-3 API sweep."""
    from hmvec_tpu.models.cosmology import Cosmology
    from hmvec_tpu.models.hmcode import hmcode_power
    from hmvec_tpu.models.halofit import halofit_power

    c = Cosmology()
    zs = np.array([0.0, 1.0])
    ks = np.geomspace(1e-3, 5.0, 32)
    np.testing.assert_allclose(np.asarray(c.P_mm_linear(zs, ks)),
                               np.asarray(c.P_lin(ks, zs)), rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(c.P_mm_nonlinear(ks, zs)),
        np.asarray(hmcode_power(c, zs, ks)), rtol=1e-10)
    np.testing.assert_allclose(
        np.asarray(c.P_mm_nonlinear(ks, zs, halofit_version="takahashi")),
        np.asarray(halofit_power(c, zs, ks)), rtol=1e-10)
    assert c.halofit is None  # restored after the temporary dispatch


def test_d_growth_exact_alias():
    """D_growth(exact=True) / D_growth_exact_arbitrary_norm route through
    the ODE growing mode (reference cosmology.py:288-294 alias)."""
    from hmvec_tpu.models.cosmology import Cosmology

    c = Cosmology()
    a = np.array([0.25, 0.5, 1.0])
    d_exact = np.asarray(c.D_growth(a, exact=True))
    d_closed = np.asarray(c.D_growth(a))
    np.testing.assert_allclose(d_exact, d_closed, rtol=1e-7)  # LCDM limit
    d_arb = np.asarray(c.D_growth_exact_arbitrary_norm(a))
    np.testing.assert_allclose(d_arb / d_arb[-1],
                               np.asarray(c.D_growth(a, type="z0norm")),
                               rtol=1e-7)

    cw = Cosmology({"w0": -0.8})
    assert cw.growth_mode == "ode"
    dw = np.asarray(cw.D_growth(a, type="z0norm"))
    assert np.max(np.abs(dw / np.asarray(c.D_growth(a, type="z0norm"))
                         - 1.0)) > 1e-3


def test_reference_free_function_stragglers():
    """Round-3 API sweep stragglers: get_avail_cls, fft_integral /
    analytic_fft_integral, Mhalo_stellar_core, NlnMsub / simple_f_nu
    aliases, mdelta_from_mdelta_unvectorized -- each against the
    reference source (via _refload) or the twin where pure numpy."""
    import hmvec_tpu as hm
    from _refload import load_ref

    # cov.get_avail_cls (reference cov.py:25-31; reversed-key lookup
    # fixed -- the reference's fallback references an out-of-scope self)
    acls = {"k_g": 7.0}
    assert hm.get_avail_cls(acls, "k", "g") == 7.0
    assert hm.get_avail_cls(acls, "g", "k") == 7.0
    assert hm.get_avail_cls(acls, "g", "y") == 0

    # fft_integral: bit-level parity with the twin (which reproduces the
    # reference's step = extent/N convention) and the reference's own
    # analytic Gaussian check (fft.py:41-53)
    from hmvec_tpu.twin.profile_fft import fft_integral as tw_fft
    x = np.arange(0.002, 50.0, 0.002)
    kj, uj = hm.fft_integral(x, np.exp(-x**2 / 2.0))
    kt, ut = tw_fft(x, np.exp(-x**2 / 2.0))
    assert np.max(np.abs(np.asarray(uj) - ut)) < 1e-12
    sel = (np.asarray(kj) > 0.1) & (np.asarray(kj) < 5.0)
    ana = np.asarray(hm.analytic_fft_integral(kj))
    assert np.max(np.abs(np.asarray(uj) - ana)[sel]) < 5e-3

    # Mhalo_stellar_core: exact vs the reference function (hmvec.py:648)
    refh = load_ref("hmvec")
    args = (10.5, 0.8, 10.72, 0.55, 12.35, 0.28, 0.44, 0.18,
            1.56, 2.51, 0.57, 0.17)
    assert abs(float(hm.Mhalo_stellar_core(*args))
               - refh.Mhalo_stellar_core(*args)) < 1e-12

    # tinker aliases (reference names)
    np.testing.assert_array_equal(
        np.asarray(hm.simple_f_nu(np.array([0.5, 2.0]))),
        np.asarray(__import__("hmvec_tpu.models.mass_function",
                              fromlist=["x"]).simple_f_nu_tinker2008(
                                  np.array([0.5, 2.0]))))
    assert np.asarray(hm.NlnMsub(np.geomspace(1e10, 1e12, 4),
                                 np.geomspace(1e13, 1e15, 3))).shape == (4, 3)

    # scalar mass-def conversion agrees with the vectorized grid path
    d1, d2 = 200.0 * 2.8e11, 500.0 * 2.8e11
    Mv = np.asarray(hm.mdelta_from_mdelta(
        np.array([1e13]), np.array([[5.0]]), np.array([d1]),
        np.array([d2])))[0, 0]
    Ms = float(hm.mdelta_from_mdelta_unvectorized(1e13, 5.0, d1, d2))
    assert abs(Mv / Ms - 1.0) < 1e-12


def test_get_pk_interpolator():
    """Cosmology.get_pk_interpolator (reference cosmology.py:772-810):
    .P(zs, ks, grid=True) evaluator for var='total'/'weyl'/'cb',
    linear + nonlinear, and the return_z_k form."""
    from hmvec_tpu.models.cosmology import Cosmology

    c = Cosmology()
    zs = np.array([0.0, 1.0])
    ks = np.geomspace(1e-3, 1.0, 12)
    PK = c.get_pk_interpolator(zs, kmax=10.0, var="total", nonlinear=False)
    np.testing.assert_allclose(np.asarray(PK.P(zs, ks)),
                               np.asarray(c.P_mm_linear(zs, ks)),
                               rtol=1e-12)
    # weyl: Poisson-relation prefactor (same stand-in as
    # cmb_lensing_limber; exact relation to the matter power)
    pw = np.asarray(c.get_pk_interpolator(zs, kmax=10.0, var="weyl")
                    .P(zs, ks))
    h0i = float(c.bg.H0) / 299792.458
    pref = (1.5 * float(c.bg.omm0) * h0i**2 * (1.0 + zs))[:, None] ** 2
    np.testing.assert_allclose(
        pw, pref * np.asarray(c.P_mm_linear(zs, ks)) / ks[None, :] ** 4,
        rtol=1e-10)
    # nonlinear total boosts small scales
    pnl = np.asarray(c.get_pk_interpolator(zs, kmax=10.0, var="total",
                                           nonlinear=True).P(zs, ks))
    assert pnl[0, -1] > 2.0 * np.asarray(c.P_mm_linear(zs, ks))[0, -1]
    # cb (linear, EH engine) finite and close to total at mnu=0
    pcb = np.asarray(c.get_pk_interpolator(zs, kmax=10.0, var="cb")
                     .P(zs, ks))
    np.testing.assert_allclose(pcb, np.asarray(c.P_mm_linear(zs, ks)),
                               rtol=1e-10)
    PKr, za, ka = c.get_pk_interpolator(zs, kmax=10.0, var="total",
                                        return_z_k=True)
    assert za.shape == (2,) and ka[-1] == 10.0


def test_reference_public_symbol_sweep():
    """Every module-level public def/class in the reference package resolves
    from the hmvec_tpu top level (mechanical sweep; renames are explicit).

    This guards the migration promise: a reference user's `from hmvec import
    X` has a documented `hmvec_tpu.X` (MIGRATION.md maps the exceptions).
    """
    import re
    import pathlib
    import hmvec_tpu as h

    # explicit mappings / intentional absences
    renamed = {
        # the reference's KnoxCov is a truncated method lifted out of some
        # class (`self._bin_cls` is undefined in cov.py:65-88); the
        # completed equivalent is knox_cov / GaussianCov.get_cov
        "KnoxCov": "knox_cov",
        # reference tinker.py module name kept as the alias `bias`
        "bias": "bias",
        # self-test helper in the reference utils, not API
        "test_bisection_search": None,
        # scipy-spline P(z,k) interpolator; the jax-native equivalent is
        # TabulatedEngine (tensor-product Catmull-Rom, measured parity in
        # tests/test_tabulated_semantics.py)
        "get_matter_power_interpolator_generic": "TabulatedEngine",
    }
    ref = pathlib.Path("/root/reference/hmvec")
    missing = []
    for f in ["cosmology", "cov", "fft", "hmvec", "ksz", "params",
              "tinker", "utils"]:
        src = (ref / f"{f}.py").read_text()
        for m in re.finditer(r"^(?:def|class)\s+(\w+)", src, re.M):
            name = m.group(1)
            if name.startswith("_"):
                continue
            target = renamed.get(name, name)
            if target is None:
                continue
            if not hasattr(h, target):
                missing.append(f"{f}.{name}")
    assert not missing, missing


def test_reference_named_free_functions_numerics():
    """The newly exported reference-named helpers compute the documented
    quantities (spot numerics, not just importability)."""
    import hmvec_tpu as h

    # R_from_M: (3M/4 pi delta rho)^(1/3)  (hmvec.py:627-628)
    M, rho, delta = 1e14, 2.775e11 * 0.31, 200.0
    np.testing.assert_allclose(float(h.R_from_M(M, rho, delta)),
                               (3 * M / (4 * np.pi * delta * rho)) ** (1 / 3),
                               rtol=1e-12)

    # chi: ionization factor (ksz.py:71-73)
    Yp = 0.24
    np.testing.assert_allclose(float(h.chi(Yp)),
                               (1 - Yp) / (1 - Yp / 2), rtol=1e-12)

    # f_nu: Tinker-2010 shape; consistency norm enforces int b f dnu = 1
    # (integrate on the same static grid the norm uses, tinker.py:63-66)
    nus = np.logspace(-8, 2, 10000)
    zv = np.array([0.0, 2.0])
    fn = np.asarray(h.f_nu(nus[None, :], zv[:, None]))
    bn = np.asarray(h.bias(nus))[None, :]
    total = np.trapezoid(fn * bn, nus, axis=-1)
    np.testing.assert_allclose(total, 1.0, rtol=1e-6)
    # norm_consistency=False returns the unnormalized form (the norm is a
    # per-z scalar; compare two healthy columns -- the tail underflows)
    fn_un = np.asarray(h.f_nu(nus[None, :], zv[:, None],
                              norm_consistency=False))
    cols = [4000, 6000]
    ratio = fn[:, cols] / fn_un[:, cols]
    np.testing.assert_allclose(ratio[:, 0], ratio[:, 1], rtol=1e-12)

    # vectorized_bisection_search: invert y^3 on [0, 4] for x in [1, 8]
    xs = np.array([1.0, 8.0, 27.0])
    ys = np.asarray(h.vectorized_bisection_search(
        xs, lambda y: y**3, (0.0, 4.0)))
    np.testing.assert_allclose(ys, [1.0, 2.0, 3.0], rtol=1e-10)

    # interp: fill 0 outside the table (utils.py:6-7)
    f = h.interp(np.array([0.0, 1.0]), np.array([1.0, 3.0]))
    np.testing.assert_allclose(np.asarray(f(np.array([-1.0, 0.5, 2.0]))),
                               [0.0, 2.0, 0.0])
