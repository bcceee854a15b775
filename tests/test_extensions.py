"""Extension families beyond the reference: Press-Schechter / Despali-16
mass functions, Bhattacharya-13 concentrations, and the Einasto profile.

The reference ships only sheth-torman/tinker mass functions
(hmvec/hmvec.py:133-161), Duffy concentration (hmvec.py:163-176, raises
otherwise), and NFW/Battaglia profiles.  Each extension here is pinned
against an independent numpy/scipy evaluation, an analytic identity where
one exists (PS), and a same-regime envelope against the established family.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.integrate import quad

from hmvec_tpu.models.halo_model import HaloModel
from hmvec_tpu.models import mass_function as mfm
from hmvec_tpu.models import profiles as prof
from hmvec_tpu.twin.halo import TwinHaloModel
from hmvec_tpu.twin import profile_fft as tpf

ZS = np.array([0.0, 0.6, 1.2])
KS = np.geomspace(1e-3, 20.0, 64)
MS = np.geomspace(1e10, 1e16, 80)   # canonical nm=80
DELTAC = 1.686


@pytest.fixture(scope="module")
def pair():
    hc = HaloModel(ZS, KS, ms=MS)
    tw = TwinHaloModel(ZS, KS, MS)
    return hc, tw


ZL = np.array([0.3, 0.8, 1.4])  # z > 0: the Limber-side tests divide by chi


@pytest.fixture(scope="module")
def hc_lim():
    return HaloModel(ZL, KS, ms=MS)


# ---------------- mass-function families ----------------

def test_ps_despali_twin_parity(pair):
    hc, tw = pair
    for mode in ("press-schechter", "despali"):
        nzm_j, bh_j = mfm.mass_function_grid(
            hc.sigma2, hc.zs, hc.ms, hc.rho_matter_z(0.0), mode, hc.p)
        tw.mode = mode
        tw.init_mass_function()
        np.testing.assert_allclose(np.asarray(nzm_j), tw.nzm, rtol=1e-10)
        np.testing.assert_allclose(np.asarray(bh_j), tw.bh, rtol=1e-10)
    tw.mode = "sheth-torman"
    tw.init_mass_function()


def test_ps_analytic_identity():
    """PS is exact math, not a fit: nu f(nu) = sqrt(2/pi) nu e^{-nu^2/2},
    so f integrates to exactly 1 over nu, and the code's closed form at
    (A, a, p) = (1/2, 1, 0) must reproduce it pointwise."""
    nus = np.geomspace(0.05, 8.0, 200)
    sigma2 = (DELTAC / nus) ** 2
    fs = np.asarray(mfm.fsigmaz_sheth_torman(jnp.asarray(sigma2),
                                             mfm._PS_PARAMS))
    expected = np.sqrt(2.0 / np.pi) * nus * np.exp(-nus**2 / 2.0)
    np.testing.assert_allclose(fs, expected, rtol=1e-13)
    total, _ = quad(lambda n: np.sqrt(2.0 / np.pi) * np.exp(-n**2 / 2.0),
                    0.0, np.inf)
    assert abs(total - 1.0) < 1e-12


def test_ps_bias_is_mo_white():
    """Peak-background split of PS must give the exact Mo-White bias
    b = 1 + (nu^2 - 1)/deltac."""
    nus = np.geomspace(0.2, 5.0, 50)
    sigma2 = (DELTAC / nus) ** 2
    b = np.asarray(mfm.bias_sheth_torman(jnp.asarray(sigma2),
                                         mfm._PS_PARAMS))
    np.testing.assert_allclose(b, 1.0 + (nus**2 - 1.0) / DELTAC, rtol=1e-13)


def test_despali_tracks_st(pair):
    """Despali-16 is an ST-form refit on virial masses: around nu ~ 1 the
    two should agree at the tens-of-percent level (a transcription slip in
    the constants would blow this envelope)."""
    hc, _ = pair
    nus = np.asarray(DELTAC / np.sqrt(hc.sigma2[0]))
    sel = (nus > 0.8) & (nus < 2.0)
    f_st = np.asarray(mfm.fsigmaz_sheth_torman(hc.sigma2[0], hc.p))[sel]
    f_de = np.asarray(mfm.fsigmaz_sheth_torman(
        hc.sigma2[0], mfm._DESPALI_PARAMS))[sel]
    assert np.all(np.abs(f_de / f_st - 1.0) < 0.35)
    ratio = f_de / f_st
    assert 0.8 < np.median(ratio) < 1.25


def test_mass_function_ctor_dispatch():
    hc = HaloModel(ZS[:1], KS[:8], ms=MS, mass_function="despali")
    assert np.all(np.isfinite(np.asarray(hc.nzm)))
    assert np.all(np.asarray(hc.nzm) >= 0.0)
    with pytest.raises(NotImplementedError):
        HaloModel(ZS[:1], KS[:8], ms=MS, mass_function="nope")


# ---------------- Bhattacharya-13 concentration ----------------

def test_bhattacharya_formula_and_regime(pair):
    hc, tw = pair
    c = np.asarray(hc.concentration(mode="bhattacharya"))
    # independent numpy evaluation from the twin's sigma2 + growth
    d = np.array([tw.d_growth(1.0 / (1.0 + z), norm="z0norm") for z in ZS])
    nu = DELTAC / np.sqrt(tw.sigma2)
    expected = 7.7 * d[:, None] ** 0.90 * nu**-0.29
    np.testing.assert_allclose(c, expected, rtol=1e-7)
    # same-regime envelope vs Duffy on cluster scales at z=0
    cd = np.asarray(hc.concentration(mode="duffy"))
    sel = (MS > 1e13) & (MS < 1e15)
    assert np.all(c[0, sel] / cd[0, sel] > 0.6)
    assert np.all(c[0, sel] / cd[0, sel] < 1.7)
    # decreasing in mass, decreasing toward high z
    assert np.all(np.diff(c, axis=1) < 0.0)
    assert np.all(c[0] > c[-1])


def test_bhattacharya_concmode_end_to_end():
    hc = HaloModel(ZS[:2], KS, ms=MS, concmode="bhattacharya")
    p1 = hc.get_power_1halo("nfw")
    p2 = hc.get_power_2halo("nfw")
    assert np.all(np.isfinite(np.asarray(p1 + p2)))
    hcd = HaloModel(ZS[:2], KS, ms=MS)
    # different concentrations must move the 1-halo term, but not wildly
    r = np.asarray(p1)[:, -1] / np.asarray(hcd.get_power_1halo("nfw"))[:, -1]
    assert np.all(r > 0.4) and np.all(r < 2.5)
    assert not np.allclose(r, 1.0)


# ---------------- Einasto profile ----------------

def test_einasto_uk_low_k_and_twin_parity(pair):
    hc, tw = pair
    ks, uk = hc.add_einasto_profile("ein", alpha=0.18)
    uk = np.asarray(uk)
    assert np.all(np.isfinite(uk))
    # mass-normalized: u(k -> 0) -> 1, limited by the reference's left=flat
    # extrapolation below the first transform sample kt1/(rs(1+z)) ~ 0.06
    # (fft.py:97-115 semantics): the frozen value is the true u at that
    # first sample, 1 - O(kt1^2 <x^2>) ~ 0.8% low for this extended shape
    np.testing.assert_allclose(uk[:, :, 0], 1.0, atol=2e-2)
    assert np.all(uk[:, :, 0] <= 1.0)
    # parity against the twin transform fed the same numpy Einasto shape
    cs = np.asarray(hc.concentration())
    rvirs = np.asarray(hc.rvir(hc.ms[None, :], hc.zs[:, None]))
    rss = rvirs / cs
    _, uk_tw = tpf.generic_profile_fft(
        lambda x: np.exp(-(2.0 / 0.18) * (x**0.18 - 1.0)),
        cs, rss, ZS, KS, hc.p["nfw_integral_xmax"],
        hc.p["nfw_integral_numxs"])
    np.testing.assert_allclose(uk, uk_tw, atol=1e-8)


def test_einasto_independent_quad_oracle(pair):
    """Direct scipy quadrature of the truncated Einasto Fourier transform
    at one (z, m): u(k) = int_0^c rho x sin(qx) dx / (q int_0^c rho x^2 dx)
    with q = k r_s (1+z) -- independent of the DFT machinery.  Run on a
    finer transform grid (xmax=800, 4x finer kt spacing than the NFW
    default) so the transform's own kt-interpolation error does not
    dominate the comparison."""
    from hmvec_tpu.ops.sine_transform import generic_profile_fft as gpfft
    hc, _ = pair
    iz, im = 1, 60
    c = float(np.asarray(hc.concentration())[iz, im])
    rs = float(np.asarray(hc.rvir(hc.ms[None, :],
                                  hc.zs[:, None]))[iz, im]) / c
    alpha = 0.18
    z = float(ZS[iz])

    def rho(x):
        return np.exp(-(2.0 / alpha) * (x**alpha - 1.0))

    _, uk = gpfft(
        lambda x: prof.rho_einasto_x(x, alpha=alpha)[None, None, :],
        jnp.full((1, 1), c), jnp.full((1, 1), rs),
        jnp.array([z]), jnp.asarray(KS), 800.0, 160000)
    uk = np.asarray(uk)[0, 0]

    norm, _ = quad(lambda x: rho(x) * x**2, 0.0, c, limit=200)
    # The transform reproduces the reference's fft_integral conventions on
    # purpose (fft.py:35-51): a one-sample phase offset (the DFT phase is
    # indexed from 0 while xs starts at dx) and step = extent/N.  The
    # independent oracle must integrate the same shifted sine.
    nxs, xmax = 160000, 800.0
    stp = (xmax - xmax / nxs) / nxs
    # only ks above the first transform sample are interpolated (below it
    # the reference semantics freeze u; tested above)
    for ik in (35, 45, 52, 58):
        k = KS[ik]
        q = k * rs * (1.0 + z)
        num, _ = quad(lambda x: rho(x) * x * np.sin(q * (x - stp)), 0.0, c,
                      limit=400)
        u_ref = num / (q * norm)
        assert abs(float(uk[ik]) - u_ref) < 3e-4, ik


def test_einasto_power_end_to_end(pair):
    hc, _ = pair
    if "ein_p" not in hc.uk_profiles:
        hc.add_einasto_profile("ein_p", alpha=0.18)
    p_ein = np.asarray(hc.get_power("ein_p"))
    p_nfw = np.asarray(hc.get_power("nfw"))
    assert np.all(np.isfinite(p_ein))
    # 2-halo dominated large scales: families agree up to the ~1% low-k
    # u-freeze residue in the consistency term (see the uk test above)
    np.testing.assert_allclose(p_ein[:, 0], p_nfw[:, 0], rtol=2e-2)
    # 1-halo regime: same order of magnitude, not identical
    r = p_ein[:, -1] / p_nfw[:, -1]
    assert np.all(r > 0.3) and np.all(r < 3.0)


# ---------------- P(k) covariance: Gaussian + T1h + SSC ----------------

def test_trispectrum_1h_explicit_loop(pair):
    """T^1h einsum against an explicit numpy loop over (z, k, k')."""
    from hmvec_tpu.models import cov as covm
    hc, tw = pair
    nzm = np.asarray(hc.nzm)
    uk = np.asarray(hc.uk_profiles["nfw"])
    rho = float(np.asarray(hc.rho_matter_z(0.0)))
    t = np.asarray(covm.trispectrum_1h(hc.nzm, hc.ms, rho,
                                       hc.uk_profiles["nfw"]))
    mfac = (MS / rho) ** 2
    ksel = [0, 30, 63]
    for iz in range(len(ZS)):
        for i in ksel:
            for j in ksel:
                integ = nzm[iz] * mfac**2 * uk[iz, :, i]**2 * uk[iz, :, j]**2
                ref = np.trapezoid(integ, MS)
                np.testing.assert_allclose(t[iz, i, j], ref, rtol=1e-12)
    # symmetry and positivity
    np.testing.assert_allclose(t, np.swapaxes(t, 1, 2), rtol=1e-13)
    assert np.all(t > 0.0)


def test_pk_cov_gaussian_formula():
    from hmvec_tpu.models import cov as covm
    ks = np.geomspace(0.01, 1.0, 16)
    pk = 1e4 / (1.0 + (ks / 0.1) ** 2)
    V = 1e9
    cov = np.asarray(covm.pk_cov_gaussian(ks, pk, V))
    dks = np.gradient(ks)
    expected = 2.0 * pk**2 / (V * ks**2 * dks / (2.0 * np.pi**2))
    np.testing.assert_allclose(np.diag(cov), expected, rtol=1e-12)
    # strictly diagonal; halving V doubles the covariance
    assert np.all(cov[~np.eye(16, dtype=bool)] == 0.0)
    cov2 = np.asarray(covm.pk_cov_gaussian(ks, pk, V / 2.0))
    np.testing.assert_allclose(np.diag(cov2), 2.0 * expected, rtol=1e-12)


def test_sigma_b2_vs_quad(pair):
    """sigma_b^2 against scipy quadrature of the same integrand."""
    from hmvec_tpu.models import cov as covm
    hc, tw = pair
    V = 1e9
    ks_lin = np.geomspace(1e-4, 1.0, 512)
    plin = np.asarray(hc.P_lin(jnp.asarray(ks_lin), hc.zs))
    got = np.asarray(covm.sigma_b2_tophat(V, ks_lin, plin))
    R = (3.0 * V / (4.0 * np.pi)) ** (1.0 / 3.0)

    def wth(x):
        return 3.0 * (np.sin(x) - x * np.cos(x)) / x**3

    for iz in range(len(ZS)):
        pz = plin[iz]
        integ = pz * wth(ks_lin * R) ** 2 * ks_lin**2 / (2.0 * np.pi**2)
        ref = np.trapezoid(integ, ks_lin)
        np.testing.assert_allclose(got[iz], ref, rtol=1e-10)
    # sanity: tiny compared to sigma8-scale variance, positive, z-decreasing
    assert np.all(got > 0.0) and got[0] > got[-1]
    assert got[0] < 1e-3


def test_pk_covariance_end_to_end(pair):
    from hmvec_tpu.models import cov as covm
    hc, _ = pair
    out = hc.get_pk_covariance(1.0)
    total = np.asarray(out["total"])
    assert total.shape == (len(ZS), len(KS), len(KS))
    assert np.all(np.isfinite(total))
    np.testing.assert_allclose(
        total, np.asarray(out["gauss"] + out["t1h"] + out["ssc"]), rtol=1e-13)
    # SSC is rank-1 and symmetric per z
    ssc = np.asarray(out["ssc"])
    np.testing.assert_allclose(ssc, np.swapaxes(ssc, 1, 2), rtol=1e-12)
    assert np.linalg.matrix_rank(ssc[0], tol=ssc[0].max() * 1e-10) == 1
    # Gaussian dominates at low k for a Gpc^3 volume; NG terms take over
    # in the deeply nonlinear regime off-diagonal
    g = np.asarray(out["gauss"])
    ng = np.asarray(out["t1h"] + out["ssc"])
    assert g[0, 0, 0] > ng[0, 0, 0]
    assert ng[0, -1, -5] > 0.0


def test_pk_response_ssc_powerlaw():
    """For P = A k^n the response is exactly (68/21 - (n+3)/3) P in the
    grid interior (the log-derivative is exact for power laws up to the
    gradient stencil, which is exact on loglog power laws only at
    second order -- use a tight rtol on a dense grid)."""
    from hmvec_tpu.models import cov as covm
    ks = np.geomspace(0.01, 1.0, 400)
    n = -1.7
    pk = 5.0 * ks**n
    resp = np.asarray(covm.pk_response_ssc(ks, pk))
    expected = (68.0 / 21.0 - (n + 3.0) / 3.0) * pk
    np.testing.assert_allclose(resp[1:-1], expected[1:-1], rtol=1e-4)


# ---------------- C_l trispectrum covariance ----------------

def test_cl_cov_t1h_explicit_loop(hc_lim):
    """The Limber-projected 1-halo trispectrum covariance against an
    explicit numpy evaluation (loops + np.interp bilinear) for C_yy-like
    unit windows."""
    from hmvec_tpu.models import cov as covm
    from hmvec_tpu.models import power as pwr
    hc = hc_lim
    ells = np.array([100.0, 300.0, 1000.0, 3000.0])
    got = np.asarray(hc.get_cl_cov_t1h(ells, "nfw", fsky=0.5))

    t1 = pwr.MatterTracer(uk=hc.uk_profiles["nfw"])
    term = np.asarray(pwr.one_halo_square_term(
        t1, t1, hc.ms, hc.rho_matter_z(0.0)))
    nzm = np.asarray(hc.nzm)
    # T(z, k, k') explicit
    nz, nk = len(ZL), len(KS)
    T = np.zeros((nz, nk, nk))
    for iz in range(nz):
        for i in range(nk):
            for j in range(0, nk, 7):
                T[iz, i, j] = np.trapezoid(
                    nzm[iz] * term[iz, :, i] * term[iz, :, j], MS)
    T_j = np.asarray(covm.trispectrum_1h_terms(hc.nzm, hc.ms, term, term))
    np.testing.assert_allclose(T_j[:, :, ::7], T[:, :, ::7], rtol=1e-10)

    # explicit covariance integral with numpy interpolation
    chis = np.asarray(hc.comoving_radial_distance(hc.zs))
    hzs = np.asarray(hc.h_of_z(hc.zs))
    lks = np.log(KS)
    pref = hzs**3 / chis**6 / (4.0 * np.pi * 0.5)
    expected = np.zeros((4, 4))
    for a, la in enumerate(ells):
        for bidx, lb in enumerate(ells):
            vals = np.zeros(nz)
            for iz in range(nz):
                ka = np.clip(np.log((la + 0.5) / chis[iz]), lks[0], lks[-1])
                kb = np.clip(np.log((lb + 0.5) / chis[iz]), lks[0], lks[-1])
                rows = np.array([np.interp(kb, lks, T_j[iz, i, :])
                                 for i in range(nk)])
                vals[iz] = np.interp(ka, lks, rows)
            expected[a, bidx] = np.trapezoid(pref * vals, ZL)
    np.testing.assert_allclose(got, expected, rtol=1e-9)
    # symmetric positive structure
    np.testing.assert_allclose(got, got.T, rtol=1e-12)
    assert np.all(got > 0.0)


def test_j1_autodiff_vs_scipy():
    from scipy.special import j1 as sj1
    from hmvec_tpu.ops.special import j1, disk_window
    xs = np.concatenate([np.linspace(1e-4, 8.0, 300),
                         np.geomspace(8.0, 500.0, 200)])
    got = np.asarray(j1(jnp.asarray(xs)))
    assert np.max(np.abs(got - sj1(xs))) < 5e-11
    # disk window: W(0) = 1, Taylor branch continuous
    w = np.asarray(disk_window(jnp.asarray([1e-6, 9e-4, 11e-4, 2.0])))
    np.testing.assert_allclose(w[0], 1.0, atol=1e-9)
    np.testing.assert_allclose(w[1], w[2], rtol=1e-6)
    np.testing.assert_allclose(w[3], 2.0 * sj1(2.0) / 2.0, rtol=1e-9)


def test_sigma_b2_disk_vs_quad(hc_lim):
    from hmvec_tpu.models import cov as covm
    from scipy.special import j1 as sj1
    from scipy.integrate import quad
    hc = hc_lim
    fsky = 0.3
    chis = np.asarray(hc.comoving_radial_distance(hc.zs))
    ks_lin = np.geomspace(1e-4, 1.0, 512)
    plin = np.asarray(hc.P_lin(jnp.asarray(ks_lin), hc.zs))
    got = np.asarray(covm.sigma_b2_disk(fsky, chis, ks_lin, plin))
    theta = np.arccos(1.0 - 2.0 * fsky)
    for iz in (0, 2):
        def integrand(k):
            x = k * chis[iz] * theta
            W = 2.0 * sj1(x) / x
            return k * np.interp(k, ks_lin, plin[iz]) * W**2 / (2 * np.pi)
        ref, _ = quad(integrand, ks_lin[0], ks_lin[-1], limit=2000)
        np.testing.assert_allclose(got[iz], ref, rtol=2e-3)
    assert np.all(got > 0.0)


def test_cl_cov_ssc_explicit_loop(hc_lim):
    from hmvec_tpu.models import cov as covm
    hc = hc_lim
    ells = np.array([100.0, 500.0, 2000.0])
    got = np.asarray(hc.get_cl_cov_ssc(ells, "nfw", fsky=0.3))
    # explicit numpy: response interp along the Limber curves
    P = np.asarray(hc.get_power("nfw"))
    resp = np.asarray(covm.pk_response_ssc(hc.ks, P))
    chis = np.asarray(hc.comoving_radial_distance(hc.zs))
    hzs = np.asarray(hc.h_of_z(hc.zs))
    ks_lin = np.geomspace(1e-4, 1.0, 512)
    sb2 = np.asarray(covm.sigma_b2_disk(
        0.3, chis, ks_lin, np.asarray(hc.P_lin(jnp.asarray(ks_lin), hc.zs))))
    lks = np.log(np.asarray(KS))
    nz = len(ZL)
    RP = np.zeros((3, nz))
    for a, l in enumerate(ells):
        for iz in range(nz):
            lk = np.clip(np.log((l + 0.5) / chis[iz]), lks[0], lks[-1])
            RP[a, iz] = np.interp(lk, lks, resp[iz])
    pref = hzs**3 / chis**4 * sb2
    expected = np.einsum("z,az,bz->ab", pref, RP, RP)
    # trapz over z
    wz = np.zeros(nz)
    dz = np.diff(ZL)
    wz[:-1] += dz / 2.0
    wz[1:] += dz / 2.0
    expected = np.einsum("z,az,bz->ab", wz * pref, RP, RP)
    np.testing.assert_allclose(got, expected, rtol=1e-9)
    np.testing.assert_allclose(got, got.T, rtol=1e-12)
    assert np.all(np.linalg.eigvalsh(got) > -1e-20 * got.max())


# ---------------- cross-sample HOD pairing ----------------

def test_hod_cross_sample_square_term_factorizes():
    """Two DISTINCT HOD samples factorize (<N1><N2>), the same object
    keeps the factorial-moment exclusion form -- a documented deviation
    from the reference, whose HOD branch ignores name2 entirely
    (hmvec.py:509-511) and silently returns sample 1's AUTO term for a
    cross spectrum of two different galaxy samples."""
    from hmvec_tpu.models import power as pwr
    rng = np.random.default_rng(7)
    nz, nm, nk = 2, 5, 4
    def mk(scale):
        Nc = jnp.asarray(rng.uniform(0.1, 1.0, (nz, nm)) * scale)
        Ns = jnp.asarray(rng.uniform(0.0, 3.0, (nz, nm)) * scale)
        return pwr.HODTracer(
            Nc=Nc, Ns=Ns, NsNsm1=Ns**2, NcNs=Nc * Ns,
            ngal=jnp.asarray(rng.uniform(1e-4, 1e-3, (nz,))),
            bg=jnp.asarray(rng.uniform(1.0, 2.0, (nz,))),
            us=jnp.asarray(rng.uniform(0.2, 1.0, (nz, nm, nk))), uc=None)
    t1, t2 = mk(1.0), mk(0.5)
    ms = np.geomspace(1e11, 1e15, nm)
    cross = np.asarray(pwr.one_halo_square_term(t1, t2, ms, 1.0))
    prod = np.asarray(pwr._hod_term(t1) * pwr._hod_term(t2))
    np.testing.assert_allclose(cross, prod, rtol=1e-13)
    auto = np.asarray(pwr.one_halo_square_term(t1, t1, ms, 1.0))
    excl = np.asarray(pwr._hod_square_term(t1))
    np.testing.assert_allclose(auto, excl, rtol=1e-13)
    # the two conventions genuinely differ (the exclusion form drops
    # the Nc*Nc self-pair and doubles the Nc*Ns cross)
    assert not np.allclose(auto, np.asarray(pwr._hod_term(t1)) ** 2)


def test_hod_same_name_auto_uses_exclusion_form():
    """HaloModel.get_power_1halo('g', 'g') must keep the factorial-moment
    auto form even though _tracer() builds a fresh object per call (the
    class API reuses t1 when the names match)."""
    from hmvec_tpu.models import power as pwr
    zs = np.array([0.5])
    ks = np.geomspace(1e-2, 10, 32)
    ms = np.geomspace(1e11, 1e15, 40)
    hm = HaloModel(zs, ks, ms=ms)
    hm.add_hod("g", ngal=np.array([1e-4]))
    p_auto = np.asarray(hm.get_power_1halo("g", "g"))
    t = hm._tracer("g")
    integ = np.trapezoid(np.asarray(hm.nzm)[..., None]
                         * np.asarray(pwr._hod_square_term(t)), ms, axis=-2)
    damp = 1.0 - np.exp(-((ks / hm.p["kstar_damping"]) ** 2))
    np.testing.assert_allclose(p_auto, integ * damp[None, :], rtol=1e-10)


def test_cl_cov_t1h_cross_spectrum(hc_lim):
    """Cov(C^{11}, C^{33}) between two DIFFERENT spectra: transposition
    symmetry (swapping which spectrum is 'first' transposes the matrix),
    default-argument equivalence, and an explicit-loop numpy check of
    the asymmetric trispectrum projection."""
    from hmvec_tpu.models import cov as covm
    from hmvec_tpu.models import power as pwr
    hc = hc_lim
    hc.add_battaglia_pres_profile("y", family="pres", nxs=400, xmax=10)
    ells = np.array([200.0, 800.0, 2500.0])

    auto = np.asarray(hc.get_cl_cov_t1h(ells, "nfw", fsky=0.4))
    auto_explicit = np.asarray(hc.get_cl_cov_t1h(
        ells, "nfw", name3="nfw", name4="nfw", fsky=0.4))
    np.testing.assert_allclose(auto, auto_explicit, rtol=1e-12)

    c_my = np.asarray(hc.get_cl_cov_t1h(ells, "nfw", name3="y", name4="y",
                                        fsky=0.4))
    c_ym = np.asarray(hc.get_cl_cov_t1h(ells, "y", name3="nfw", name4="nfw",
                                        fsky=0.4))
    np.testing.assert_allclose(c_my, c_ym.T, rtol=1e-10)
    assert np.all(np.isfinite(c_my)) and np.all(c_my > 0)

    # explicit numpy evaluation of one entry
    tm = hc._tracer("nfw")
    ty = hc._tracer("y")
    term_m = np.asarray(pwr.one_halo_square_term(tm, tm, hc.ms,
                                                 hc.rho_matter_z(0.0)))
    term_y = np.asarray(pwr.one_halo_square_term(ty, ty, hc.ms,
                                                 hc.rho_matter_z(0.0)))
    chis = np.asarray(hc.comoving_radial_distance(hc.zs))
    hzs = np.asarray(hc.h_of_z(hc.zs))
    nzm = np.asarray(hc.nzm)
    lks = np.log(np.asarray(KS))
    ia, ib = 1, 2
    integ = np.zeros(ZL.size)
    for iz in range(ZL.size):
        ka = np.log((ells[ia] + 0.5) / chis[iz])
        kb = np.log((ells[ib] + 0.5) / chis[iz])
        fa = np.array([np.interp(ka, lks, term_m[iz, im])
                       for im in range(MS.size)])
        fb = np.array([np.interp(kb, lks, term_y[iz, im])
                       for im in range(MS.size)])
        T = np.trapezoid(nzm[iz] * fa * fb, MS)
        integ[iz] = hzs[iz] ** 3 / chis[iz] ** 6 * T
    expected = np.trapezoid(integ, ZL) / (4.0 * np.pi * 0.4)
    np.testing.assert_allclose(c_my[ia, ib], expected, rtol=2e-3)
