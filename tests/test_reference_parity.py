"""Parity against the REFERENCE'S OWN CODE (not the numpy twin).

Imports /root/reference/hmvec modules with stubbed engines (see _refload)
and pins our jax implementations (and, where noted, the twin oracle) to
them at tight tolerances.  Reference lines cited per test.
"""

import numpy as np
import jax.numpy as jnp

from _refload import load_ref, load_ref_tinker

from hmvec_tpu.params import merge_params, battaglia_defaults
from hmvec_tpu.models import background as bgmod


def _bg(**over):
    return bgmod.background(merge_params(over))


# ---------------------------------------------------------------- fft.py

def test_fft_integral_vs_reference():
    """sine_dft reproduces fft.fft_integral (reference fft.py:35-51)."""
    rfft = load_ref("fft")
    from hmvec_tpu.ops.sine_transform import sine_dft

    xs = np.linspace(0.0, 20.0, 5001)[1:]
    y = np.exp(-xs**2 / 2.0) * (1 + 0.1 * np.sin(3 * xs))
    kts_ref, uk_ref = rfft.fft_integral(xs, y)
    step = (xs[-1] - xs[0]) / xs.size
    uk = np.asarray(sine_dft(jnp.asarray(xs * y), step))
    # same algorithm, f64 rfft on CPU: near machine precision
    np.testing.assert_allclose(uk, uk_ref, rtol=0, atol=1e-13)


def test_generic_profile_fft_vs_reference():
    """Our batched transform + closed-form resample == the reference's
    rfft + per-(z,m) _interp_loop (fft.py:56-115), <=1e-12."""
    rfft = load_ref("fft")
    from hmvec_tpu.ops.sine_transform import generic_profile_fft
    from hmvec_tpu.twin.profile_fft import generic_profile_fft as twin_fft

    rng = np.random.RandomState(0)
    nz, nm, nxs, xmax = 3, 8, 500, 10.0
    zs = np.linspace(0.2, 1.5, nz)
    cmaxs = 2.0 + 8.0 * rng.rand(nz, nm)
    rss = 0.05 + 0.4 * rng.rand(nz, nm)
    ks = np.geomspace(1e-3, 80.0, 200)

    def rho(x):
        # generalized-NFW-like shape, broadcasting to (nz, nm, nxs)
        return (x[None, None, :] ** -1.2
                * (1.0 + x[None, None, :]) ** -1.8
                + 0.0 * cmaxs[..., None])

    # the reference expects rss with a trailing axis (hmvec.py:249,:342)
    _, u_ref = rfft.generic_profile_fft(rho, cmaxs, rss[..., None],
                                        zs, ks, xmax, nxs)
    _, u_jax = generic_profile_fft(
        lambda x: rho(np.asarray(x)), jnp.asarray(cmaxs), jnp.asarray(rss),
        zs, ks, xmax, nxs)
    _, u_twin = twin_fft(rho, cmaxs, rss, zs, ks, xmax, nxs)

    scale = np.max(np.abs(u_ref))
    np.testing.assert_allclose(np.asarray(u_jax), u_ref,
                               rtol=0, atol=1e-12 * scale)
    np.testing.assert_allclose(u_twin, u_ref, rtol=0, atol=1e-13 * scale)


def test_generic_profile_fft_no_massnorm_vs_reference():
    """do_mass_norm=False path (pressure profiles, hmvec.py:315)."""
    rfft = load_ref("fft")
    from hmvec_tpu.ops.sine_transform import generic_profile_fft

    nz, nm, nxs, xmax = 2, 4, 300, 8.0
    zs = np.linspace(0.3, 1.0, nz)
    cmaxs = np.full((nz, nm), 4.0)
    rss = np.full((nz, nm), 0.3)
    ks = np.geomspace(1e-2, 30.0, 64)

    def rho(x):
        return np.exp(-x[None, None, :]) + 0.0 * cmaxs[..., None]

    _, u_ref = rfft.generic_profile_fft(rho, cmaxs, rss[..., None],
                                        zs, ks, xmax, nxs,
                                        do_mass_norm=False)
    _, u_jax = generic_profile_fft(
        lambda x: rho(np.asarray(x)), jnp.asarray(cmaxs), jnp.asarray(rss),
        zs, ks, xmax, nxs, do_mass_norm=False)
    scale = np.max(np.abs(u_ref))
    np.testing.assert_allclose(np.asarray(u_jax), u_ref,
                               rtol=0, atol=1e-12 * scale)


# ------------------------------------------------------------- tinker.py

def test_tinker_bias_vs_reference():
    rt = load_ref_tinker()
    from hmvec_tpu.models.mass_function import bias_tinker

    nu = np.linspace(0.3, 5.0, 200)
    np.testing.assert_allclose(np.asarray(bias_tinker(jnp.asarray(nu))),
                               rt.bias(nu), rtol=1e-13)


def test_tinker_f_nu_unnormalized_vs_reference():
    """f(nu) formula incl. the z>3 clamp (tinker.py:43-62), alpha off."""
    rt = load_ref_tinker()
    from hmvec_tpu.models.mass_function import _tinker_f_nu_unnorm

    # NB: exactly z=3 is excluded -- the reference's heaviside clamp
    # (tinker.py:54) maps z==3 to z=0 (both heavisides are 0 there), a
    # measure-zero boundary quirk we deliberately do not reproduce
    # (ours clamps continuously: min(z, 3)).
    zs = np.array([0.0, 1.0, 2.9, 3.2, 4.5])
    nu = np.linspace(0.3, 5.0, 40)[None, :] + np.zeros((zs.size, 1))
    ref = rt.f_nu(nu, zs[:, None], norm_consistency=False, alpha=1.0)
    got = np.asarray(_tinker_f_nu_unnorm(jnp.asarray(nu),
                                         jnp.asarray(zs)[:, None]))
    np.testing.assert_allclose(got, ref, rtol=1e-13)


def test_tinker_alpha_consistency_vs_reference():
    """Our on-device alpha(z) vs the reference's own recipe AND its shipped
    table.

    Running the reference's generator recipe with the reference's current
    f_nu/bias (bin/generate_bias_consistency_data.py:14-21: trapz of
    f(nu)b(nu) over logspace(-8,2,10000)) reproduces our on-device values
    to ~1e-12.  The SHIPPED table (hmvec/data/alpha_consistency.txt) is
    ~3e-3 off from that recomputation -- it was generated by an older
    revision of the formulas, i.e. the table is stale relative to the
    reference's own code -- so the table comparison is correspondingly
    loose.  (z=3.0 exactly is excluded: the reference's heaviside clamp
    maps it to z=0, tinker.py:54.)"""
    rt = load_ref_tinker()
    from hmvec_tpu.models.mass_function import tinker_alpha_consistency

    zs = np.linspace(0.0, 2.99, 7)
    alpha_us = np.asarray(tinker_alpha_consistency(jnp.asarray(zs)))

    # (a) the reference's generator recipe, run on its current code
    nus = np.logspace(-8, 2, 10000)
    fnus = rt.f_nu(nus[None], zs[:, None], norm_consistency=False, alpha=1)
    bs = rt.bias(nus, delta=200.0)
    alpha_recipe = 1.0 / np.trapezoid(fnus * bs, nus, axis=-1)
    np.testing.assert_allclose(alpha_us, alpha_recipe, rtol=1e-12)

    # (b) the shipped (stale) table, via the reference's own interp path
    nu = np.ones((zs.size, 1))
    ref_norm = rt.f_nu(nu, zs[:, None], norm_consistency=True)
    ref_unnorm = rt.f_nu(nu, zs[:, None], norm_consistency=False, alpha=1.0)
    alpha_table = (ref_norm / ref_unnorm)[:, 0]
    # staleness grows to ~1% at z~3
    np.testing.assert_allclose(alpha_us, alpha_table, rtol=1.5e-2)


def test_tinker2008_and_subhalo_vs_reference():
    rt = load_ref_tinker()
    from hmvec_tpu.models.mass_function import (simple_f_nu_tinker2008,
                                                n_ln_m_sub)

    nu = np.linspace(0.3, 5.0, 100)
    np.testing.assert_allclose(
        np.asarray(simple_f_nu_tinker2008(jnp.asarray(nu))),
        rt.simple_f_nu(nu), rtol=1e-13)
    msub = np.geomspace(1e10, 1e13, 20)
    mhost = np.geomspace(1e13, 1e15, 10)
    np.testing.assert_allclose(
        np.asarray(n_ln_m_sub(jnp.asarray(msub), jnp.asarray(mhost))),
        rt.NlnMsub(msub, mhost), rtol=1e-13)


# -------------------------------------------------------------- utils.py

def test_bisection_vs_reference():
    """invert_monotone agrees with utils.vectorized_bisection_search
    (utils.py:9-42) within the reference's own rtol."""
    ru = load_ref("utils")
    from hmvec_tpu.ops.rootfind import invert_monotone

    xs = np.array([2.0, 4.0, 6.0, 11.5])
    ref = ru.vectorized_bisection_search(
        xs.copy(), lambda y: np.sqrt(y), (1.0, 200.0), "increasing",
        rtol=1e-6, verbose=False)
    got = np.asarray(invert_monotone(lambda y: jnp.sqrt(y),
                                     jnp.asarray(xs), 1.0, 200.0))
    np.testing.assert_allclose(got, ref, rtol=1e-5)
    np.testing.assert_allclose(got, xs**2, rtol=1e-10)


# -------------------------------------------- cosmology.py: EH98 transfer

class _DuckCosmo:
    """Just enough of Cosmology for the (engine-free) Tk method
    (reference cosmology.py:404-504 touches only h, params, omm0)."""

    def __init__(self, params):
        self.params = params
        self.h = params["H0"] / 100.0
        h2 = self.h**2
        self.omm0 = (params["omch2"] + params["ombh2"]) / h2


def test_eh98_transfer_both_variants_vs_reference():
    """transfer_eh98 == Cosmology.Tk for 'eisenhu' and 'eisenhu_osc'.

    NB the reference hardcodes T_CMB = 2.726 K inside Tk (cosmology.py:410)
    while using CAMB's 2.7255 K elsewhere; we reproduce that split
    deliberately (transfer.py uses bg.T_cmb_transfer_k = 2.726)."""
    rcos = load_ref("cosmology")
    from hmvec_tpu.models.transfer import transfer_eh98

    for over in ({}, {"omch2": 0.15, "ombh2": 0.019, "H0": 70.0}):
        p = merge_params(over)
        duck = _DuckCosmo(p)
        bg = _bg(**over)
        ks = np.geomspace(1e-4, 100.0, 500)
        for kind in ("eisenhu", "eisenhu_osc"):
            ref = rcos.Cosmology.Tk(duck, ks, kind)
            got = np.asarray(transfer_eh98(bg, jnp.asarray(ks), kind))
            np.testing.assert_allclose(got, ref, rtol=1e-12,
                                       err_msg=f"{kind} {over}")


# --------------------------------------------- hmvec.py free functions

def test_duffy_concentration_vs_reference():
    rh = load_ref("hmvec")
    from hmvec_tpu.models.profiles import duffy_concentration

    p = merge_params()
    h = p["H0"] / 100.0
    m = np.geomspace(1e11, 1e15, 40)[None, :]
    z = np.linspace(0.0, 3.0, 5)[:, None]
    ref = rh.duffy_concentration(m, z, p["duffy_A_vir"],
                                 p["duffy_alpha_vir"],
                                 p["duffy_beta_vir"], h)
    got = np.asarray(duffy_concentration(jnp.asarray(m), jnp.asarray(z),
                                         p["duffy_A_vir"],
                                         p["duffy_alpha_vir"],
                                         p["duffy_beta_vir"], h))
    np.testing.assert_allclose(got, ref, rtol=1e-13)


def test_behroozi_smhm_vs_reference():
    """Mhalo_stellar + the dense-grid inversion Mstellar_halo
    (hmvec.py:634-695), both z-regimes."""
    rh = load_ref("hmvec")
    from hmvec_tpu.models.hod import mhalo_from_mstellar, mstellar_from_mhalo

    zs = np.array([0.2, 0.7, 0.9, 2.0])
    log10mstar = np.linspace(8.0, 12.0, 50)[None, :]
    # the reference needs z as a column (as its own callers pass it,
    # hmvec.py:441); 1-D z raises a broadcast error at hmvec.py:666
    ref_mh = rh.Mhalo_stellar(zs[:, None], log10mstar)
    got_mh = np.asarray(mhalo_from_mstellar(jnp.asarray(zs),
                                            jnp.asarray(log10mstar)))
    np.testing.assert_allclose(got_mh, ref_mh, rtol=1e-13)

    log10mh = np.linspace(11.0, 15.0, 60)[None, :]
    ref_ms = rh.Mstellar_halo(zs[:, None], log10mh)
    got_ms = np.asarray(mstellar_from_mhalo(jnp.asarray(zs),
                                            jnp.asarray(log10mh)))
    np.testing.assert_allclose(got_ms, ref_ms, rtol=0, atol=2e-10)


def test_hod_occupancies_vs_reference():
    """avg_Nc/avg_Ns/avg_NsNsm1/avg_NcNs (hmvec.py:698-731)."""
    rh = load_ref("hmvec")
    from hmvec_tpu.models import hod as hodm

    p = merge_params()
    zs = np.array([0.3, 1.1])
    log10mh = np.linspace(11.0, 15.0, 40)[None, :]
    thresh = np.array([10.5, 10.6])[:, None]
    sig = p["hod_sig_log_mstellar"]

    ref_nc = rh.avg_Nc(log10mh, zs[:, None], thresh, sig)
    got_nc = np.asarray(hodm.avg_nc(jnp.asarray(log10mh), jnp.asarray(zs),
                                    jnp.asarray(thresh), sig))
    np.testing.assert_allclose(got_nc, ref_nc, rtol=0, atol=1e-12)

    ref_ns = rh.avg_Ns(log10mh, zs[:, None], thresh, Nc=ref_nc,
                       sig_log_mstellar=sig,
                       alphasat=p["hod_alphasat"],
                       Bsat=p["hod_Bsat"], betasat=p["hod_betasat"],
                       Bcut=p["hod_Bcut"], betacut=p["hod_betacut"])
    hp = {k: p[k] for k in p if k.startswith("hod_")}
    got_ns = np.asarray(hodm.avg_ns(jnp.asarray(log10mh), jnp.asarray(zs),
                                    jnp.asarray(thresh),
                                    jnp.asarray(got_nc), hp))
    np.testing.assert_allclose(got_ns, ref_ns, rtol=1e-10, atol=1e-15)

    for corr in ("max", "min"):
        np.testing.assert_allclose(
            np.asarray(hodm.avg_nsnsm1(jnp.asarray(got_nc),
                                       jnp.asarray(got_ns), corr)),
            rh.avg_NsNsm1(ref_nc, ref_ns, corr), rtol=1e-10, atol=1e-20)
        np.testing.assert_allclose(
            np.asarray(hodm.avg_ncns(jnp.asarray(got_nc),
                                     jnp.asarray(got_ns), corr)),
            rh.avg_NcNs(ref_nc, ref_ns, corr), rtol=1e-10, atol=1e-20)


def test_battaglia_r_level_wrappers_vs_reference():
    """The reference-signature r-level free functions rho_gas/P_e
    (hmvec.py:804-817, :864-879) -- verifies the R200-from-M200c and
    x = 2r/R200 (density) vs x = r/R200 (pressure) conventions, not
    just the x-level shape functions."""
    rh = load_ref("hmvec")
    import hmvec_tpu as hmt

    r = np.geomspace(0.05, 5.0, 40)[None, None, :]
    m200 = np.geomspace(1e13, 1e15, 5)[None, :, None]
    z = np.array([0.8])[:, None, None]
    omb, omm, rhocritz = 0.049, 0.31, 9.2e10

    ref = rh.rho_gas(r, m200, z, omb, omm, rhocritz)
    got = np.asarray(hmt.rho_gas(jnp.asarray(r), jnp.asarray(m200),
                                 jnp.asarray(z), omb, omm, rhocritz))
    np.testing.assert_allclose(got, ref, rtol=1e-12)

    ref_p = rh.P_e(r, m200, z, omb, omm, rhocritz)
    got_p = np.asarray(hmt.P_e(jnp.asarray(r), jnp.asarray(m200),
                               jnp.asarray(z), omb, omm, rhocritz))
    np.testing.assert_allclose(got_p, ref_p, rtol=1e-7)

    # Fcon / battaglia_gas_fit aliases
    np.testing.assert_allclose(np.asarray(hmt.Fcon(jnp.asarray([3.0, 7.0]))),
                               rh.Fcon(np.array([3.0, 7.0])), rtol=1e-14)
    np.testing.assert_allclose(
        np.asarray(hmt.battaglia_gas_fit(1e14, 0.5, 4e3, 0.29, -0.66)),
        rh.battaglia_gas_fit(1e14, 0.5, 4e3, 0.29, -0.66), rtol=1e-14)


def test_battaglia_rho_gas_vs_reference():
    """rho_gas_generic_x (hmvec.py:844-861) for AGN and SH fits."""
    rh = load_ref("hmvec")
    from hmvec_tpu.models.profiles import rho_gas_x

    p = merge_params()
    x = np.geomspace(1e-2, 10.0, 50)[None, None, :]
    m200 = np.geomspace(1e12, 1e15, 8)[None, :, None]
    z = np.array([0.5])[:, None, None]
    omb, omm, rhocritz = 0.049, 0.31, 9.2e10

    for fam in ("AGN", "SH"):
        f = battaglia_defaults[fam]
        ref = rh.rho_gas_generic_x(
            x, m200, z, omb, omm, rhocritz,
            gamma=p["battaglia_gas_gamma"],
            rho0_A0=f["rho0_A0"], rho0_alpham=f["rho0_alpham"],
            rho0_alphaz=f["rho0_alphaz"],
            alpha_A0=f["alpha_A0"], alpha_alpham=f["alpha_alpham"],
            alpha_alphaz=f["alpha_alphaz"],
            beta_A0=f["beta_A0"], beta_alpham=f["beta_alpham"],
            beta_alphaz=f["beta_alphaz"])
        got = np.asarray(rho_gas_x(jnp.asarray(x), jnp.asarray(m200),
                                   jnp.asarray(z), omb, omm, rhocritz,
                                   p["battaglia_gas_gamma"], dict(f)))
        np.testing.assert_allclose(got, ref, rtol=1e-12, err_msg=fam)


def test_battaglia_pressure_vs_reference():
    """P_e_generic_x (hmvec.py:906-927), incl. the XH=0.76 electron
    fraction and the G/(Mpc,Msun) unit chain."""
    rh = load_ref("hmvec")
    from hmvec_tpu.models.profiles import pressure_x

    p = merge_params()
    x = np.geomspace(1e-2, 10.0, 50)[None, None, :]
    m200 = np.geomspace(1e12, 1e15, 8)[None, :, None]
    r200 = np.geomspace(0.3, 2.0, 8)[None, :, None]
    z = np.array([0.5])[:, None, None]
    omb, omm, rhocritz = 0.049, 0.31, 9.2e10

    f = battaglia_defaults["pres"]
    ref = rh.P_e_generic_x(
        x, m200, r200, z, omb, omm, rhocritz,
        alpha=p["battaglia_pres_alpha"], gamma=p["battaglia_pres_gamma"],
        P0_A0=f["P0_A0"], P0_alpham=f["P0_alpham"],
        P0_alphaz=f["P0_alphaz"],
        xc_A0=f["xc_A0"], xc_alpham=f["xc_alpham"],
        xc_alphaz=f["xc_alphaz"],
        beta_A0=f["beta_A0"], beta_alpham=f["beta_alpham"],
        beta_alphaz=f["beta_alphaz"])
    got = np.asarray(pressure_x(jnp.asarray(x), jnp.asarray(m200),
                                jnp.asarray(r200), jnp.asarray(z),
                                omb, omm, rhocritz,
                                p["battaglia_pres_alpha"],
                                p["battaglia_pres_gamma"], dict(f)))
    # rtol 1e-7: the reference takes G from scipy.constants at f64 while
    # we fold the unit chain host-side; values agree to float precision
    np.testing.assert_allclose(got, ref, rtol=1e-7)


def test_mass_conversion_vs_reference():
    """mdelta_from_mdelta: our fixed-trip bisection vs the reference's
    scipy-newton secant (hmvec.py:748-798)."""
    rh = load_ref("hmvec")
    from hmvec_tpu.models.mass_conversion import mdelta_from_mdelta

    rng = np.random.RandomState(1)
    M1 = np.geomspace(1e12, 1e15, 4)            # (nm,)
    C1 = 3.0 + 7.0 * rng.rand(3, 4)             # (nz, nm)
    dr1 = np.array([100.0, 110.0, 120.0]) * 9.2e10   # (nz,)
    dr2 = np.array([200.0, 210.0, 220.0]) * 9.2e10
    ref = rh.mdelta_from_mdelta(M1, C1, dr1, dr2)
    got = np.asarray(mdelta_from_mdelta(jnp.asarray(M1), jnp.asarray(C1),
                                        jnp.asarray(dr1), jnp.asarray(dr2)))
    np.testing.assert_allclose(got, ref, rtol=1e-8)


def test_fcon_nfw_helpers_vs_reference():
    """NB: the reference's rhoscale_nfw (hmvec.py:739-742) references an
    undefined `pref` and raises NameError -- bit-rotted dead code; ours
    fixes it (pref == 1), so only Fcon/rho_nfw_x are comparable."""
    rh = load_ref("hmvec")
    from hmvec_tpu.models.profiles import fcon, rho_nfw_x

    c = np.linspace(1.0, 20.0, 30)
    np.testing.assert_allclose(np.asarray(fcon(jnp.asarray(c))),
                               rh.Fcon(c), rtol=1e-14)
    x = np.geomspace(1e-2, 30.0, 40)
    np.testing.assert_allclose(np.asarray(rho_nfw_x(jnp.asarray(x), 2.5)),
                               rh.rho_nfw_x(x, 2.5), rtol=1e-14)


def test_limber_integral_vs_reference(monkeypatch):
    """The reference's actual limber_integral (cosmology.py:867-904) vs
    ours, on the same P(z,k)/windows.

    Modern scipy removed interp2d and dfitpack; interp2d(kind='linear') is
    reproduced exactly by RectBivariateSpline(kx=ky=1) and bispeu by
    pointwise bisplev, so the shimmed code runs the reference's own
    integration logic.  The two implementations differ only in the P
    interpolation variable (reference: linear in k; ours: linear in ln k),
    so a dense k grid bounds the difference to the 1e-5-class gate
    (measured 5.5e-6 at 2000 log-spaced ks -- pure interpolation-variable
    difference; the windows/prefactor/trapz machinery agrees exactly).
    """
    import scipy.interpolate as si
    from scipy.interpolate import RectBivariateSpline, bisplev
    from hmvec_tpu.models import limber as mlimb

    rc = load_ref("cosmology")

    class _Interp2dLinear:
        def __init__(self, x, y, z, bounds_error=True):
            self._r = RectBivariateSpline(np.asarray(x), np.asarray(y),
                                          np.asarray(z).T, kx=1, ky=1)
            tx, ty, c = self._r.tck
            self.tck = (tx, ty, c, 1, 1)

    class _Dfitpack:
        @staticmethod
        def bispeu(tx, ty, c, kx, ky, x, y):
            vals = np.array([bisplev(xi, yi, (tx, ty, c, kx, ky))
                             for xi, yi in zip(x, y)])
            return vals, 0

    monkeypatch.setattr(rc, "interp2d", _Interp2dLinear, raising=False)
    monkeypatch.setattr(si, "dfitpack", _Dfitpack, raising=False)

    # a smooth synthetic P(z,k) + windows on a dense grid
    zs = np.linspace(0.05, 3.0, 40)
    ks = np.geomspace(1e-4, 20.0, 2000)
    Pzks = (1e4 * (ks / 0.05) ** -1.5 / (1 + (ks / 0.05) ** -2.5))[None, :] \
        * (1.0 / (1 + zs) ** 1.6)[:, None]
    chis = 4000.0 * zs / (1 + zs)            # smooth monotone stand-in
    hzs = 2.3e-4 * (1 + 0.5 * zs)
    Wz1s = zs * np.exp(-zs)
    Wz2s = np.sqrt(zs)
    ells = np.geomspace(30, 2000, 12)

    ref = rc.limber_integral(ells, zs, ks, Pzks, zs, Wz1s, Wz2s, hzs, chis)
    got = np.asarray(mlimb.limber_integral(
        jnp.asarray(ells), jnp.asarray(zs), jnp.asarray(ks),
        jnp.asarray(Pzks), jnp.asarray(zs), jnp.asarray(Wz1s),
        jnp.asarray(Wz2s), jnp.asarray(hzs), jnp.asarray(chis)))
    np.testing.assert_allclose(got, ref, rtol=1e-5)
