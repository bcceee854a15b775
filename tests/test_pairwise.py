"""Pairwise kSZ forecasting (models/pairwise.py): twin parity for the
aperture optical depth, closed-form identities, bias-weighted v12
oracle, end-to-end SNR sanity, jit/grad smoke."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.integrate import quad
from scipy.special import spherical_jn

from hmvec_tpu.models.halo_model import HaloModel
from hmvec_tpu.models import pairwise as pw
from hmvec_tpu.models import rsd
from hmvec_tpu.twin import pairwise as twpw

ZS = np.array([0.3, 0.7, 1.1])
MS = np.geomspace(1e12, 1e15, 12)
KS = np.geomspace(1e-3, 10, 64)


@pytest.fixture(scope="module")
def hm():
    h = HaloModel(ZS, KS, ms=MS)
    h.add_battaglia_profile("e", family="AGN", nxs=500, xmax=15)
    h.add_hod("g", ngal=np.full(ZS.size, 1e-4))
    return h


def _tau_inputs(hm):
    from hmvec_tpu.params import battaglia_defaults
    m200, r200, rhocritz = hm._m200critz()
    rvirs = hm.rvir(hm.ms[None, :], hm.zs[:, None])
    cmax = np.asarray(rvirs / (r200 / 2.0))
    fp = dict(battaglia_defaults["AGN"])
    gamma = hm.p["battaglia_gas_gamma"]
    omb = hm.p["ombh2"] / hm.h**2
    return (np.asarray(m200), np.asarray(r200), cmax,
            np.asarray(rhocritz), omb, hm.omm0, gamma, fp)


def test_tau_aperture_vs_twin(hm):
    m200, r200, cmax, rhocritz, omb, omm, gamma, fp = _tau_inputs(hm)
    R_ap = 0.5
    tau_j = np.asarray(hm.get_tau_aperture(R_ap=R_ap, family="AGN"))
    tau_t = twpw.tau_aperture(ZS, m200, r200, cmax, rhocritz, omb, omm,
                              R_ap, gamma, fp, n=8193)
    # both quadratures split at the aperture-edge kink with the u^2
    # substitution beyond it; measured parity ~1.5e-9
    np.testing.assert_allclose(tau_j, tau_t, rtol=1e-7)
    # magnitude sanity: galaxy-scale halos at few 1e-4..1e-2 in a 0.5 Mpc
    # aperture
    assert np.all(tau_j > 0)
    assert tau_j.max() < 1.0


def test_tau_aperture_nokink_tight(hm):
    """Aperture fully containing the halo (w = 1 exactly): both
    quadratures converge fast -> tight parity."""
    m200, r200, cmax, rhocritz, omb, omm, gamma, fp = _tau_inputs(hm)
    R_ap = 40.0  # > max rvir
    tau_j = np.asarray(hm.get_tau_aperture(R_ap=R_ap, family="AGN"))
    tau_t = twpw.tau_aperture(ZS, m200, r200, cmax, rhocritz, omb, omm,
                              R_ap, gamma, fp, n=8193)
    np.testing.assert_allclose(tau_j, tau_t, rtol=1e-8)


def test_tau_total_electron_identity(hm):
    """tau_bar * pi R^2 -> sigma_T N_e,total for a large aperture, and
    N_e,total is consistent with the cosmic baryon budget of the halo
    (f_b * M / mu_e m_p within a factor ~2 for a truncated profile)."""
    m200, r200, cmax, rhocritz, omb, omm, gamma, fp = _tau_inputs(hm)
    Ne = np.asarray(pw.electron_count_total_battaglia(
        ZS, m200, r200, cmax, rhocritz, omb, omm, gamma, fp))
    fb = omb / omm
    Ne_budget = (fb * m200 * twpw.MSUN_KG / twpw.M_PROTON_SI
                 * (1.0 + twpw.XH) / 2.0)
    ratio = Ne / Ne_budget
    assert np.all(ratio > 0.3) and np.all(ratio < 2.0)


def test_aperture_weight_identity():
    rs = np.array([0.2, 0.5, 0.9999, 1.0001, 2.0, 10.0])
    w = np.asarray(pw.aperture_shell_fraction(rs, 1.0))
    assert np.allclose(w[:3], 1.0)
    expect = 1.0 - np.sqrt(1.0 - (1.0 / rs[3:]) ** 2)
    np.testing.assert_allclose(w[3:], expect, rtol=1e-12)
    # monotone decreasing beyond the aperture
    assert np.all(np.diff(w[3:]) < 0)


def test_tau_angular_equals_physical(hm):
    """theta_arcmin aperture == physical aperture at R = theta * d_A(z)."""
    theta = 1.5
    dA = np.asarray(hm.angular_diameter_distance(ZS))
    R = theta * np.pi / (180.0 * 60.0) * dA
    tau_ang = np.asarray(hm.get_tau_aperture(theta_arcmin=theta))
    tau_phys = np.asarray(hm.get_tau_aperture(R_ap=jnp.asarray(R)))
    np.testing.assert_allclose(tau_ang, tau_phys, rtol=1e-12)
    with pytest.raises(ValueError):
        hm.get_tau_aperture()
    with pytest.raises(ValueError):
        hm.get_tau_aperture(R_ap=1.0, theta_arcmin=1.0)


def test_tau_mean_hod_weighting(hm):
    tau_zm = hm.get_tau_aperture(R_ap=0.5)
    tau_g = np.asarray(hm.get_tau_mean_hod("g", tau_zm))
    t = np.asarray(tau_zm)
    assert np.all(tau_g > t.min(axis=1)) and np.all(tau_g < t.max(axis=1))
    # uniform quantity -> exactly its value (weights normalize to 1)
    ones = np.asarray(hm.get_tau_mean_hod("g", jnp.ones_like(tau_zm)))
    np.testing.assert_allclose(ones, 1.0, rtol=1e-10)


def _toy_pk(k):
    return 2e4 * (k / 0.05) / (1.0 + (k / 0.05) ** 2) ** 1.6


def test_pairwise_velocity_bias_oracle():
    ks = np.geomspace(1e-4, 1e2, 1024)
    pk = _toy_pk(ks)
    f, aH, b = 0.8, 70.0, 1.9
    rs, v12 = rsd.mean_pairwise_velocity(ks, jnp.asarray(pk), f, aH, b=b)
    rs = np.asarray(rs)
    v12 = np.asarray(v12)
    # b=1 path unchanged vs the original signature
    _, v12_b1 = rsd.mean_pairwise_velocity(ks, jnp.asarray(pk), f, aH)
    _, v12_b1b = rsd.mean_pairwise_velocity(ks, jnp.asarray(pk), f, aH,
                                            b=1.0)
    np.testing.assert_allclose(np.asarray(v12_b1), np.asarray(v12_b1b),
                               rtol=1e-14)
    i = np.argmin(np.abs(rs - 40.0))
    r = rs[i]
    xi, _ = quad(lambda k: k**2 * _toy_pk(k) * spherical_jn(0, k * r),
                 1e-4, 1e2, limit=800)
    xi /= 2.0 * np.pi**2
    xibar, _ = quad(lambda k: k * _toy_pk(k) * spherical_jn(1, k * r),
                    1e-4, 1e2, limit=800)
    xibar *= 3.0 / (2.0 * np.pi**2 * r)
    ref = -(2.0 / 3.0) * f * aH * r * b * xibar / (1.0 + b**2 * xi)
    np.testing.assert_allclose(v12[i], ref, rtol=2e-4)


def test_pairwise_signal_sign_and_units():
    ks = np.geomspace(1e-4, 1e2, 512)
    pk = _toy_pk(ks)
    tau_bar = 3e-4
    rs, T = pw.pairwise_ksz_signal(ks, jnp.asarray(pk), 0.8, 70.0, 2.0,
                                   tau_bar)
    rs = np.asarray(rs)
    T = np.asarray(T)
    sel = (rs > 10.0) & (rs < 60.0)
    assert np.all(T[sel] > 0.0)      # infall -> positive signal
    assert T[sel].max() < 50.0       # muK scale, not crazy
    # linear in tau_bar
    _, T2 = pw.pairwise_ksz_signal(ks, jnp.asarray(pk), 0.8, 70.0, 2.0,
                                   2.0 * tau_bar)
    np.testing.assert_allclose(np.asarray(T2)[sel], 2.0 * T[sel],
                               rtol=1e-12)


def test_pairwise_errors_npair_identity():
    rs = np.linspace(1.0, 300.0, 600)
    xi = np.exp(-rs / 50.0)
    T = 0.3 * np.exp(-rs / 80.0)
    edges = np.array([20.0, 40.0, 60.0])
    nbar, vol, sig = 1e-4, 1.0, 15.0
    rc, Tb, sb, snr = pw.pairwise_ksz_errors(edges, rs, xi, T, nbar, vol,
                                             sig, bg=1.5)
    rc = np.asarray(rc)
    np.testing.assert_allclose(rc, [30.0, 50.0])
    xi_c = np.interp(rc, rs, xi)
    npair = 2 * np.pi * nbar**2 * vol * 1e9 * rc**2 * 20.0 \
        * (1.0 + 1.5**2 * xi_c)
    np.testing.assert_allclose(np.asarray(sb),
                               np.sqrt(2.0 / npair) * sig, rtol=1e-12)
    Tc = np.interp(rc, rs, T)
    np.testing.assert_allclose(float(snr),
                               np.sqrt(np.sum((Tc / np.asarray(sb)) ** 2)),
                               rtol=1e-12)


def test_end_to_end_snr(hm):
    edges = np.linspace(20.0, 150.0, 8)
    out = pw.get_pairwise_ksz_snr(hm, 0, ngal_mpc3=1e-4, volume_gpc3=1.0,
                                  sigma_meas_uK=12.0, r_edges=edges,
                                  theta_arcmin=1.2)
    snr = float(out["snr"])
    assert np.isfinite(snr) and snr > 0
    assert float(out["tau_bar"]) > 0
    assert np.all(np.isfinite(np.asarray(out["T_bins"])))
    # signal bins positive in the infall regime
    assert np.all(np.asarray(out["T_bins"]) > 0)


def test_tau_jit_grad(hm):
    """tau is differentiable in the aperture radius (Fisher over
    aperture/beam systematics)."""
    m200, r200, cmax, rhocritz, omb, omm, gamma, fp = _tau_inputs(hm)

    def tau_sum(R):
        return jnp.sum(pw.tau_aperture_battaglia(
            ZS, jnp.asarray(m200), jnp.asarray(r200), jnp.asarray(cmax),
            jnp.asarray(rhocritz), omb, omm, R, gamma, fp, n_x=64))

    g = jax.grad(tau_sum)(0.5)
    assert np.isfinite(float(g))
    # larger aperture dilutes the mean tau of a centrally-peaked profile
    assert float(g) < 0
    tj = jax.jit(tau_sum)(0.5)
    np.testing.assert_allclose(float(tj), float(tau_sum(0.5)), rtol=1e-12)


# ---- mean Compton-y monopole (HaloModel.get_mean_compton_y) ----

def _pres_quad_u_y0(hm, i, j, m200, r200, rhocritz, rvirs):
    """Independent scipy-quad u_y(k->0) at one (z, m)."""
    from scipy.integrate import quad as squad
    from hmvec_tpu.params import battaglia_defaults
    import hmvec_tpu.twin.halo_ext as the
    fp = dict(battaglia_defaults["pres"])
    gamma = hm.p["battaglia_pres_gamma"]
    alpha = hm.p["battaglia_pres_alpha"]
    omb = hm.p["ombh2"] / hm.h**2
    cmax = rvirs[i, j] / r200[i, j]

    def integrand(x):
        P0 = the.battaglia_fit(m200[i, j], ZS[i], fp["P0_A0"],
                               fp["P0_alpham"], fp["P0_alphaz"])
        xc = the.battaglia_fit(m200[i, j], ZS[i], fp["xc_A0"],
                               fp["xc_alpham"], fp["xc_alphaz"])
        beta = the.battaglia_fit(m200[i, j], ZS[i], fp["beta_A0"],
                                 fp["beta_alpham"], fp["beta_alphaz"])
        XH = 0.76
        eFrac = 2.0 * (XH + 1.0) / (5.0 * XH + 3.0)
        G_newt = 6.67430e-11 / (3.08567758e16 * 1e6) ** 3 * 1.989e30
        pref = (eFrac * (omb / hm.omm0) * 200.0 * m200[i, j] * G_newt
                * rhocritz[i] / (2.0 * r200[i, j]) * P0)
        shape = (x / xc) ** gamma * (1.0 + (x / xc) ** alpha) ** (-beta)
        return x**2 * pref * shape

    I, _ = squad(integrand, 0.0, cmax, limit=400)
    sigmaT = 6.6524587321e-29
    mElect = 9.1093837015e-31 / 1.989e30
    c_SI = 299792458.0
    hz = np.asarray(hm.h_of_z(hm.zs))
    unit = (4.0 * np.pi * (sigmaT / (mElect * c_SI**2))
            * r200[i, j] ** 3 * (1.0 + ZS[i]) ** 2 / hz[i])
    return unit * I


def test_mean_compton_y(hm):
    """Exact u_y(k->0) vs scipy quad, the FFT profile's flat-floor bias
    claim, and the FIRAS-scale magnitude envelope."""
    from hmvec_tpu.models.pairwise import compton_y_k0_battaglia
    from hmvec_tpu.params import battaglia_defaults

    m200, r200, rhocritz = hm._m200critz()
    m200 = np.asarray(m200); r200 = np.asarray(r200)
    rhocritz = np.asarray(rhocritz)
    rvirs = np.asarray(hm.rvir(hm.ms[None, :], hm.zs[:, None]))

    fp = dict(battaglia_defaults["pres"])
    fp["battaglia_pres_gamma"] = hm.p["battaglia_pres_gamma"]
    fp["battaglia_pres_alpha"] = hm.p["battaglia_pres_alpha"]
    uy0 = np.asarray(compton_y_k0_battaglia(
        ZS, m200, r200, rvirs / r200, rhocritz,
        hm.p["ombh2"] / hm.h**2, hm.omm0,
        fp["battaglia_pres_alpha"], fp["battaglia_pres_gamma"], fp,
        np.asarray(hm.h_of_z(hm.zs))))

    # 1. exact limit vs independent adaptive quad
    for (i, j) in [(0, 4), (2, 10), (1, 11)]:
        ref = _pres_quad_u_y0(hm, i, j, m200, r200, rhocritz, rvirs)
        np.testing.assert_allclose(uy0[i, j], ref, rtol=1e-7)

    # 2. the registered FFT profile at its smallest k is BELOW the true
    # k->0 limit (flat floor at kt_min/(r200(1+z)), documented) but
    # within ~10%
    hm.add_battaglia_pres_profile("y", family="pres", nxs=3000, xmax=8)
    uy_fft = np.asarray(hm.pk_profiles["y"])[:, :, 0]
    ratio = uy_fft / uy0
    assert np.all(ratio < 1.0 + 1e-6)
    assert np.all(ratio > 0.9)

    # 3. magnitude: halo-model <y> on this (coarse) grid sits at the
    # 1e-7..1e-5 scale, below the FIRAS bound 1.5e-5
    mean_j = float(hm.get_mean_compton_y())
    assert 1e-8 < mean_j < 1.5e-5

    # 4. mean equals the explicit trapz of the exact-u_y0 grid
    exp = np.trapezoid(np.trapezoid(np.asarray(hm.nzm) * uy0, MS, axis=1), ZS)
    np.testing.assert_allclose(mean_j, exp, rtol=1e-10)
