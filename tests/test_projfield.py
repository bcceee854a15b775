"""Projected-field kSZ^2 x galaxy estimator (models/projfield.py).

Oracles: closed-form Gaussian filter convolution (pins the full 2D
quadrature geometry incl. the |l - L| law), the annulus measure identity
at l = 0, explicit-loop numpy twin parity for the projected hybrid
bispectrum (twin/bispectrum.py with independently assembled windows),
and linearity identities.  EXTENSION beyond the reference (hmvec ships
velocity-reconstruction forecasts only, ksz.py:299-468).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from hmvec_tpu.models.halo_model import HaloModel
from hmvec_tpu.models import projfield as pf
from hmvec_tpu.models.ksz import ksz_radial_function
from hmvec_tpu.twin.halo_ext import TwinHaloModelExt
from hmvec_tpu.twin import bispectrum as tbsp

ZS = np.array([0.4, 0.8])
MS = np.geomspace(2e10, 1e16, 48)
KS = np.geomspace(1e-3, 60.0, 88)


@pytest.fixture(scope="module")
def pair():
    hm = HaloModel(ZS, KS, ms=MS)
    hm.add_battaglia_profile("e", family="AGN", nxs=500, xmax=12)
    hm.add_hod("g", ngal=np.full(ZS.size, 1e-4))
    tw = TwinHaloModelExt(ZS, KS, MS)
    tw.add_battaglia_profile("e", family="AGN", nxs=500, xmax=12)
    tw.add_hod("g", ngal=np.full(ZS.size, 1e-4))
    return hm, tw


def test_single_z_model_rejected(pair):
    """The projected hybrid bispectrum is a z integral; a 1-z HaloModel
    would silently trapezoid to zero, so ksz_t_windows refuses it."""
    hm, _ = pair
    with pytest.raises(ValueError, match=">= 2 redshifts"):
        pf.ksz_t_windows(hm, zs=np.array([0.5]))


# ------------------------------------------------------------ quadrature

def test_annulus_measure_identity():
    """b = 1, f = 1 on [lmin, lmax], l_out = 0: the |l-L| leg equals L so
    C(0) = int_annulus d^2L/(2pi)^2 = (lmax^2 - lmin^2)/(4 pi) exactly."""
    lmin, lmax = 100.0, 3000.0
    grid = np.linspace(lmin, lmax, 2001)
    f = (grid, np.ones_like(grid))

    def b_one(l1, l2, l3):
        return jnp.ones_like(l1)

    got = float(pf.filtered_bispectrum_cl(0.0, f, b_one, lmin, lmax,
                                          n_radial=64, n_angle=8)[0])
    expected = (lmax**2 - lmin**2) / (4.0 * np.pi)
    np.testing.assert_allclose(got, expected, rtol=1e-9)


def test_gaussian_convolution_closed_form():
    """f(L) = exp(-L^2 / 2 sigma^2), b = 1:

      C(l) = int d^2L/(2pi)^2 e^{-L^2/2s^2} e^{-|l-L|^2/2s^2}
           = s^2 e^{-l^2/4s^2} / (4 pi)

    (complete the square: L^2 + |l-L|^2 = 2|L - l/2|^2 + l^2/2).  This
    pins the quadrature's 2D geometry including the cosine law."""
    sigma = 500.0

    def f(l):
        return jnp.exp(-(l**2) / (2.0 * sigma**2))

    def b_one(l1, l2, l3):
        return jnp.ones_like(l1)

    ells = np.array([0.0, 250.0, 700.0, 1400.0])
    # lmin = 0.01 makes the |L| -> 0 truncation (~ f(l) lmin^2 / 4pi)
    # negligible against the rtol below
    got = np.asarray(pf.filtered_bispectrum_cl(
        ells, f, b_one, 0.01, 6000.0, n_radial=128, n_angle=64))
    expected = sigma**2 * np.exp(-(ells**2) / (4.0 * sigma**2)) / (4 * np.pi)
    np.testing.assert_allclose(got, expected, rtol=2e-6)


def test_filter_and_bispectrum_linearity():
    """C scales as f^2 and linearly in b."""
    lmin, lmax = 100.0, 2000.0
    grid = np.geomspace(lmin, lmax, 200)
    f1 = (grid, 1.0 / (1.0 + (grid / 800.0) ** 2))
    f2 = (grid, 3.0 * f1[1])

    def b_fn(l1, l2, l3):
        return 1e-12 * (l1 + l2) / (l3 + 100.0)

    ells = np.array([300.0, 900.0])
    c1 = np.asarray(pf.filtered_bispectrum_cl(ells, f1, b_fn, lmin, lmax,
                                              n_radial=24, n_angle=12))
    c2 = np.asarray(pf.filtered_bispectrum_cl(ells, f2, b_fn, lmin, lmax,
                                              n_radial=24, n_angle=12))
    np.testing.assert_allclose(c2, 9.0 * c1, rtol=1e-12)

    def b_scaled(l1, l2, l3):
        return 2.5 * b_fn(l1, l2, l3)

    c3 = np.asarray(pf.filtered_bispectrum_cl(ells, f1, b_scaled, lmin,
                                              lmax, n_radial=24,
                                              n_angle=12))
    np.testing.assert_allclose(c3, 2.5 * c1, rtol=1e-12)


def test_ell_chunking_is_exact():
    lmin, lmax = 100.0, 2000.0
    grid = np.geomspace(lmin, lmax, 100)
    f = (grid, np.exp(-grid / 1500.0))

    def b_fn(l1, l2, l3):
        return 1e-10 / (1.0 + l1 + l2 + l3)

    ells = np.array([200.0, 500.0, 800.0, 1200.0, 1600.0])
    full = np.asarray(pf.filtered_bispectrum_cl(ells, f, b_fn, lmin, lmax,
                                                n_radial=16, n_angle=8))
    chunked = np.asarray(pf.filtered_bispectrum_cl(
        ells, f, b_fn, lmin, lmax, n_radial=16, n_angle=8, ell_chunk=2))
    np.testing.assert_allclose(chunked, full, rtol=0, atol=0)


# ------------------------------------------------------- the kSZ pieces

def test_vrms2_linear_explicit(pair):
    """Explicit numpy trapz of the same linear-theory integrand."""
    hm, _ = pair
    kLs = np.geomspace(1e-4, 3.0, 300)
    got = np.asarray(pf.vrms2_linear(hm, kLs=kLs))
    p = np.asarray(hm.P_lin_slow(jnp.asarray(kLs), jnp.asarray(ZS)))
    faH = (np.asarray(hm.get_growth_rate_f(jnp.asarray(ZS)))
           / (1.0 + ZS) * np.asarray(hm.h_of_z(jnp.asarray(ZS))))
    expected = np.trapezoid(p * faH[:, None] ** 2, kLs, axis=-1) \
        / (2.0 * np.pi**2)
    np.testing.assert_allclose(got, expected, rtol=1e-10)
    # (v/c)^2 ~ (300-400 km/s / c)^2 ~ 1e-6 at these redshifts
    assert np.all(got > 1e-7) and np.all(got < 1e-5)


def test_hybrid_bispectrum_twin_parity(pair):
    """Module hybrid b_TTg vs the explicit-loop twin projected bispectrum
    with the T/g windows assembled independently in numpy."""
    hm, tw = pair
    vrms2 = np.array([1.1e-6, 0.7e-6])
    gdndz = np.array([1.0, 2.0])

    ells = np.array([300.0, 1000.0, 3000.0])
    bj = np.asarray(pf.hybrid_bispectrum_ttg(hm, ells, ells, ells,
                                             gdndz=gdndz, vrms2=vrms2))

    K = np.asarray(ksz_radial_function(ZS, hm.ombh2, hm.YHe, params=hm.p))
    H = np.asarray(hm.h_of_z(jnp.asarray(ZS)))
    W_T = np.sqrt(vrms2 / 3.0) * K / H
    W_g = gdndz / np.trapezoid(gdndz, ZS)
    bt = tbsp.projected_bispectrum(tw, ells, ells, ells, "e", "e", "g",
                                   Wz1s=W_T, Wz2s=W_T, Wz3s=W_g)
    np.testing.assert_allclose(bj, bt, rtol=1e-7)
    assert np.all(bj > 0)


def test_cl_ksz2_galaxy_end_to_end(pair):
    """Full estimator on a small filter: finite, positive, uK^2-scale,
    and exactly quadratic in the filter."""
    hm, _ = pair
    grid = np.geomspace(300.0, 8000.0, 64)
    # Wiener-ish filter ~ b_l / C_l^tot in 1/uK^2 units
    fvals = 1e-3 / (1.0 + (grid / 3000.0) ** 2)
    ells = np.array([200.0, 600.0, 1500.0])

    cl = np.asarray(pf.cl_ksz2_galaxy(hm, ells, (grid, fvals), terms="1h",
                                      n_radial=16, n_angle=8))
    assert np.all(np.isfinite(cl))
    assert np.all(cl > 0)

    cl2 = np.asarray(pf.cl_ksz2_galaxy(hm, ells, (grid, 2.0 * fvals),
                                       terms="1h", n_radial=16, n_angle=8))
    np.testing.assert_allclose(cl2, 4.0 * cl, rtol=1e-12)


# ----------------------------------------- lensing contamination (map MC)

def test_lensing_term_map_level_monte_carlo():
    """Map-level validation of the lensing contribution to <T_f^2 g>:
    synthesize Gaussian (T, phi), lens at first order with +phi and -phi
    (the difference isolates the 2 F(T) F(grad phi . grad T) cross term
    EXACTLY, cancelling all Gaussian noise), square the filtered maps,
    cross with g = phi, and compare annulus-binned spectra against the
    analytic cl_t2_lensing convolution.  This pins the sign, the factor
    of 2 (two lensed legs), and the full 2D quadrature through a route
    (FFT maps) that shares no code with the quadrature."""
    import jax
    from hmvec_tpu.models import flatsky as fs

    n, pix = 256, 2.0
    lmax_tab = 8000
    ls = np.arange(lmax_tab + 1, dtype=float)
    cl_tt = 1e4 / (ls + 60.0) ** 2 * np.exp(-((ls / 4000.0) ** 2))
    cl_pp = 5e-2 / (ls + 40.0) ** 4

    # smooth band filter well inside the grid's l support
    fgrid = np.arange(0.0, 6001.0, 10.0)
    fvals = np.exp(-((fgrid - 1800.0) / 1400.0) ** 2)
    lx, ly, lmod = fs.fourier_grid(n, pix)
    fmap_l = jnp.interp(lmod, jnp.asarray(fgrid), jnp.asarray(fvals),
                        right=0.0)

    def one_pair(key):
        kt, kp = jax.random.split(key)
        t = fs.synth_gaussian(kt, n, pix, cl_tt)
        phi = fs.synth_gaussian(kp, n, pix, cl_pp)
        tp = fs.lens_map_first_order(t, phi, pix)
        tm = fs.lens_map_first_order(t, -phi, pix)
        fp = jnp.fft.ifft2(jnp.fft.fft2(tp) * fmap_l).real
        fm = jnp.fft.ifft2(jnp.fft.fft2(tm) * fmap_l).real
        sq = 0.5 * (fp**2 - fm**2)        # = 2 F(T) F(grad phi grad T)
        return jnp.fft.fft2(sq), jnp.fft.fft2(phi)

    keys = jax.random.split(jax.random.PRNGKey(7), 96)
    sqk, gk = jax.vmap(one_pair)(keys)
    edges = np.array([150.0, 350.0, 600.0, 900.0, 1300.0])
    mids_list, cls_list = jax.vmap(
        lambda a, b: fs.fourier_power(a, b, pix, edges))(sqk, gk)
    mids = np.asarray(mids_list[0])
    measured = np.asarray(jnp.mean(cls_list, axis=0))
    scatter = np.asarray(jnp.std(cls_list, axis=0)) / np.sqrt(len(keys))

    predicted = np.asarray(pf.cl_t2_lensing(
        mids, (fgrid, fvals), cl_tt, cl_pp, lmin=50.0, lmax=6000.0,
        n_radial=96, n_angle=64))

    # lensing-smoothing sign: negative where g is overdense at low ell
    # (the term changes sign at higher ell for this spectrum -- both
    # sides must track that through the zero crossing)
    assert predicted[0] < 0 and measured[0] < 0
    assert predicted[-1] > 0 and measured[-1] > 0
    # each bin within MC noise + a few-percent systematic floor
    # (finite-grid modes vs the continuum quadrature)
    assert np.all(np.abs(measured - predicted)
                  < 4.0 * scatter + 0.04 * np.abs(predicted))


# ------------------------------------------------- estimator noise / SNR

def test_t2_noise_spectrum_map_monte_carlo():
    """C^{ss} of the mean-subtracted filtered-squared GAUSSIAN map against
    the analytic disconnected convolution: synthesize T with C^tot,
    filter, square, subtract the map mean, measure the binned auto
    power over many sims."""
    import jax
    from hmvec_tpu.models import flatsky as fs

    n, pix = 256, 2.0
    ls = np.arange(8001, dtype=float)
    cl_tot = 1e4 / (ls + 60.0) ** 2 * np.exp(-((ls / 4000.0) ** 2)) + 1e-4
    fgrid = np.arange(0.0, 6001.0, 10.0)
    fvals = np.exp(-((fgrid - 1800.0) / 1400.0) ** 2)
    lmod = fs.fourier_grid(n, pix)[2]
    fmap_l = jnp.interp(lmod, jnp.asarray(fgrid), jnp.asarray(fvals),
                        right=0.0)

    def one(key):
        t = fs.synth_gaussian(key, n, pix, cl_tot)
        tf = jnp.fft.ifft2(jnp.fft.fft2(t) * fmap_l).real
        s = tf**2 - jnp.mean(tf**2)
        return jnp.fft.fft2(s)

    keys = jax.random.split(jax.random.PRNGKey(3), 48)
    sk = jax.vmap(one)(keys)
    edges = np.array([150.0, 400.0, 800.0, 1400.0, 2200.0])
    mids_l, cls_l = jax.vmap(
        lambda a: fs.fourier_power(a, a, pix, edges))(sk, )
    mids = np.asarray(mids_l[0])
    measured = np.asarray(jnp.mean(cls_l, axis=0))
    scatter = np.asarray(jnp.std(cls_l, axis=0)) / np.sqrt(len(keys))

    predicted = np.asarray(pf.cl_t2_t2_gaussian(
        mids, (fgrid, fvals), cl_tot, lmin=50.0, lmax=6000.0,
        n_radial=96, n_angle=64))
    assert np.all(predicted > 0)
    assert np.all(np.abs(measured - predicted)
                  < 4.0 * scatter + 0.05 * predicted)


def test_ksz2_snr_closed_form():
    """Hand-checkable single-band SNR and quadrature additivity."""
    snr2, tot = pf.ksz2_snr(np.array([500.0]), np.array([2.0]),
                            np.array([8.0]), np.array([2.0]),
                            fsky=0.5, delta_ell=np.array([100.0]))
    # (2*500+1)*100*0.5 * 4 / (16 + 4) = 50050 * 0.2 = 10010
    np.testing.assert_allclose(float(snr2[0]), 10010.0, rtol=1e-12)
    np.testing.assert_allclose(float(tot), np.sqrt(10010.0), rtol=1e-12)
    # two independent bands add in quadrature
    snr2b, totb = pf.ksz2_snr(np.array([500.0, 900.0]),
                              np.array([2.0, 1.0]),
                              np.array([8.0, 8.0]), np.array([2.0, 2.0]),
                              fsky=0.5, delta_ell=np.array([100.0, 100.0]))
    np.testing.assert_allclose(float(totb),
                               np.sqrt(float(snr2b.sum())), rtol=1e-12)


# -------------------------------------------------------- kSZ^2 x kappa

def test_cl_ksz2_kappa_twin_and_run(pair):
    """The kappa-leg hybrid bispectrum against the twin with the lensing
    window computed independently, plus an end-to-end estimator run."""
    import jax.numpy as jnp2
    from hmvec_tpu.models.limber import lensing_window

    hm, tw = pair
    vrms2 = np.array([1.0e-6, 0.8e-6])
    W_T = np.asarray(
        pf.ksz_t_windows(hm, None, None, 1, 0, 0.9, vrms2)[0])
    W_k = np.asarray(lensing_window(hm.bg, jnp2.asarray(ZS), 1089.0))
    ells = np.array([400.0, 1200.0])
    bj = np.asarray(hm.get_angular_bispectrum(
        ells, name="e", name2="e", name3="nfw",
        Wz1s=jnp.asarray(W_T), Wz2s=jnp.asarray(W_T),
        Wz3s=jnp.asarray(W_k)))
    bt = tbsp.projected_bispectrum(tw, ells, ells, ells, "e", "e", "nfw",
                                   Wz1s=W_T, Wz2s=W_T, Wz3s=W_k)
    np.testing.assert_allclose(bj, bt, rtol=1e-7)
    assert np.all(bj > 0)

    grid = np.geomspace(300.0, 8000.0, 64)
    fvals = 1e-3 / (1.0 + (grid / 3000.0) ** 2)
    cl = np.asarray(pf.cl_ksz2_kappa(hm, np.array([300.0, 900.0]),
                                     (grid, fvals), terms="1h",
                                     vrms2=vrms2, n_radial=12, n_angle=8))
    assert np.all(np.isfinite(cl)) and np.all(cl > 0)
