"""Intrinsic-alignment (NLA) + magnification-bias Limber terms.

Oracle: the explicit-numpy twin Limber machinery with NLA windows built
independently from TwinCosmology's growth (twin/core.py, twin/limber.py).
EXTENSION beyond the reference (hmvec/cosmology.py:536-597 has no IA or
magnification terms).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hmvec_tpu.models import background as bgm
from hmvec_tpu.models import ia as iam
from hmvec_tpu.models import limber as limb
from hmvec_tpu.params import merge_params
from hmvec_tpu.twin.core import TwinCosmology
from hmvec_tpu.twin import limber as tlimb

ZS = np.linspace(0.05, 2.0, 12)
KS = np.geomspace(1e-3, 10.0, 80)
GZS = np.linspace(0.1, 1.8, 36)
DNDZ1 = np.exp(-0.5 * ((GZS - 0.6) / 0.15) ** 2)
DNDZ2 = np.exp(-0.5 * ((GZS - 1.1) / 0.2) ** 2)
ELLS = np.array([40.0, 100.0, 300.0, 900.0])
AIA, ETA, Z0 = 0.9, -0.7, 0.62


@pytest.fixture(scope="module")
def pair():
    params = merge_params()
    bg = bgm.background(params)
    tw = TwinCosmology(params)
    # one shared synthetic P(z,k) grid (the projection is what's under test)
    pzk = (np.asarray(tw.plin_approx(ZS, KS))
           * (1.0 + 0.1 * np.sin(np.log(KS))[None, :]))
    return bg, tw, pzk


def _twin_F(tw, zs):
    D = tw.d_growth(1.0 / (1.0 + zs), norm="z0norm")
    return (-AIA * iam.C1_RHOCRIT * tw.omm0 / D
            * ((1.0 + zs) / (1.0 + Z0)) ** ETA)


def _twin_windows(tw):
    F = _twin_F(tw, GZS)
    W_I1 = F * DNDZ1 / np.trapezoid(DNDZ1, GZS)
    W_I2 = F * DNDZ2 / np.trapezoid(DNDZ2, GZS)
    W_L1 = tlimb.lensing_window(tw, GZS, GZS, DNDZ1)
    chis = tw.comoving_radial_distance(GZS)
    hzs = tw.h_of_z(GZS)
    return W_I1, W_I2, W_L1, chis, hzs


def test_cii_twin_parity(pair):
    bg, tw, pzk = pair
    got = np.asarray(iam.C_II(bg, ELLS, ZS, KS, pzk, GZS, DNDZ1, DNDZ2,
                              A_ia=AIA, eta_ia=ETA, z0=Z0))
    W_I1, W_I2, _, chis, hzs = _twin_windows(tw)
    want = tlimb.limber_integral(ELLS, ZS, KS, pzk, GZS, W_I1, W_I2,
                                 hzs, chis)
    np.testing.assert_allclose(got, want, rtol=5e-8)
    # II is positive (F^2) and scales as A^2
    assert np.all(got > 0)
    got2 = np.asarray(iam.C_II(bg, ELLS, ZS, KS, pzk, GZS, DNDZ1, DNDZ2,
                               A_ia=2 * AIA, eta_ia=ETA, z0=Z0))
    np.testing.assert_allclose(got2, 4.0 * got, rtol=1e-10)


def test_cki_twin_parity_and_sign(pair):
    bg, tw, pzk = pair
    got = np.asarray(iam.C_kI(bg, ELLS, ZS, KS, pzk, GZS, DNDZ2,
                              A_ia=AIA, eta_ia=ETA, z0=Z0,
                              lzs=GZS, ldndz=DNDZ1))
    W_I1, W_I2, W_L1, chis, hzs = _twin_windows(tw)
    want = tlimb.limber_integral(ELLS, ZS, KS, pzk, GZS, W_L1, W_I2,
                                 hzs, chis)
    np.testing.assert_allclose(got, want, rtol=5e-8)
    assert np.all(got < 0)          # GI contamination is negative for A>0
    # linear in A_ia
    half = np.asarray(iam.C_kI(bg, ELLS, ZS, KS, pzk, GZS, DNDZ2,
                               A_ia=0.5 * AIA, eta_ia=ETA, z0=Z0,
                               lzs=GZS, ldndz=DNDZ1))
    np.testing.assert_allclose(half, 0.5 * got, rtol=1e-10)


def test_cgi_twin_parity(pair):
    bg, tw, pzk = pair
    got = np.asarray(iam.C_gI(bg, ELLS, ZS, KS, pzk, GZS, DNDZ1, DNDZ2,
                              A_ia=AIA, eta_ia=ETA, z0=Z0))
    W_I1, W_I2, _, chis, hzs = _twin_windows(tw)
    Wg = DNDZ1 / np.trapezoid(DNDZ1, GZS)
    want = tlimb.limber_integral(ELLS, ZS, KS, pzk, GZS, Wg, W_I2,
                                 hzs, chis)
    np.testing.assert_allclose(got, want, rtol=5e-8)


def test_shear_total_reduces_and_decomposes(pair):
    bg, _, pzk = pair
    out = iam.shear_cls_with_ia(bg, ELLS, ZS, KS, pzk, GZS, DNDZ1, DNDZ2,
                                A_ia=AIA, eta_ia=ETA, z0=Z0)
    np.testing.assert_allclose(
        np.asarray(out["total"]),
        np.asarray(out["GG"] + out["GI"] + out["II"]), rtol=1e-12)
    # A_ia = 0: total == GG == the twin's lensing-only projection on the
    # same (gzs) evaluation grid
    out0 = iam.shear_cls_with_ia(bg, ELLS, ZS, KS, pzk, GZS, DNDZ1, DNDZ2,
                                 A_ia=0.0)
    tw = pair[1]
    WL1 = tlimb.lensing_window(tw, GZS, GZS, DNDZ1)
    WL2 = tlimb.lensing_window(tw, GZS, GZS, DNDZ2)
    chis = tw.comoving_radial_distance(GZS)
    hzs = tw.h_of_z(GZS)
    ckk = tlimb.limber_integral(ELLS, ZS, KS, pzk, GZS, WL1, WL2, hzs, chis)
    np.testing.assert_allclose(np.asarray(out0["total"]), ckk, rtol=5e-8)
    assert np.all(np.asarray(out0["GI"]) == 0)
    assert np.all(np.asarray(out0["II"]) == 0)
    # auto-bin GI carries the factor 2: dndz2=dndz1 explicit vs None
    auto = iam.shear_cls_with_ia(bg, ELLS, ZS, KS, pzk, GZS, DNDZ1,
                                 A_ia=AIA, eta_ia=ETA, z0=Z0)
    same = iam.shear_cls_with_ia(bg, ELLS, ZS, KS, pzk, GZS, DNDZ1, DNDZ1,
                                 A_ia=AIA, eta_ia=ETA, z0=Z0)
    np.testing.assert_allclose(np.asarray(auto["GI"]),
                               np.asarray(same["GI"]), rtol=1e-12)


def test_magnification_terms(pair):
    bg, tw, pzk = pair
    pgg = 1.3 * pzk
    pgm = 1.1 * pzk
    # s = 0.4 switches magnification off exactly
    out = iam.C_gg_mag(bg, ELLS, ZS, KS, pgg, pgm, pzk, GZS, DNDZ1, 0.4)
    assert np.all(np.asarray(out["gmu"]) == 0)
    assert np.all(np.asarray(out["mumu"]) == 0)
    cgg = limb.C_gg(bg, ELLS, ZS, KS, pgg, GZS, DNDZ1)
    np.testing.assert_allclose(np.asarray(out["total"]), np.asarray(cgg),
                               rtol=1e-12)
    # twin parity of the mu terms at s != 0.4
    s = 0.85
    out = iam.C_gg_mag(bg, ELLS, ZS, KS, pgg, pgm, pzk, GZS, DNDZ1, s)
    chis = tw.comoving_radial_distance(GZS)
    hzs = tw.h_of_z(GZS)
    Wg = DNDZ1 / np.trapezoid(DNDZ1, GZS)
    Wm = (5 * s - 2) * tlimb.lensing_window(tw, GZS, GZS, DNDZ1)
    want_gmu = 2 * tlimb.limber_integral(ELLS, ZS, KS, pgm, GZS, Wg, Wm,
                                         hzs, chis)
    want_mumu = tlimb.limber_integral(ELLS, ZS, KS, pzk, GZS, Wm, Wm,
                                      hzs, chis)
    np.testing.assert_allclose(np.asarray(out["gmu"]), want_gmu, rtol=5e-8)
    np.testing.assert_allclose(np.asarray(out["mumu"]), want_mumu, rtol=5e-8)
    # kappa-g magnification: kmu term positive and twin-checked
    outk = iam.C_kg_mag(bg, ELLS, ZS, KS, pgm, pzk, GZS, DNDZ1, s,
                        lzs=1.8)
    WL = tlimb.lensing_window(tw, GZS, 1.8)
    want_kmu = tlimb.limber_integral(ELLS, ZS, KS, pzk, GZS, WL, Wm,
                                     hzs, chis)
    np.testing.assert_allclose(np.asarray(outk["kmu"]), want_kmu, rtol=5e-8)
    np.testing.assert_allclose(
        np.asarray(outk["total"]), np.asarray(outk["kg"] + outk["kmu"]),
        rtol=1e-12)


def test_ia_grad_and_jit(pair):
    bg, _, pzk = pair
    pzk_j = jnp.asarray(pzk)

    @jax.jit
    def total_at(a_ia):
        out = iam.shear_cls_with_ia(bg, ELLS, ZS, KS, pzk_j, GZS, DNDZ1,
                                    A_ia=a_ia, eta_ia=ETA, z0=Z0)
        return jnp.sum(out["total"])

    g = jax.grad(total_at)(jnp.asarray(AIA))
    assert np.isfinite(float(g)) and float(g) != 0.0


def test_class_methods_delegate(pair):
    bg, _, pzk = pair
    from hmvec_tpu import Cosmology
    cc = Cosmology()
    got = np.asarray(cc.C_II(ELLS, ZS, KS, pzk, GZS, DNDZ1,
                             A_ia=AIA, eta_ia=ETA, z0=Z0))
    want = np.asarray(iam.C_II(cc.bg, ELLS, ZS, KS, pzk, GZS, DNDZ1,
                               A_ia=AIA, eta_ia=ETA, z0=Z0))
    np.testing.assert_allclose(got, want, rtol=1e-12)
