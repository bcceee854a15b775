"""CMB Cls via host tables (reference get_cmb_cls / cmb_lensing_kk_exact,
cosmology.py:67-81, :660-691)."""

import numpy as np
import pytest

from hmvec_tpu.models.cosmology import Cosmology


def _fake_table(nl=600):
    ells = np.arange(nl)
    tt = 5000.0 * np.exp(-((ells / 1800.0) ** 2)) + 1.0
    four = np.stack([tt, 0.1 * tt, 0.01 * tt, 0.3 * tt], axis=-1)
    dd = 1e-7 * ells ** 2 / (1.0 + (ells / 60.0) ** 2) ** 2
    return {"cls_lensed": four, "cls_unlensed": 1.02 * four,
            "cls_lens_potential": np.stack([dd, 0 * dd, 0 * dd], axis=-1)}


def test_get_cmb_cls_truncates_and_shapes():
    cos = Cosmology(cls_table=_fake_table(600))
    out = cos.get_cmb_cls(lmax=500)
    assert set(out) == {"total", "unlensed_scalar", "lens_potential"}
    assert out["total"].shape == (501, 4)
    assert out["lens_potential"].shape == (501, 3)
    np.testing.assert_allclose(out["total"],
                               _fake_table(600)["cls_lensed"][:501])


def test_get_cmb_cls_pads_with_nan_beyond_table():
    cos = Cosmology(cls_table=_fake_table(200))
    out = cos.get_cmb_cls(lmax=300)
    assert out["total"].shape == (301, 4)
    assert np.all(np.isfinite(out["total"][:200]))
    assert np.all(np.isnan(out["total"][200:]))


def test_cmb_lensing_kk_exact_conversion():
    tab = _fake_table(400)
    cos = Cosmology(cls_table=tab)
    ells, clkk = cos.cmb_lensing_kk_exact(lmax=300)
    assert ells.size == clkk.size == 301
    # reference conversion: deflection Cls * 2pi / 4 (cosmology.py:688)
    want = tab["cls_lens_potential"][:301, 0] * 2.0 * np.pi / 4.0
    np.testing.assert_allclose(clkk, want, rtol=1e-14)


def test_errors_without_table():
    cos = Cosmology()
    with pytest.raises(NotImplementedError, match="cls_table"):
        cos.get_cmb_cls()
    with pytest.raises(NotImplementedError, match="lens"):
        cos.cmb_lensing_kk_exact(lmax=100)


def test_halo_model_forwards_cls_table():
    from hmvec_tpu.models.halo_model import HaloModel
    hm = HaloModel(np.array([0.5]), np.geomspace(1e-3, 1.0, 8),
                   ms=np.geomspace(1e11, 1e15, 8),
                   cls_table=_fake_table(100))
    assert hm.get_cmb_cls(lmax=50)["total"].shape == (51, 4)


def test_kk_exact_roughly_matches_limber_shape():
    """Physics cross-check: a table built from our own Limber C_kk should
    round-trip through the deflection convention."""
    cos = Cosmology()
    lmax = 400
    # cmb_lensing_limber returns (ells 2..lmax, C_kk)
    _, cl_lim = cos.cmb_lensing_limber(lmax)
    clkk_limber = np.concatenate([[0.0, 0.0], np.asarray(cl_lim)])
    assert clkk_limber.size == lmax + 1
    dd = clkk_limber * 4.0 / (2.0 * np.pi)     # inverse of the conversion
    cos2 = Cosmology(cls_table={"cls_lens_potential": dd})
    ells, clkk_back = cos2.cmb_lensing_kk_exact(lmax=lmax)
    np.testing.assert_allclose(clkk_back[2:], clkk_limber[2:], rtol=1e-12)
    assert ells.size == lmax + 1


def test_kk_exact_pads_with_nan_beyond_table():
    """Short lens-potential table: NaN-pad to lmax+1 (like get_cmb_cls),
    never silently truncate."""
    dd = np.linspace(1e-8, 1e-7, 200)
    c = Cosmology(cls_table={"cls_lens_potential": dd})
    ells, clkk = c.cmb_lensing_kk_exact(lmax=500)
    assert ells.size == clkk.size == 501
    assert np.all(np.isfinite(clkk[:200]))
    assert np.all(np.isnan(clkk[200:]))
