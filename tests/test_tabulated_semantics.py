"""Tabulated-tier semantics vs the reference's own interpolator, plus the
schema-exact CAMB-table fixture round trip (VERDICT round-2 item 5).

(a) TabulatedEngine's tensor-product Catmull-Rom of ln P is compared
    against the reference's actual `get_matter_power_interpolator_generic`
    (/root/reference/hmvec/utils.py:53-182, pure scipy, imported via
    _refload) built from the SAME synthetic table -- the measured
    deviation replaces the former loose 0.5-2% asserts.
(b) tests/fixtures/camb_table_fixture.npz was written by the UNMODIFIED
    tools/gen_camb_table.py writer running against the schema-faithful
    camb stub (tests/_camb_stub.py); the tests regenerate it and push the
    committed file through pk_table/cls_table end-to-end.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _refload import load_ref  # noqa: E402

from hmvec_tpu.params import merge_params
from hmvec_tpu.models import background as bgmod
from hmvec_tpu.models.linear_power import TabulatedEngine
from hmvec_tpu.twin.core import TwinCosmology

FIXTURE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "fixtures", "camb_table_fixture.npz")


def _synthetic_table(nz=32, nk=300):
    tc = TwinCosmology()
    zs_t = np.linspace(0.0, 4.0, nz)
    ks_t = np.geomspace(1e-5, 150.0, nk)
    return tc, zs_t, ks_t, tc.plin(zs_t, ks_t)


def test_interp_semantics_vs_reference_interpolator():
    """Measured bound: on a 32 x 300 CAMB-shaped grid the engine tracks
    the reference's RectBivariateSpline to 8.4e-4 max / 2.6e-4 p95 at
    strictly off-grid queries (both schemes are BAO-resolution-limited:
    ref-vs-analytic-truth is 3.9e-4 on the same grid).  Pinned at 1.5x
    the measured numbers."""
    ref_utils = load_ref("utils")
    tc, zs_t, ks_t, pk_t = _synthetic_table()
    PK = ref_utils.get_matter_power_interpolator_generic(
        ks_t, zs_t, pk_t, log_interp=True)
    eng = TabulatedEngine(zs_t, ks_t, pk_t)
    bg = bgmod.background(merge_params())

    zq = np.linspace(0.07, 3.93, 23)
    kq = np.geomspace(2.3e-5, 120.0, 257)
    p_ref = PK.P(zq, kq, grid=True)
    p_eng = np.asarray(eng.plin(bg, zq, kq, accuracy="high"))
    dev = np.abs(p_eng / p_ref - 1.0)
    assert dev.max() < 1.3e-3, dev.max()
    assert np.percentile(dev, 95) < 4e-4

    # absolute truth: the engine is as close to the analytic P as the
    # reference's spline on the same table (no added interpolation error
    # beyond grid resolution)
    p_true = tc.plin(zq, kq)
    assert np.abs(p_eng / p_true - 1.0).max() < 1.6e-3


def test_interp_semantics_converge_with_table_density():
    """Doubling the k-sampling shrinks the engine-vs-spline deviation
    superlinearly (local cubic vs global spline -> both converge)."""
    ref_utils = load_ref("utils")
    tc, zs_t, ks_t, pk_t = _synthetic_table(nk=600)
    PK = ref_utils.get_matter_power_interpolator_generic(
        ks_t, zs_t, pk_t, log_interp=True)
    eng = TabulatedEngine(zs_t, ks_t, pk_t)
    bg = bgmod.background(merge_params())
    zq = np.linspace(0.07, 3.93, 11)
    kq = np.geomspace(1e-4, 100.0, 157)
    dev = np.abs(np.asarray(eng.plin(bg, zq, kq, accuracy="high"))
                 / PK.P(zq, kq, grid=True) - 1.0)
    assert dev.max() < 2.5e-4, dev.max()


def test_power_law_extrapolation_beyond_kmax():
    """Beyond the table kmax the engine extrapolates ln P linearly in
    ln k (power law) -- the reference's extrap_kmax semantics, not the
    diverging raw-spline extrapolation."""
    _, zs_t, ks_t, pk_t = _synthetic_table()
    eng = TabulatedEngine(zs_t, ks_t, pk_t)
    bg = bgmod.background(merge_params())
    kq = np.array([200.0, 400.0, 800.0])
    p = np.asarray(eng.plin(bg, np.array([0.0]), kq, accuracy="high"))[0]
    slopes = np.diff(np.log(p)) / np.diff(np.log(kq))
    assert np.allclose(slopes[0], slopes[1], rtol=1e-6)   # pure power law
    assert -4.0 < slopes[0] < -2.0                         # sane tail


def test_fixture_is_writer_output():
    """Regenerating through the unmodified tool + stub reproduces the
    committed fixture exactly (schema and values)."""
    import _camb_stub
    out = "/tmp/camb_table_regen.npz"
    _camb_stub.generate_fixture(out)
    a = np.load(FIXTURE)
    b = np.load(out)
    assert set(a.files) == set(b.files) == {
        "zs", "ks", "plin", "pnl", "cls_lensed", "cls_unlensed",
        "cls_lens_potential"}
    for k in a.files:
        assert a[k].shape == b[k].shape, k
        np.testing.assert_allclose(a[k], b[k], rtol=1e-12, err_msg=k)


def test_fixture_through_pk_table_and_cls_table():
    """The committed tool-emitted file loads end-to-end: pk_table feeds
    the 'high' tier and the nonlinear grid; cls_table feeds get_cmb_cls
    and the exact C_kk."""
    from hmvec_tpu.models.cosmology import Cosmology

    t = np.load(FIXTURE)
    cos = Cosmology(engine="camb",
                    pk_table=(t["zs"], t["ks"], t["plin"], t["pnl"]),
                    cls_table={k: t[k] for k in
                               ("cls_lensed", "cls_unlensed",
                                "cls_lens_potential")},
                    accuracy="high")
    zq = np.array([0.1, 1.3])
    kq = np.geomspace(1e-3, 50.0, 64)
    p_hi = np.asarray(cos.P_lin_slow(kq, zq))
    tc = TwinCosmology()
    np.testing.assert_allclose(p_hi, tc.plin(zq, kq), rtol=3e-3)
    pnl = np.asarray(cos._get_matter_power(zq, kq, nonlinear=True))
    assert pnl.shape == p_hi.shape and np.all(pnl >= p_hi * 0.99)

    cls = cos.get_cmb_cls(lmax=500)
    assert cls["total"].shape == (501, 4)
    assert cls["unlensed_scalar"].shape == (501, 4)
    assert np.all(np.isfinite(cls["total"]))
    # lmax beyond the table NaN-pads (reference cut semantics)
    cls_big = cos.get_cmb_cls(lmax=800)
    assert np.isnan(cls_big["total"][700]).all()

    ells, ckk = cos.cmb_lensing_kk_exact(lmax=500)
    assert ells.size == 501 and np.all(np.isfinite(ckk[2:]))
    assert np.all(ckk[2:] >= 0)


def test_medium_tier_normalizes_to_table():
    """'medium' = EH shape x table normalization at knorm (reference
    cosmology.py:353-374): at low k it equals the table, at high k it
    keeps the EH shape."""
    t = np.load(FIXTURE)
    eng = TabulatedEngine(t["zs"], t["ks"], t["plin"])
    bg = bgmod.background(merge_params())
    zq = np.array([0.5])
    p_med = np.asarray(eng.plin(bg, zq, np.array([2e-4]),
                                accuracy="medium"))
    p_hi = np.asarray(eng.plin(bg, zq, np.array([2e-4]), accuracy="high"))
    np.testing.assert_allclose(p_med, p_hi, rtol=2e-3)


def test_two_point_z_table():
    """nz=2 tables: np.gradient falls back to one-sided slopes; the
    interpolation must stay finite and reduce to linear-in-z of ln P."""
    tc = TwinCosmology()
    zs_t = np.array([0.0, 2.0])
    ks_t = np.geomspace(1e-4, 50.0, 200)
    eng = TabulatedEngine(zs_t, ks_t, tc.plin(zs_t, ks_t))
    bg = bgmod.background(merge_params())
    p = np.asarray(eng.plin(bg, np.array([0.5, 1.7]), ks_t[5:150:7],
                            accuracy="high"))
    assert np.all(np.isfinite(p)) and np.all(p > 0)
    truth = tc.plin(np.array([0.5, 1.7]), ks_t[5:150:7])
    # linear-in-z of ln P over dz=2 leaves the growth curvature:
    # measured ~9% (k-independent) -- the same reduced-order caveat the
    # reference documents for < 4 z points (utils.py docstring)
    dev = np.abs(p / truth - 1.0)
    assert np.max(dev) < 0.15
    assert np.ptp(dev, axis=1).max() < 1e-10   # pure z-interp error
