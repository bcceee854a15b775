"""TabulatedEngine: the CAMB/CLASS-parity path (host-provided P(z,k))."""

import numpy as np

from hmvec_tpu.models.cosmology import Cosmology
from hmvec_tpu.models.halo_model import HaloModel
from hmvec_tpu.models.linear_power import TabulatedEngine, plin_approx
from hmvec_tpu.models import background as bgm
from hmvec_tpu.params import merge_params


def _table():
    """Build a dense synthetic 'engine' table from the analytic power."""
    bg = bgm.background(merge_params())
    zs_t = np.linspace(0.0, 4.0, 40)
    ks_t = np.geomspace(1e-5, 3000, 800)
    p_t = np.asarray(plin_approx(bg, zs_t, ks_t))
    return zs_t, ks_t, p_t


def test_high_tier_interpolates_table():
    zs_t, ks_t, p_t = _table()
    eng = TabulatedEngine(zs_t, ks_t, p_t)
    bg = bgm.background(merge_params())
    zs = np.array([0.3, 1.7])
    ks = np.geomspace(1e-3, 100, 100)
    got = np.asarray(eng.plin(bg, zs, ks, accuracy="high"))
    want = np.asarray(plin_approx(bg, zs, ks))
    # bilinear-in-(z, lnk) interp of the dense table
    np.testing.assert_allclose(got, want, rtol=5e-3)


def test_medium_tier_normalizes_eh_shape():
    zs_t, ks_t, p_t = _table()
    eng = TabulatedEngine(zs_t, ks_t, p_t)
    bg = bgm.background(merge_params())
    zs = np.array([0.5])
    ks = np.geomspace(1e-3, 100, 50)
    got = np.asarray(eng.plin(bg, zs, ks, accuracy="medium"))
    want = np.asarray(plin_approx(bg, zs, ks))
    # with a table generated from the same EH power, 'medium' == analytic
    # up to the knorm normalization interp error
    np.testing.assert_allclose(got, want, rtol=1e-2)


def test_halomodel_with_pk_table():
    zs_t, ks_t, p_t = _table()
    zs = np.array([0.3, 1.0])
    ks = np.geomspace(1e-3, 20, 60)
    ms = np.geomspace(1e11, 1e16, 30)
    hm_tab = HaloModel(zs, ks, ms=ms, engine="camb",
                       pk_table=(zs_t, ks_t, p_t))
    hm_eh = HaloModel(zs, ks, ms=ms)
    p_tab = np.asarray(hm_tab.get_power("nfw"))
    p_eh = np.asarray(hm_eh.get_power("nfw"))
    # same underlying physics -> close; table interp is the only difference
    np.testing.assert_allclose(p_tab, p_eh, rtol=2e-2)


def test_nonlinear_table_path():
    zs_t, ks_t, p_t = _table()
    eng = TabulatedEngine(zs_t, ks_t, p_t, p_nl_t=2.0 * p_t)
    bg = bgm.background(merge_params())
    got_nl = np.asarray(eng.pzk_grid(bg, np.array([0.5]),
                                     np.geomspace(1e-2, 10, 20),
                                     nonlinear=True))
    got_l = np.asarray(eng.pzk_grid(bg, np.array([0.5]),
                                    np.geomspace(1e-2, 10, 20)))
    np.testing.assert_allclose(got_nl, 2.0 * got_l, rtol=1e-10)
