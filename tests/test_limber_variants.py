"""Limber projection variants (single-z windows, dndz windows, tSZ) and
gradient smoke tests through the electron/HOD pipelines."""

import numpy as np
import jax
import jax.numpy as jnp

from hmvec_tpu.models.cosmology import Cosmology
from hmvec_tpu.models.linear_power import plin_approx

ZS = np.linspace(0.1, 2.0, 16)
KS = np.geomspace(1e-4, 20, 200)
ELLS = np.geomspace(30, 1000, 10)


def _P(c):
    return plin_approx(c.bg, ZS, KS)


def test_cgg_dndz_and_tophat():
    c = Cosmology()
    P = _P(c)
    dndz = np.exp(-((ZS - 0.8) ** 2) / 0.18)
    cl_dndz = np.asarray(c.C_gg(ELLS, ZS, KS, P, gzs=ZS, gdndz=dndz))
    assert cl_dndz.shape == ELLS.shape and np.all(cl_dndz > 0)
    # single-z top-hat window path (zmin/zmax)
    cl_th = np.asarray(c.C_gg(ELLS, ZS, KS, P, gzs=np.array([0.8]),
                              zmin=0.7, zmax=0.9))
    assert cl_th.shape == ELLS.shape and np.all(cl_th > 0)
    # narrow top-hat ~ dndz-weighted within factors
    assert np.all(cl_th / cl_dndz < 30) and np.all(cl_th / cl_dndz > 1 / 30)


def test_cgy_cky_cyy_run():
    c = Cosmology()
    P = _P(c)
    dndz = np.exp(-((ZS - 0.8) ** 2) / 0.18)
    for cl in (c.C_gy(ELLS, ZS, KS, P, gzs=ZS, gdndz=dndz),
               c.C_ky(ELLS, ZS, KS, P, lzs1=1100.0),
               c.C_yy(ELLS, ZS, KS, P)):
        cl = np.asarray(cl)
        assert cl.shape == ELLS.shape
        assert np.all(np.isfinite(cl)) and np.all(cl > 0)


def test_ckg_single_source_plane():
    c = Cosmology()
    P = _P(c)
    dndz = np.exp(-((ZS - 0.8) ** 2) / 0.18)
    cl = np.asarray(c.C_kg(ELLS, ZS, KS, P, gzs=ZS, gdndz=dndz, lzs=1100.0))
    assert np.all(cl > 0)
    # lensing window with a galaxy dndz source
    lw = np.asarray(c.lensing_window(ZS, ZS, dndz))
    assert lw.shape == ZS.shape and np.all(lw >= 0)


def test_electron_pipeline_grad():
    from hmvec_tpu.pipeline import make_electron_fn
    zs = np.array([0.5, 1.0])
    ks = np.geomspace(1e-3, 10, 40)
    ms = np.geomspace(1e11, 1e16, 16)
    fn = make_electron_fn(zs, ks, ms, nxs=128, xmax=10, jit=False)

    def loss(omch2):
        pee, pme = fn({"omch2": omch2})
        return jnp.sum(pee) + jnp.sum(pme)

    g = jax.jit(jax.grad(loss))(jnp.asarray(0.1198))
    assert np.isfinite(float(g)) and float(g) != 0.0


def test_hod_pipeline_grad():
    from hmvec_tpu.pipeline import make_hod_fn
    zs = np.array([0.5, 1.0])
    ks = np.geomspace(1e-3, 10, 40)
    ms = np.geomspace(1e11, 1e16, 30)
    fn = make_hod_fn(zs, ks, ms, np.full(2, 1e-4), jit=False)

    def loss(As):
        pgg, pgm = fn({"As": As})
        return jnp.sum(pgg)

    g = jax.jit(jax.grad(loss))(jnp.asarray(2.2e-9))
    assert np.isfinite(float(g)) and float(g) != 0.0
