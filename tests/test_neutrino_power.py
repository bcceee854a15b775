"""Massive-neutrino linear power: EH99 free-streaming suppression.

The reference gets mnu physics by passing it to CAMB
(/root/reference/hmvec/cosmology.py:167,170-171); the engine-free tier here
applies the EH99 (astro-ph/9710252) suppression ratio on the EH98 spectrum
(models/transfer.eh99_neutrino_ratio).  Oracles: the independent numpy twin
(same published equations, separate implementation) plus external physics
anchors (the ~ -8 f_nu small-scale suppression band, scale/redshift trends).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hmvec_tpu.params import merge_params
from hmvec_tpu.models import background as bgmod
from hmvec_tpu.models import linear_power as lpm
from hmvec_tpu.models import transfer
from hmvec_tpu.twin.core import TwinCosmology


def _setup(mnu, **over):
    p = merge_params({"mnu": mnu, **over})
    return bgmod.background(p), TwinCosmology({"mnu": mnu, **over}), p


def test_twin_parity():
    """jax vs the independent numpy twin at <=1e-12 across mnu values."""
    zs = np.array([0.0, 0.7, 2.0, 4.0])
    ks = np.geomspace(1e-5, 50.0, 300)
    for mnu in (0.06, 0.12, 0.3, 0.6):
        bg, tw, _ = _setup(mnu)
        pj = np.asarray(lpm.plin_approx(bg, zs, ks))
        pt = tw.plin_approx(zs, ks)
        np.testing.assert_allclose(pj, pt, rtol=1e-12)


def test_mnu_zero_passthrough_bit_exact(monkeypatch):
    """mnu = 0 must be a bit-exact pass-through: under jit the compiled
    (gated) ratio changes nothing vs the same jit with the neutrino
    branch disabled.  (jit vs eager differs by ~1 ulp from XLA fusion
    independent of this feature, so the comparison is jit-vs-jit.)"""
    zs = np.array([0.0, 1.0])
    ks = np.geomspace(1e-4, 10.0, 100)
    bg, _, _ = _setup(0.0)
    p_on = np.asarray(jax.jit(lambda b: lpm.plin_approx(b, zs, ks))(bg))
    monkeypatch.setattr(lpm, "_mnu_maybe_active", lambda x: False)
    p_off = np.asarray(jax.jit(lambda b: lpm.plin_approx(b, zs, ks))(bg))
    np.testing.assert_array_equal(p_on, p_off)


def test_suppression_band():
    """Small-scale suppression lands in the EH99 band around the canonical
    -8 f_nu (the fit gives -9..-11 f_nu asymptotically), and large scales
    are unsuppressed."""
    zs = np.array([0.0])
    for mnu in (0.3, 0.6):
        bg, _, p = _setup(mnu)
        da = np.asarray(bgmod.d_growth(bg, 1.0 / (1.0 + zs), norm="anorm"))
        f_nu = (mnu / 93.14) / (p["omch2"] + p["ombh2"] + mnu / 93.14)
        R = np.asarray(transfer.eh99_neutrino_ratio(
            bg, np.array([1e-6, 1.0, 10.0]), da))
        sup = R[0] ** 2 - 1.0
        assert abs(sup[0]) < 1e-2                      # k << k_fs: no effect
        assert -12.0 * f_nu < sup[1] < -7.0 * f_nu     # k = 1
        assert -12.0 * f_nu < sup[2] < -8.0 * f_nu     # deep suppression
        assert sup[2] < sup[1]                          # deepens with k


def test_redshift_trend():
    """Suppression grows toward z = 0 (free-streaming accumulates growth
    suppression), a standard linear-theory result."""
    bg, _, _ = _setup(0.3)
    zs = np.array([0.0, 1.0, 3.0])
    da = np.asarray(bgmod.d_growth(bg, 1.0 / (1.0 + zs), norm="anorm"))
    R = np.asarray(transfer.eh99_neutrino_ratio(bg, np.array([2.0]), da))
    s0, s1, s3 = R[:, 0] ** 2 - 1.0
    assert s0 < s1 < s3 < 0.0


def test_sigma8_decreases_with_mnu():
    from hmvec_tpu.models.cosmology import Cosmology
    s8 = [float(Cosmology({"mnu": m}).get_sigma8(np.array([0.0]))[0])
          for m in (0.0, 0.3)]
    assert s8[1] < s8[0] * 0.95


def test_grad_finite_nonzero():
    """d ln P(k=1, z=0) / d mnu at a nonzero fiducial: finite, negative
    (more neutrino mass -> more suppression), and usable under jit."""
    base = merge_params({})

    def lnp(mnu):
        p = dict(base)
        p["mnu"] = mnu
        bg = bgmod.background(p)
        return jnp.log(lpm.plin_approx(bg, jnp.array([0.0]),
                                       jnp.array([1.0]))[0, 0])

    g = float(jax.jit(jax.grad(lnp))(jnp.asarray(0.12)))
    assert np.isfinite(g) and g < 0.0
    # finite-difference cross-check at 1e-3 tolerance
    eps = 1e-4
    fd = (float(lnp(0.12 + eps)) - float(lnp(0.12 - eps))) / (2 * eps)
    np.testing.assert_allclose(g, fd, rtol=1e-3)


def test_grad_at_zero_is_zero_and_finite():
    """At exactly mnu = 0 the gate returns 0 gradient (documented: the
    EH99 fit has an f_nu^0.64 cusp there), never NaN."""
    base = merge_params({})

    def lnp(mnu):
        p = dict(base)
        p["mnu"] = mnu
        bg = bgmod.background(p)
        return jnp.log(lpm.plin_approx(bg, jnp.array([0.0]),
                                       jnp.array([1.0]))[0, 0])

    g = float(jax.grad(lnp)(jnp.asarray(0.0)))
    assert np.isfinite(g)


def test_num_massive_neutrinos_param():
    """N_nu (params['num_massive_neutrinos'], the key the reference feeds
    CAMB) shifts the free-streaming scale: fewer, heavier species free-
    stream less (suppression sets in at higher k)."""
    zs = np.array([0.0])
    ks = np.array([3e-3])
    sups = []
    for nnu_m in (1, 3):
        p = merge_params({"mnu": 0.3, "num_massive_neutrinos": nnu_m})
        bg = bgmod.background(p)
        da = np.asarray(bgmod.d_growth(bg, 1.0 / (1.0 + zs), norm="anorm"))
        R = np.asarray(transfer.eh99_neutrino_ratio(bg, ks, da))
        sups.append(R[0, 0] ** 2 - 1.0)
    # at fixed total mnu, 3 light species free-stream at larger scales
    # than 1 heavy one -> more suppression at this mid-transition k
    assert sups[1] < sups[0]


def test_full_pipeline_smoke():
    """mnu threads through the class API end to end: Pmm at mnu = 0.3 is
    suppressed at k ~ 1 relative to mnu = 0 (total includes background
    and growth shifts, so just require a clear net suppression)."""
    from hmvec_tpu.models.halo_model import HaloModel
    zs = np.array([0.5])
    ms = np.geomspace(1e11, 1e15, 40)
    ks = np.geomspace(1e-3, 5.0, 64)
    pmm = {}
    for mnu in (0.0, 0.3):
        h = HaloModel(zs, ks, ms, params={"mnu": mnu})
        pmm[mnu] = np.asarray(h.get_power("nfw"))
    i1 = np.argmin(np.abs(ks - 1.0))
    r = pmm[0.3][0, i1] / pmm[0.0][0, i1]
    assert 0.6 < r < 0.95
