"""The 'boltz' linear-power engine: engine-grade BAO with no table file.

Closes the last SURVEY partial (VERDICT r3 item 2): the reference's
default P_lin tier is a true Boltzmann solve
(/root/reference/hmvec/cosmology.py:376,:784-786); here the repo's own
hierarchy (models/boltzlite.py) backs the engine switch.

The headline pin is a BAO-feature test the EH tier cannot pass: the
engine's measured wiggle scale matches the INTEGRATED drag-epoch sound
horizon (which for the fiducial cosmology reproduces the Planck-2018
r_drag = 147.09 Mpc / z_drag = 1059.9 to ~0.1%), while the EH98
'eisenhu_osc' template's wiggle scale -- set by the EH98 fitting-form
sound horizon -- is ~4% off the integral.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hmvec_tpu.params import merge_params
from hmvec_tpu.models import background as bgmod
from hmvec_tpu.models.boltz_engine import (BoltzEngine, default_k_grid,
                                           matter_power_z0,
                                           rs_drag_integral)
from hmvec_tpu.models.linear_power import plin_approx
from hmvec_tpu.models.distances_ext import rs_drag_eh

# reduced solver grid: ~86 modes, kmax 0.42 -- enough to cover the whole
# wiggle band at >= 8 nodes/period while keeping the one-time session
# solve ~70 s on this host
KMAX, KGRAFT = 0.42, 0.38


@pytest.fixture(scope="module")
def engine():
    ks = default_k_grid(kmax=KMAX, dk_bao=0.005, nk_log=16)
    return BoltzEngine(kmax=KMAX, k_graft=KGRAFT, ks=ks)


@pytest.fixture(scope="module")
def bg():
    return bgmod.background(merge_params())


def _wiggle(kd, pk):
    """Fractional wiggle residual of ln P about a smooth lnk-polynomial."""
    lp = np.log(pk)
    return lp - np.polyval(np.polyfit(np.log(kd), lp, 9), np.log(kd))


def _rs_matched_filter(kd, w):
    """Wiggle scale via matched filter: argmax_r |int w e^{i r k} dk|."""
    rs_grid = np.linspace(120.0, 180.0, 6001)
    amp = np.abs(np.trapezoid(
        w[None, :] * np.exp(1j * rs_grid[:, None] * kd[None, :]),
        kd, axis=1))
    return rs_grid[np.argmax(amp)]


def test_rs_drag_integral_planck_anchor(bg):
    """The integrated drag sound horizon reproduces the Planck-2018
    fiducial-cosmology values; the EH98 fitting form is ~2-3% off."""
    rs, zdrag = rs_drag_integral(bg=bg)
    assert abs(rs - 147.1) < 1.5          # Planck 2018: r_drag = 147.09
    assert abs(zdrag - 1060.0) < 8.0      # Planck 2018: z_drag = 1059.9
    rs_eh = float(np.asarray(rs_drag_eh(bg)))
    assert 0.01 < abs(rs_eh / rs - 1.0) < 0.05


def test_bao_wiggle_scale_matches_integrated_rs(engine, bg):
    """THE engine-grade feature: wiggle spacing set by the integrated
    r_s(z_drag).  The EH98_osc tier's wiggles sit at its fitting-form
    sound horizon, several % away -- it cannot pass this pin."""
    kd = np.linspace(0.04, 0.34, 1200)
    pb = np.asarray(engine.plin(bg, jnp.asarray([0.0]), jnp.asarray(kd)))[0]
    peh = np.asarray(plin_approx(bg, jnp.asarray([0.0]), jnp.asarray(kd)))[0]
    rs_int, _ = rs_drag_integral(bg=bg)
    rs_b = _rs_matched_filter(kd, _wiggle(kd, pb))
    rs_e = _rs_matched_filter(kd, _wiggle(kd, peh))
    assert abs(rs_b / rs_int - 1.0) < 0.015     # measured: -0.9%
    assert abs(rs_e / rs_int - 1.0) > 0.025     # measured: +4.1%
    # and the wiggles are really there (not a smooth spectrum passing
    # trivially): peak fractional wiggle amplitude of a few %
    assert np.abs(_wiggle(kd, pb)).max() > 0.02


def test_broadband_within_eh_envelope_and_sigma8(engine, bg):
    """Broadband agrees with EH98 at the few-% level EH98 claims, and
    sigma8 stays within 2% of the EH tier (VERDICT acceptance)."""
    kd = np.geomspace(1e-4, 10.0, 160)
    pb = np.asarray(engine.plin(bg, jnp.asarray([0.0]), jnp.asarray(kd)))[0]
    peh = np.asarray(plin_approx(bg, jnp.asarray([0.0]), jnp.asarray(kd)))[0]
    assert np.all(np.abs(pb / peh - 1.0) < 0.06)
    from hmvec_tpu.models.cosmology import Cosmology
    s8b = np.asarray(Cosmology(engine=engine).get_sigma8(jnp.asarray([0.0])))
    s8e = np.asarray(Cosmology().get_sigma8(jnp.asarray([0.0])))
    assert abs(float(s8b[0]) / float(s8e[0]) - 1.0) < 0.02


def test_graft_continuity(engine):
    """No kink where the EH98 tail is grafted on: |Delta ln P| across the
    seam below the local wiggle amplitude, and dlnP/dlnk continuous to
    ~1% through the matching window."""
    lnk = engine._lnk
    lnp = engine._lnp
    dlnp = np.diff(lnp) / np.diff(lnk)
    i = np.searchsorted(engine.ks_t, KGRAFT)
    assert np.all(np.abs(np.diff(dlnp[i - 3:i + 3])) < 0.35)
    assert abs(engine._graft_ratio - 1.0) < 0.06


def test_amplitude_tilt_growth_factorization(engine):
    """As/ns rescale EXACTLY (analytic response to the traced background)
    and the z-dependence is the growth factor squared."""
    p1 = merge_params()
    p2 = merge_params({"As": 2.6e-9, "ns": 0.93})
    bg1 = bgmod.background(p1)
    bg2 = bgmod.background(p2)
    ks = jnp.geomspace(1e-3, 1.0, 50)
    a1 = np.asarray(engine.plin(bg1, jnp.asarray([0.0]), ks))[0]
    a2 = np.asarray(engine.plin(bg2, jnp.asarray([0.0]), ks))[0]
    expect = (2.6e-9 / p1["As"]) * np.asarray(ks) ** (0.93 - p1["ns"]) \
        * (p1["pivot_scalar"]) ** (p1["ns"] - 0.93)
    np.testing.assert_allclose(a2 / a1, expect, rtol=1e-12)
    zs = jnp.asarray([0.0, 1.0, 3.0])
    pz = np.asarray(engine.plin(bg1, zs, ks))
    d = np.asarray(bgmod.d_growth(bg1, 1.0 / (1.0 + np.asarray(zs)),
                                  norm="z0norm"))
    np.testing.assert_allclose(
        pz / pz[0], np.broadcast_to((d**2)[:, None], pz.shape), rtol=1e-9)


def test_engine_switch_and_class_api(engine):
    """HaloModel(engine='boltz') end-to-end: Pzk on the grid comes from
    the boltz table, and the halo-model Pmm stays within 10% of the EH
    engine's (same pipeline, different linear tier)."""
    from hmvec_tpu.models.halo_model import HaloModel
    zs = np.linspace(0.1, 2.0, 4)
    ks = np.geomspace(1e-3, 10.0, 64)
    ms = np.geomspace(2e10, 1e16, 40)
    hb = HaloModel(zs, ks, ms=ms, engine=engine)
    he = HaloModel(zs, ks, ms=ms)
    assert hb.engine_name == "boltz"
    pb = np.asarray(hb.get_power("nfw"))
    pe = np.asarray(he.get_power("nfw"))
    assert np.all(np.isfinite(pb))
    assert np.all(np.abs(pb / pe - 1.0) < 0.10)
    # accuracy='low' bypasses the table (reference P_lin_approx semantics)
    lo = np.asarray(engine.plin(hb.bg, jnp.asarray([0.0]),
                                jnp.asarray(ks), accuracy="low"))
    np.testing.assert_allclose(
        lo, np.asarray(plin_approx(hb.bg, jnp.asarray([0.0]),
                                   jnp.asarray(ks))), rtol=1e-12)
    with pytest.raises(NotImplementedError):
        engine.pzk_grid(hb.bg, jnp.asarray([0.0]), jnp.asarray(ks),
                        nonlinear=True)


def test_mnu_response(engine):
    """Massive neutrinos suppress the served power at high k through the
    EH99 response (exactly 1 at mnu = 0), relative to the massless
    table."""
    bg0 = bgmod.background(merge_params())
    bgm = bgmod.background(merge_params({"mnu": 0.2}))
    ks = jnp.geomspace(1e-4, 5.0, 80)
    p0 = np.asarray(engine.plin(bg0, jnp.asarray([0.0]), ks))[0]
    pm = np.asarray(engine.plin(bgm, jnp.asarray([0.0]), ks))[0]
    r = pm / p0
    assert r[-1] < 0.92          # free-streaming suppression at high k
    assert r[0] > 0.97           # little effect at low k


def test_solver_convergence_n_c_inner():
    """Halving the segment-C step changes P(k,0) by < 0.3% -- the solve
    is converged at the CFL-margin default (tiny 8-mode grid)."""
    ks = np.geomspace(5e-4, 0.12, 8)
    _, p_a = matter_power_z0(ks=ks)
    _, p_b = matter_power_z0(ks=ks, n_c_inner=22)
    assert np.all(np.abs(p_b / p_a - 1.0) < 3e-3)
