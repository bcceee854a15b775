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
    and -- in the separable serving mode -- the z-dependence is the
    growth factor squared (the round-4 pin, now on z_resolved=False;
    the shared table is a cache hit, no second solve)."""
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
    d = np.asarray(bgmod.d_growth(bg1, 1.0 / (1.0 + np.asarray(zs)),
                                  norm="z0norm"))
    eng_sep = BoltzEngine(kmax=KMAX, k_graft=KGRAFT,
                          ks=default_k_grid(kmax=KMAX, dk_bao=0.005,
                                            nk_log=16),
                          z_resolved=False)
    pz = np.asarray(eng_sep.plin(bg1, zs, ks))
    np.testing.assert_allclose(
        pz / pz[0], np.broadcast_to((d**2)[:, None], pz.shape), rtol=1e-9)
    # the default z-resolved serving departs from separability by the
    # solved residual: nonzero but small at z <= 3
    pzr = np.asarray(engine.plin(bg1, zs, ks))
    dev = np.abs(pzr / pzr[0] / (d**2)[:, None] - 1.0)
    assert dev[0].max() < 1e-12            # z = 0 identical
    assert 1e-5 < dev[1:].max() < 5e-3


def test_z_resolved_residual(engine, bg):
    """The engine-grade 2-D serving (VERDICT r4 item 2): P(k,z) read off
    the solved trajectory deviates from separable D^2(z) scaling with
    the radiation-era signature -- suppressed at low k, enhanced at
    high k, growing with z -- and serving AT a stored slice reproduces
    the solved ratio exactly."""
    kd = jnp.asarray(engine.ks_t[engine.ks_t <= KGRAFT][2:])
    zs = jnp.asarray([0.0, 2.0, 8.0])
    pz = np.asarray(engine.plin(bg, zs, kd))
    d = np.asarray(bgmod.d_growth(bg, 1.0 / (1.0 + np.asarray(zs)),
                                  norm="z0norm"))
    r = np.sqrt(pz / pz[0]) / d[:, None]
    # z = 0: exactly 1 by construction
    np.testing.assert_allclose(r[0], 1.0, atol=1e-12)
    # z = 8: low-k suppressed, high-k enhanced, ~few-1e-3 k-spread
    assert r[2][0] < 0.9985
    assert r[2][-1] > 1.0003
    assert 1.5e-3 < (r[2].max() - r[2].min()) < 2e-2
    # the spread GROWS with z
    assert (r[2].max() - r[2].min()) > 2.0 * (r[1].max() - r[1].min())
    # slice-exactness: kd sits on solver nodes and z=2 is a stored
    # slice, so the served ratio IS the solved ratio (no interp error)
    iz = engine.z_slices.index(2.0)
    node = np.isin(np.round(np.log(np.asarray(kd)), 12),
                   np.round(engine._lnk_b, 12))
    lnr_srv = np.log(r[1])[node]
    lnr_tab = engine._resid("closed")[iz][
        np.isin(np.round(engine._lnk_b, 12),
                np.round(np.log(np.asarray(kd)), 12))]
    np.testing.assert_allclose(lnr_srv, lnr_tab, atol=1e-9)
    # beyond the last stored slice the residual is held (finite, no
    # extrapolation blow-up)
    p25 = np.asarray(engine.plin(bg, jnp.asarray([25.0]), kd))
    assert np.all(np.isfinite(p25)) and np.all(p25 > 0)


def test_shape_response_jacfwd():
    """Engine-grade Fisher in the shape parameters (VERDICT r4 item 3):
    jacfwd of ln P through engine='boltz' with shape_response matches
    central finite differences of FULL re-solves taken at a DIFFERENT
    step, to <= 1% of the derivative scale.  Tiny 19-mode grid and a
    reduced RK4 schedule (derivative CONSISTENCY needs both routes on
    the same schedule, not full convergence) keep the 5 solves cheap;
    the CFL edge for the reduced segment C is ~0.15/Mpc > kmax."""
    kmx, kgr = 0.12, 0.10
    so = dict(n_a=600, n_b_outer=420, n_b_inner=4, n_c_outer=170)
    ks_s = default_k_grid(kmax=kmx, k_bao_lo=0.02, dk_bao=0.01, nk_log=8)
    eng = BoltzEngine(kmax=kmx, k_graft=kgr, ks=ks_s,
                      shape_response=("omch2",), solver_opts=so)
    kd = jnp.geomspace(2e-3, 0.5, 12)
    p0f = merge_params()

    def f(omch2):
        bgt = bgmod.background(merge_params({"omch2": omch2}))
        return jnp.log(eng.plin(bgt, jnp.asarray([0.0]), kd)[0])

    jac = np.asarray(jax.jacfwd(f)(jnp.asarray(p0f["omch2"])))
    # independent central difference of full re-solves, h' != ctor h
    from hmvec_tpu.models.boltz_engine import (_solved_slices,
                                               _graft_eh_tail)
    h2 = 0.0012
    tabs = []
    for sgn in (+1.0, -1.0):
        pp = dict(p0f)
        pp["omch2"] = p0f["omch2"] + sgn * h2
        ks2, psl2, _, _, _ = _solved_slices(
            pp, kmx, 7.7, ks_s, None, "eh99", "total", eng.z_slices, so)
        bg2 = bgmod.background(merge_params(pp))
        kf2, pf2, _ = _graft_eh_tail(bg2, ks2, psl2[0], kgr, 2100.0)
        tabs.append(np.interp(np.log(np.asarray(kd)), np.log(kf2),
                              np.log(pf2)))
    fd = (tabs[0] - tabs[1]) / (2.0 * h2)
    scale = np.abs(fd).max()
    assert np.abs(jac - fd).max() / scale < 0.01
    # and the derivative is the real thing, not noise: d lnP/d omch2
    # swings tens per unit omch2 across this k range
    assert scale > 5.0


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
    is converged at the CFL-margin default.  The grid is the SAME
    12-mode geomspace the mnu-fluid battery solves, so in the merged
    isolation process the base solve shares that compile (suite-time
    lever, VERDICT r4 item 1)."""
    ks = np.geomspace(5e-4, 0.4, 12)
    _, p_a = matter_power_z0(ks=ks)
    _, p_b = matter_power_z0(ks=ks, n_c_inner=26)
    assert np.all(np.abs(p_b / p_a - 1.0) < 3e-3)
