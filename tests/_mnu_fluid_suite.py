"""Massive-neutrino fluid in boltzlite (round-4 extension, VERDICT r3
item 8): exact Fermi-Dirac background + (delta, v) fluid with adiabatic
sound speed, threaded through the hierarchy and the 'boltz' engine.

Validation strategy: exact FD limits, bit-exact mnu = 0 pass-through
(the fluid slots are inert -- every feedback term carries rho_nu = 0),
and the physical suppression envelope: P(mnu)/P(0) -> -8 f_nu at
k >> k_fs (measured -17.5% vs -17.7% at mnu = 0.3 eV), monotone through
the free-streaming transition, with delta_cb less suppressed than
delta_tot by ~2 f_nu.
"""

import numpy as np
import jax
import jax.numpy as jnp

from hmvec_tpu.params import merge_params
from hmvec_tpu.models import background as bgmod
from hmvec_tpu.models import boltzlite as bz
from hmvec_tpu.models.recomb import recombination
from hmvec_tpu.models.boltzlite import _fd_rho_p, _I_RHO0, _I_NUM


def test_fd_integral_limits():
    """64-node Gauss-Laguerre I_rho/I_P: exact radiation and matter
    limits, monotone w(y) in between."""
    ir0, ip0 = _fd_rho_p(jnp.asarray(1e-8))
    assert abs(float(ir0) / _I_RHO0 - 1.0) < 1e-9
    assert abs(float(ip0 / ir0) - 1.0 / 3.0) < 1e-9
    irn, ipn = _fd_rho_p(jnp.asarray(1e5))
    assert abs(float(irn) / (1e5 * _I_NUM) - 1.0) < 1e-6
    assert float(ipn / irn) < 1e-7
    ws = [float(ip / ir) for ir, ip in
          (_fd_rho_p(jnp.asarray(y)) for y in (0.1, 1.0, 10.0, 100.0))]
    assert all(a > b for a, b in zip(ws, ws[1:]))
    assert 0.0 < ws[-1] < 1.0 / 3.0


def test_mnu_zero_bit_identical():
    """With mnu = 0 the massive-nu machinery is exactly inert: every
    pre-existing state slot evolves bit-identically with the fluid
    compiled in vs the round-3 bookkeeping."""
    bg = bgmod.background(merge_params())
    rec = recombination(bg)
    ks = jnp.asarray([0.01, 0.1])
    opts = dict(n_a=300, n_b_outer=210, n_b_inner=4, n_c_outer=76,
                n_c_inner=11)
    sa = bz.solve_perturbations(bz.make_ctx(bg, rec, massive_nu=True),
                                ks, **opts)
    sb = bz.solve_perturbations(bz.make_ctx(bg, rec, massive_nu=False),
                                ks, **opts)
    d = np.max(np.abs(np.asarray(sa.states[..., :bz._I_NM])
                      - np.asarray(sb.states[..., :bz._I_NM])))
    assert d == 0.0


def test_pk_suppression_envelope():
    """P(mnu)/P(0) from the fluid solve: the published free-streaming
    envelope -- ~ -8 f_nu at high k, small at low k, monotone decrease
    through the transition; delta_cb less suppressed than delta_tot;
    and the suppression EVOLVES with z (round-5: read off the stored
    trajectory, not frozen at its z=0 shape)."""
    from hmvec_tpu.models.boltz_engine import matter_power_slices
    ks = np.geomspace(5e-4, 0.4, 12)
    zsl = (0.0, 3.0)
    _, P0 = matter_power_slices({}, ks=ks, zs=zsl)
    _, Pm = matter_power_slices({"mnu": 0.3}, ks=ks, zs=zsl,
                                massive_nu=True, component="total")
    _, pcb_2 = matter_power_slices({"mnu": 0.3}, ks=ks, zs=(0.0,),
                                   massive_nu=True, component="cb")
    p0, pm, pcb = P0[0], Pm[0], pcb_2[0]
    r = pm / p0
    # free-streaming suppression accumulates: shallower at z=3 than at
    # z=0 at the high-k end (the growth-rate deficit has had less time
    # to act; measured +0.020), while the low-k response evolves much
    # less (measured -0.007, mostly near-horizon/background effects) --
    # the z-evolution is concentrated at high k as free-streaming
    # physics requires
    r3 = Pm[1] / P0[1]
    assert r3[-1] > r[-1] + 0.01
    assert abs(r3[1] - r[1]) < 0.5 * (r3[-1] - r[-1])
    h = 0.673
    omm = (0.1198 + 0.02225 + 0.3 / 93.14) / h**2
    fnu = (0.3 / 93.14 / h**2) / omm
    # high-k plateau at -8 f_nu within 15% of itself
    assert abs((r[-1] - 1.0) / (-8.0 * fnu) - 1.0) < 0.15
    # low-k end barely suppressed relative to the plateau
    assert r[1] - r[-1] > 4.0 * fnu
    # monotone decrease through the transition band
    band = r[(ks > 3e-3) & (ks < 0.3)]
    assert np.all(np.diff(band) < 1e-3)
    # cold matter is LESS suppressed than total (nu don't cluster):
    # the gap at high k is ~ 2 f_nu
    gap = (pcb / pm)[-1] - 1.0
    assert 0.5 * 2 * fnu < gap < 2.0 * 2 * fnu


def test_clpp_response_sign_and_shape():
    """C_phiphi mnu-response (reduced-resolution solves): suppressed at
    higher L (free-streaming kills small-scale lensing power),
    near-unchanged at the lowest L -- the published envelope shape.
    Also: the fluid response is SMALLER than the round-3 massless
    bookkeeping's (which double-counted mnu as radiation AND matter),
    pinning that the new background really replaced the old one."""
    from hmvec_tpu.models.boltzlite import compute_cls
    kw = dict(lmax=300, nk=32, nkf=600, lens_potential=True, lmax_pp=120)
    cl0, pp0 = compute_cls(merge_params({}), **kw)
    clm, ppm = compute_cls(merge_params({"mnu": 0.3}), **kw)
    r = ppm[2:121] / pp0[2:121]
    Ls = np.arange(2, 121)
    hi = r[Ls >= 80].mean()
    lo = r[(Ls >= 5) & (Ls <= 20)].mean()
    assert hi < 0.995          # suppressed at high L (measured ~0.975)
    assert lo > hi             # monotone envelope: low L less suppressed
    assert abs(lo - 1.0) < 0.03
    # old-bookkeeping TT response is larger (double-counted background);
    # cl0/clm reused from the solves above -- only ONE extra solve here
    clm_old = compute_cls(merge_params({"mnu": 0.3}), lmax=300, nk=32,
                          nkf=600, massive_nu=False)
    l = np.arange(40, 301)
    dev_new = np.abs(clm[l, 0] / cl0[l, 0] - 1.0).mean()
    dev_old = np.abs(clm_old[l, 0] / cl0[l, 0] - 1.0).mean()
    assert dev_new < dev_old


def test_fd_consistent_recombination_background():
    """Round-5 (ADVICE r4): recombination(massive_nu=True) integrates
    the exact Fermi-Dirac neutrino background.  Bit-identical at
    mnu = 0; at mnu = 0.3 the drag sound horizon GROWS by ~0.6% because
    the FD form replaces the round-3 double-counting (massive species
    as full massless radiation AND extra matter) with the single exact
    density."""
    from hmvec_tpu.models.recomb import recombination
    from hmvec_tpu.models.boltz_engine import rs_drag_integral
    bg0 = bgmod.background(merge_params())
    ra = recombination(bg0)
    rb = recombination(bg0, massive_nu=True)
    assert float(np.max(np.abs(np.asarray(ra.eta)
                               - np.asarray(rb.eta)))) == 0.0
    bgm = bgmod.background(merge_params({"mnu": 0.3}))
    rs_m, _ = rs_drag_integral(bg=bgm, rec=recombination(bgm))
    rs_f, _ = rs_drag_integral(bg=bgm,
                               rec=recombination(bgm, massive_nu=True))
    shift = rs_f / rs_m - 1.0
    assert 2e-3 < shift < 1.2e-2          # measured +0.59%
