"""Engine-grade linear P(k,z) from the boltzlite hierarchy ("boltz" engine).

The reference's default linear-power tier is a true Boltzmann solve: CAMB's
matter-power interpolator backs both `P_lin_slow` and the medium-tier
normalization (/root/reference/hmvec/cosmology.py:376, :784-786).  This
module closes the rebuild's last accuracy gap by wiring the repo's own
perturbation hierarchy (models/boltzlite.py -- CDM + baryons + photon
multipoles + massless neutrinos, tight coupling, RECFAST-consistent
recombination) into the linear-power engine switch, so every downstream
consumer (sigma^2 -> mass function, halofit/HMcode, Limber, kSZ) can run
with REAL BAO -- physical wiggle phases set by the integrated sound
horizon, not the Eisenstein-Hu fitting formula -- with no table file.

How the spectrum is built (one host-side solve at engine construction):

  1. Solve the hierarchy per k on a BAO-resolving grid (linear spacing
     ~dk = 0.005/Mpc through the wiggle band: the wiggle period is
     2 pi / r_s ~ 0.042/Mpc, so >= 8 nodes/period), to x = ln a = 0.
  2. Form the CDM-frame (comoving-gauge) density contrast per species,
     Delta_i = delta_i - 3 (Hp/k) v_i  (the gauge shift alpha = theta_c/k^2
     applied to the conformal-Newtonian variables; matches CAMB's
     synchronous delta on all scales, and the Newtonian delta sub-horizon),
     then  Delta_m = (Om_c Delta_c + Om_b Delta_b) / (Om_c + Om_b).
  3. P(k, 0) = (2 pi^2 / k^3) As (k/kp)^(ns-1) (Delta_m / zeta)^2 with the
     same curvature normalization zeta_unit the Cls path uses.
  4. Beyond k_graft (~0.55/Mpc, where Silk damping has erased the wiggles
     to <~0.5% and the explicit-RK4 CFL cost grows linearly in k), the
     tail continues along the EH98 'eisenhu_osc' shape scaled to match the
     solved spectrum over a window below k_graft -- continuity is exact,
     and the tail broadband carries EH98's ~1% accuracy where no
     engine-specific feature survives.

Serving (class BoltzEngine) is then exactly parallel to the 'medium' tier
philosophy: the SHAPE is frozen at the construction cosmology (like a CAMB
engine instance, reference cosmology.py:138-211 -- rebuild the engine to
move shape parameters), while As, ns (exact analytic rescale/retilt),
as8, the growth history D(z) (closed-form or w0/wa ODE), and the EH99
massive-neutrino response all follow the TRACED background -- so jitted
pipelines and Fisher derivatives in those parameters work unchanged.

Accuracy expectations (tests/test_boltz_engine.py pins each): wiggle
phases consistent with the integrated drag-epoch sound horizon (the
feature the EH tier cannot deliver -- its r_s comes from the EH98 fitting
form, ~1-2% off the integral), broadband within a few % of the EH98
envelope, sigma8 within 2% of the EH tier, sub-% convergence in the
solver grid.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..params import merge_params
from . import background as bgmod
from .recomb import recombination
from . import boltzlite as bz
from .linear_power import plin_approx, _mnu_maybe_active, TabulatedEngine
from .transfer import eh99_neutrino_ratio

__all__ = ["matter_power_z0", "BoltzEngine"]


def default_k_grid(kmax: float = 0.65, kmin: float = 5e-5,
                   k_bao_lo: float = 0.015, dk_bao: float = 0.005,
                   nk_log: int = 24):
    """Solver k-grid: log-spaced below the wiggle band, linear (BAO-
    resolving, >= 8 nodes per 2pi/r_s period at the default dk) through
    it."""
    k_lo = np.geomspace(kmin, k_bao_lo, nk_log, endpoint=False)
    k_bao = np.arange(k_bao_lo, kmax, dk_bao)
    return np.concatenate([k_lo, k_bao, [kmax]])


def matter_power_z0(params=None, ks=None, kmax: float = 0.65,
                    zre: float = 7.7, n_c_inner: int | None = None,
                    solver_opts: dict | None = None,
                    massive_nu: bool = False, component: str = "total"):
    """Linear matter power P(k, z=0) in Mpc^3 from the hierarchy solve.

    Returns (ks, P0) as numpy arrays.  ``ks`` defaults to
    default_k_grid(kmax); ``n_c_inner`` defaults to the CFL-stable count
    for the grid's kmax (boltzlite.segment_c_inner_steps -- the measured
    stability edge, not the naive estimate).

    massive_nu=True solves with the exact Fermi-Dirac neutrino
    background + the (delta, v) fluid (boltzlite round-4 extension) and
    includes its free-streaming suppression natively; ``component``
    then picks 'total' (cb + nu, CAMB delta_tot convention) or 'cb'
    (cold matter only, what halo-model sigma/nu wants at mnu > 0).
    """
    p = merge_params(params or {})
    bg = bgmod.background(p)
    rec = recombination(bg, zre=zre)
    ctx = bz.make_ctx(bg, rec, massive_nu=massive_nu)
    if ks is None:
        ks = default_k_grid(kmax)
    ks = np.asarray(ks, dtype=np.float64)
    if n_c_inner is None:
        n_c_inner = bz.segment_c_inner_steps(float(ks[-1]), float(p["H0"]))
    sol = bz.solve_perturbations(ctx, jnp.asarray(ks),
                                 n_c_inner=n_c_inner,
                                 **(solver_opts or {}))
    s_end = sol.states[:, -1, :]          # stored state at x = ln a = 0
    hp0 = bz._hp(ctx, jnp.asarray(0.0))   # conformal Hubble today [1/Mpc]
    ksj = jnp.asarray(ks)
    # comoving-gauge (CDM-frame) density contrasts: the gauge shift
    # delta -> delta + 3 Hp theta/k^2 with theta = -k v in these variables
    dc = s_end[:, bz._I_DC] - 3.0 * (hp0 / ksj) * s_end[:, bz._I_VC]
    db = s_end[:, bz._I_DB] - 3.0 * (hp0 / ksj) * s_end[:, bz._I_VB]
    num = ctx.omc * dc + ctx.omb * db
    den = ctx.omc + ctx.omb
    if massive_nu and component == "total" and float(ctx.omnm0) > 0:
        dn = s_end[:, bz._I_NM] - 3.0 * (hp0 / ksj) * s_end[:, bz._I_NM + 1]
        num = num + ctx.omnm0 * dn
        den = den + ctx.omnm0
    dm = num / den
    tm = dm / sol.zeta_unit
    p0 = (2.0 * np.pi**2 / ksj**3
          * bg.As * (ksj / bg.pivot_scalar) ** (bg.ns - 1.0) * tm**2)
    return ks, np.asarray(p0)


def rs_drag_integral(params=None, zre: float = 7.7, rec=None, bg=None):
    """Drag-epoch sound horizon r_s(z_drag) in Mpc, INTEGRATED from the
    recombination history (not the EH98 fitting form of
    distances_ext.rs_drag_eh):

        r_s = int_0^{eta_d} c_s deta,   c_s = 1/sqrt(3 (1 + R)),
        R = (3 omega_b / 4 omega_gamma) a,

    with the drag epoch defined by unit baryon drag depth
    tau_d(eta_d) = int (-dtau/dx)/R dx = 1 (Hu & Sugiyama 1996).
    Returns (r_s [Mpc], z_drag).  This is the scale whose inverse sets
    the BAO wiggle spacing of the 'boltz' engine -- the parity anchor
    tests/test_boltz_engine.py pins.
    """
    if bg is None:
        p = merge_params(params or {})
        bg = bgmod.background(p)
    if rec is None:
        rec = recombination(bg, zre=zre)
    xs = np.asarray(rec.xs)
    a = np.exp(xs)
    omg_h2 = 2.47282e-5 * (float(bg.T_cmb_k) / 2.7255) ** 4
    R = 0.75 * float(bg.ombh2) / omg_h2 * a
    cs = 1.0 / np.sqrt(3.0 * (1.0 + R))
    eta = np.asarray(rec.eta)
    taux = np.asarray(rec.tau_x)           # d tau/dx, negative
    # drag depth from today back: tau_d(x) = int_x^0 (-tau_x)/R dx'
    integ = -taux / R
    dx = xs[1] - xs[0]
    rev = 0.5 * (integ[1:] + integ[:-1]) * dx
    taud = np.concatenate([np.cumsum(rev[::-1])[::-1], [0.0]])
    # x_d where taud crosses 1 (taud decreasing in x)
    x_d = float(np.interp(-1.0, -taud, xs))
    z_drag = 1.0 / np.exp(x_d) - 1.0
    # r_s(x) = int cs deta (trapz on the nonuniform eta spacing)
    deta = np.diff(eta)
    rs_cum = np.concatenate([[0.0],
                             np.cumsum(0.5 * (cs[1:] + cs[:-1]) * deta)])
    rs = float(np.interp(x_d, xs, rs_cum))
    return rs, z_drag


# table cache: the transfer SHAPE does not depend on As/ns (they rescale
# analytically at serve time), so the key holds only shape/background/
# recombination parameters plus the grid config
_TABLE_CACHE: dict = {}


def _shape_key(p, kmax, zre, n_c_inner, ks, massive_nu="eh99"):
    # pivot_scalar is in the key because the cache-hit rescale
    # (ks/pivot0)**(ns-ns0) is exact only for a shared pivot (ADVICE r4)
    vals = tuple(float(p[k]) for k in
                 ("omch2", "ombh2", "H0", "omk", "w0", "wa", "mnu",
                  "T_CMB", "Yp", "nnu", "pivot_scalar")
                 if k in p)
    kk = None if ks is None else tuple(np.asarray(ks).tolist())
    return vals + (float(kmax), float(zre), n_c_inner, kk, massive_nu)


class BoltzEngine:
    """Linear-power engine backed by the boltzlite hierarchy.

    Construction runs the solve (host-side, cached per shape-cosmology);
    ``plin``/``pzk_grid`` then serve P(k,z) = P0(k) (D(z)/D(0))^2 with
    exact As/ns/as8 rescaling from the traced background -- fully
    jit/grad-compatible.  The reference analogue is a CAMB engine
    instance pinned at ctor (cosmology.py:138-179).
    """

    name = "boltz"

    def __init__(self, params=None, kmax: float = 0.65,
                 k_graft: float = 0.55, k_table_max: float = 2100.0,
                 zre: float = 7.7, ks=None, n_c_inner: int | None = None,
                 massive_nu: str = "eh99", component: str = "total"):
        """massive_nu: how mnu > 0 enters the served spectrum --
        'eh99' (default): massless hierarchy solve + the EH99
        free-streaming response applied at serve time from the TRACED
        background (responds to traced mnu, Fisher-safe); 'fluid': the
        boltzlite massive-nu fluid solves the suppression natively
        (engine-grade shape, mnu then PINNED at the init value like the
        other shape parameters; ``component`` picks delta_tot vs
        delta_cb)."""
        if massive_nu not in ("eh99", "fluid"):
            raise ValueError(massive_nu)
        p = merge_params(params or {})
        bg = bgmod.background(p)
        self._mnu_in_table = (massive_nu == "fluid")
        key = _shape_key(p, kmax, zre, n_c_inner, ks,
                         massive_nu + ":" + component)
        if key in _TABLE_CACHE:
            ks_b, p0_b, As0, ns0, pivot0 = _TABLE_CACHE[key]
            # rescale the cached table to THIS cosmology's As/ns (exact)
            p0_b = (p0_b * float(bg.As) / As0
                    * (ks_b / pivot0) ** (float(bg.ns) - ns0))
        else:
            ks_b, p0_b = matter_power_z0(
                p, ks=ks, kmax=kmax, zre=zre, n_c_inner=n_c_inner,
                massive_nu=self._mnu_in_table, component=component)
            _TABLE_CACHE[key] = (ks_b, p0_b, float(bg.As), float(bg.ns),
                                 float(bg.pivot_scalar))

        # EH98 'eisenhu_osc' continuation beyond k_graft, ratio-matched
        # over the last few wiggle-free nodes below k_graft
        sel_lo = ks_b <= k_graft
        win = (ks_b > 0.85 * k_graft) & sel_lo
        ks_hi = np.geomspace(k_graft, k_table_max, 200)[1:]
        ks_eh = np.concatenate([ks_b[win], ks_hi])
        p_eh = np.asarray(plin_approx(bg, jnp.asarray([0.0]),
                                      jnp.asarray(ks_eh)))[0]
        ratio = float(np.mean(p0_b[win] / p_eh[:win.sum()]))
        ks_full = np.concatenate([ks_b[sel_lo], ks_hi])
        p_full = np.concatenate([p0_b[sel_lo],
                                 p_eh[win.sum():] * ratio])

        self.ks_t = ks_full
        self.p0_t = p_full
        self._lnk = np.log(ks_full)
        self._lnp = np.log(p_full)
        self._slope = np.gradient(self._lnp, self._lnk)
        self._As0 = float(bg.As)
        self._ns0 = float(bg.ns)
        self._pivot0 = float(bg.pivot_scalar)
        self._graft_ratio = ratio
        self.params = p

    def _lnp0(self, lks):
        """Cubic-Hermite (Catmull-Rom slopes) interpolation of ln P0 in
        ln k; linear (= power-law in k) extrapolation outside the table."""
        lkt = jnp.asarray(self._lnk)
        ik = jnp.clip(jnp.searchsorted(lkt, lks) - 1, 0, lkt.size - 2)
        h = lkt[ik + 1] - lkt[ik]
        t = (lks - lkt[ik]) / h
        inside = (lks >= lkt[0]) & (lks <= lkt[-1])
        return TabulatedEngine._hermite_axis(
            jnp.asarray(self._lnp), jnp.asarray(self._slope),
            lkt, ik, t, h, inside)

    def plin(self, bg, zs, ks, accuracy: str = "medium",
             growth_mode: str = "closed", component: str = "total"):
        if accuracy == "low":
            return plin_approx(bg, zs, ks, growth_mode=growth_mode,
                               component=component)
        zs = jnp.atleast_1d(jnp.asarray(zs))
        ks = jnp.asarray(ks)
        lks = jnp.log(ks)
        p0 = jnp.exp(self._lnp0(lks))
        # exact amplitude/tilt response to the traced As, ns
        amp = (bg.As / self._As0) * jnp.exp(
            (bg.ns - self._ns0) * (lks - np.log(self._pivot0)))
        a = 1.0 / (1.0 + zs)
        dz0 = bgmod.d_growth(bg, a, norm="z0norm", mode=growth_mode)
        pzk = p0[None, :] * amp[None, :] * dz0[:, None] ** 2
        if _mnu_maybe_active(bg.omnu0) and not self._mnu_in_table:
            # serve-time EH99 free-streaming response (skipped when the
            # fluid solve already built the suppression into the table)
            dz = bgmod.d_growth(bg, a, norm="anorm", mode=growth_mode)
            pzk = pzk * eh99_neutrino_ratio(bg, ks, dz,
                                            component=component) ** 2
        return bg.as8**2 * pzk

    def pzk_grid(self, bg, zs, ks, nonlinear: bool = False,
                 growth_mode: str = "closed"):
        if nonlinear:
            raise NotImplementedError(
                "BoltzEngine has no nonlinear power; use the halofit "
                "module or a table")
        return self.plin(bg, zs, ks, accuracy="high",
                         growth_mode=growth_mode)
