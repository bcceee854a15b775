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

Serving (class BoltzEngine) is z-RESOLVED: P(k,z) = P0(k) D^2(z) R^2(k,z)
where the residual R comes from the solved trajectory's own z-slices
(states are stored along the line of sight anyway -- the 2-D serving the
reference gets from CAMB's matter-power interpolator, cosmology.py:784-786
served through utils.py:53-182).  As, ns (exact analytic rescale/retilt),
as8, the growth history D(z) (closed-form or w0/wa ODE), and the EH99
massive-neutrino response all follow the TRACED background -- so jitted
pipelines and Fisher derivatives in those parameters work unchanged; with
``shape_response=True`` the table itself also carries a first-order
response to the traced (omch2, ombh2, H0) from cached +-h re-solves, so
engine-grade Fisher in the shape parameters works too.

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

__all__ = ["matter_power_z0", "matter_power_slices", "BoltzEngine"]


def default_k_grid(kmax: float = 0.65, kmin: float = 5e-5,
                   k_bao_lo: float = 0.015, dk_bao: float = 0.005,
                   nk_log: int = 24):
    """Solver k-grid: log-spaced below the wiggle band, linear (BAO-
    resolving, >= 8 nodes per 2pi/r_s period at the default dk) through
    it."""
    k_lo = np.geomspace(kmin, k_bao_lo, nk_log, endpoint=False)
    k_bao = np.arange(k_bao_lo, kmax, dk_bao)
    return np.concatenate([k_lo, k_bao, [kmax]])


def matter_power_slices(params=None, ks=None, zs=(0.0,), kmax: float = 0.65,
                        zre: float = 7.7, n_c_inner: int | None = None,
                        solver_opts: dict | None = None,
                        massive_nu: bool = False, component: str = "total"):
    """Linear matter power P(k, z_j) in Mpc^3 at several redshifts from
    ONE hierarchy solve.

    The solver already stores the full trajectory -- ``states`` has
    shape (nk, nx, NSTATE) on the LOS x-grid (boltzlite segment B every
    n_b_inner steps through recombination, segment C every n_c_inner
    steps from z ~ 147 to 0) -- so z-resolved spectra cost nothing
    beyond the z=0 column this function used to read.  This is the
    rebuild's analogue of the reference's 2-D matter-power interpolator
    source, CAMB's P(k, z) evaluated per redshift from the Boltzmann
    solve (/root/reference/hmvec/cosmology.py:784-786) rather than a
    separable P0(k) D^2(z).

    Returns (ks, P) as numpy arrays with P of shape (nz, nk).  ``ks``
    defaults to default_k_grid(kmax); ``n_c_inner`` defaults to the
    CFL-stable count for the grid's kmax
    (boltzlite.segment_c_inner_steps -- the measured stability edge,
    not the naive estimate).

    massive_nu=True solves with the exact Fermi-Dirac neutrino
    background + the (delta, v) fluid (boltzlite round-4 extension) and
    includes its free-streaming suppression natively -- z-resolved, so
    the suppression EVOLVES along the trajectory; ``component`` then
    picks 'total' (cb + nu, CAMB delta_tot convention) or 'cb' (cold
    matter only, what halo-model sigma/nu wants at mnu > 0).
    """
    p = merge_params(params or {})
    bg = bgmod.background(p)
    fd = bool(massive_nu) and float(np.asarray(bg.omnu0)) > 0.0
    rec = recombination(bg, zre=zre, massive_nu=fd)
    ctx = bz.make_ctx(bg, rec, massive_nu=massive_nu)
    if ks is None:
        ks = default_k_grid(kmax)
    ks = np.asarray(ks, dtype=np.float64)
    if n_c_inner is None:
        n_c_inner = bz.segment_c_inner_steps(float(ks[-1]), float(p["H0"]))
    sol = bz.solve_perturbations(ctx, jnp.asarray(ks),
                                 n_c_inner=n_c_inner,
                                 **(solver_opts or {}))
    zs = np.atleast_1d(np.asarray(zs, dtype=np.float64))
    xw = -np.log1p(zs)
    xs = np.asarray(sol.xs)
    if xw.min() < xs[0]:
        raise ValueError(
            f"requested z={float(zs.max()):g} is earlier than the stored "
            f"trajectory (z <= {float(np.expm1(-xs[0])):g})")
    # conformal Hubble on the stored grid (vmap: the FD neutrino
    # quadrature inside _hp reduces over its own node axis)
    hp = jax.vmap(lambda x: bz._hp(ctx, x))(sol.xs)
    st = sol.states                       # (nk, nx, NSTATE)
    ksj = jnp.asarray(ks)
    gau = 3.0 * (hp[None, :] / ksj[:, None])   # (nk, nx) gauge shift
    # comoving-gauge (CDM-frame) density contrasts: the gauge shift
    # delta -> delta + 3 Hp theta/k^2 with theta = -k v in these variables
    dc = st[..., bz._I_DC] - gau * st[..., bz._I_VC]
    db = st[..., bz._I_DB] - gau * st[..., bz._I_VB]
    num = ctx.omc * dc + ctx.omb * db
    den = ctx.omc + ctx.omb
    if massive_nu and component == "total" and float(ctx.omnm0) > 0:
        dn = st[..., bz._I_NM] - gau * st[..., bz._I_NM + 1]
        num = num + ctx.omnm0 * dn
        den = den + ctx.omnm0
    dm = num / den                        # (nk, nx) growing-mode history
    # read the requested slices off the trajectory: ln|Delta_m| is
    # smooth (~ x in the matter era) and the segment-C spacing is
    # ~1.3e-3 in x, so linear interpolation is far below solver error;
    # x = 0 is exactly the last stored node (bit-identical z=0 column)
    lndm = jnp.log(jnp.abs(dm))
    xwj = jnp.asarray(xw)
    lnd = jax.vmap(lambda row: jnp.interp(xwj, sol.xs, row))(lndm)  # (nk,nz)
    tm = jnp.exp(lnd) / sol.zeta_unit
    pzk = (2.0 * np.pi**2 / ksj[:, None]**3
           * bg.As * (ksj[:, None] / bg.pivot_scalar) ** (bg.ns - 1.0)
           * tm**2)
    return ks, np.asarray(pzk).T          # (nz, nk)


def matter_power_z0(params=None, ks=None, kmax: float = 0.65,
                    zre: float = 7.7, n_c_inner: int | None = None,
                    solver_opts: dict | None = None,
                    massive_nu: bool = False, component: str = "total"):
    """Linear matter power P(k, z=0) -- the z=0 row of
    matter_power_slices (kept as the round-4 API)."""
    ks, pzk = matter_power_slices(
        params, ks=ks, zs=(0.0,), kmax=kmax, zre=zre,
        n_c_inner=n_c_inner, solver_opts=solver_opts,
        massive_nu=massive_nu, component=component)
    return ks, pzk[0]


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

# z-slices stored per table: the engine-grade z-resolved serving
# interpolates the growth-normalized residual between these (log(1+z)
# spaced; z=0 first by construction)
DEFAULT_Z_SLICES = (0.0, 0.5, 1.0, 2.0, 3.0, 5.0, 8.0, 12.0, 20.0)


def _shape_key(p, kmax, zre, n_c_inner, ks, massive_nu="eh99",
               z_slices=DEFAULT_Z_SLICES):
    # pivot_scalar is in the key because the cache-hit rescale
    # (ks/pivot0)**(ns-ns0) is exact only for a shared pivot (ADVICE r4)
    vals = tuple(float(p[k]) for k in
                 ("omch2", "ombh2", "H0", "omk", "w0", "wa", "mnu",
                  "T_CMB", "Yp", "nnu", "pivot_scalar")
                 if k in p)
    kk = None if ks is None else tuple(np.asarray(ks).tolist())
    return vals + (float(kmax), float(zre), n_c_inner, kk, massive_nu,
                   tuple(float(z) for z in z_slices))


def _solved_slices(p, kmax, zre, ks, n_c_inner, massive_nu, component,
                   z_slices, solver_opts=None):
    """Cached hierarchy solve -> (ks_b, p_sl (nzs, nk), As0, ns0, pivot0).

    The cache stores the RAW slices at the solve cosmology's As/ns; the
    caller rescales (exact -- amplitude/tilt are k-wise factors shared
    by every z row, so the z-residual is invariant under the rescale).
    """
    so = tuple(sorted((solver_opts or {}).items()))
    key = _shape_key(p, kmax, zre, n_c_inner, ks,
                     massive_nu + ":" + component, z_slices) + (so,)
    if key not in _TABLE_CACHE:
        ks_b, p_sl = matter_power_slices(
            p, ks=ks, zs=z_slices, kmax=kmax, zre=zre,
            n_c_inner=n_c_inner, massive_nu=(massive_nu == "fluid"),
            component=component, solver_opts=solver_opts)
        bg = bgmod.background(p)
        _TABLE_CACHE[key] = (ks_b, p_sl, float(bg.As), float(bg.ns),
                             float(bg.pivot_scalar))
    return _TABLE_CACHE[key]


def _graft_eh_tail(bg, ks_b, p0_b, k_graft, k_table_max):
    """EH98 'eisenhu_osc' continuation beyond k_graft, ratio-matched
    over the last few wiggle-free nodes below k_graft.
    Returns (ks_full, p_full, graft_ratio)."""
    sel_lo = ks_b <= k_graft
    win = (ks_b > 0.85 * k_graft) & sel_lo
    ks_hi = np.geomspace(k_graft, k_table_max, 200)[1:]
    ks_eh = np.concatenate([ks_b[win], ks_hi])
    p_eh = np.asarray(plin_approx(bg, jnp.asarray([0.0]),
                                  jnp.asarray(ks_eh)))[0]
    ratio = float(np.mean(p0_b[win] / p_eh[:win.sum()]))
    ks_full = np.concatenate([ks_b[sel_lo], ks_hi])
    p_full = np.concatenate([p0_b[sel_lo], p_eh[win.sum():] * ratio])
    return ks_full, p_full, ratio


# central-difference steps for the shape-response sensitivities (~2%
# relative: small enough for clean first-order response, large enough
# that solver noise -- deterministic, smooth -- is irrelevant)
SHAPE_STEPS = {"omch2": 0.0024, "ombh2": 0.00045, "H0": 1.3}


class BoltzEngine:
    """Linear-power engine backed by the boltzlite hierarchy.

    Construction runs the solve (host-side, cached per shape-cosmology);
    ``plin``/``pzk_grid`` then serve

        P(k, z) = P0(k) (D(z)/D(0))^2 R(k, z)^2

    with exact As/ns/as8 rescaling from the traced background -- fully
    jit/grad-compatible.  The reference analogue is a CAMB engine
    instance pinned at ctor (cosmology.py:138-179) serving CAMB's 2-D
    matter-power interpolator (cosmology.py:784-786).

    R(k, z) is the z-resolved residual (``z_resolved=True``, default):
    the solved trajectory's growth-normalized departure from separable
    D^2(z) scaling, interpolated in (ln k, ln(1+z)) between the stored
    slices -- radiation-era scale dependence at high z (~1% spread in k
    by z=20 at the fiducial), and in ``massive_nu='fluid'`` mode the
    free-streaming suppression EVOLVING with z instead of being frozen
    at its z=0 shape.  R is held flat outside the solved k-range and
    beyond the last stored slice; R(k, 0) = 1 exactly, so z=0 serving
    is identical to the separable mode.

    ``shape_response=True`` additionally makes the table respond to the
    TRACED (omch2, ombh2, H0): the ctor runs cached +-h re-solves
    (SHAPE_STEPS central differences, 6 extra host solves, each cached
    like the primal) and serving adds the first-order ln-P Taylor term,
    so ``jax.jacfwd``/``jacrev`` through ``engine='boltz'`` return the
    engine-grade shape derivative instead of silently differentiating
    only the growth/amplitude factors -- the Fisher use case the
    reference's staged re-derivation design targets
    (/root/reference/hmvec/hmvec.py:50-64).
    """

    name = "boltz"

    def __init__(self, params=None, kmax: float = 0.65,
                 k_graft: float = 0.55, k_table_max: float = 2100.0,
                 zre: float = 7.7, ks=None, n_c_inner: int | None = None,
                 massive_nu: str = "eh99", component: str = "total",
                 z_slices=DEFAULT_Z_SLICES, z_resolved: bool = True,
                 shape_response: bool = False, shape_steps=None,
                 solver_opts: dict | None = None):
        """massive_nu: how mnu > 0 enters the served spectrum --
        'eh99' (default): massless hierarchy solve + the EH99
        free-streaming response applied at serve time from the TRACED
        background (responds to traced mnu, Fisher-safe); 'fluid': the
        boltzlite massive-nu fluid solves the suppression natively
        (engine-grade z-EVOLVING shape; mnu then PINNED at the init
        value like the other shape parameters; ``component`` picks
        delta_tot vs delta_cb)."""
        if massive_nu not in ("eh99", "fluid"):
            raise ValueError(massive_nu)
        p = merge_params(params or {})
        bg = bgmod.background(p)
        self._mnu_in_table = (massive_nu == "fluid")
        z_slices = tuple(float(z) for z in z_slices)
        if z_slices[0] != 0.0:
            raise ValueError("z_slices must start at 0")
        ks_b, p_sl, As0, ns0, pivot0 = _solved_slices(
            p, kmax, zre, ks, n_c_inner, massive_nu, component, z_slices,
            solver_opts)
        # rescale the cached rows to THIS cosmology's As/ns (exact; the
        # rescale is a pure k-factor so the z-residual is untouched)
        p_sl = (p_sl * float(bg.As) / As0
                * (ks_b / pivot0) ** (float(bg.ns) - ns0))
        p0_b = p_sl[0]

        ks_full, p_full, ratio = _graft_eh_tail(bg, ks_b, p0_b,
                                                k_graft, k_table_max)

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
        self._bg0 = bg
        # z-resolved residual: solved ln sqrt(P_j/P_0) per slice (raw
        # solver output; divided by the serve-mode growth lazily)
        self.z_slices = z_slices
        self._z_resolved = bool(z_resolved) and len(z_slices) > 1
        self._lnk_b = np.log(ks_b)
        self._lnratio = 0.5 * np.log(p_sl / p_sl[0])   # (nzs, nk_b)
        self._u_slices = np.log1p(np.asarray(z_slices))
        self._resid_cache: dict = {}
        # differentiable shape response (cached central differences)
        self._sens = None
        if shape_response:
            steps = dict(SHAPE_STEPS, **(shape_steps or {}))
            if isinstance(shape_response, (tuple, list)):
                steps = {n: steps[n] for n in shape_response}
            self._theta0 = {n: float(p[n]) for n in steps}
            self._sens = {}
            for nm, h in steps.items():
                tabs = []
                for sgn in (+1.0, -1.0):
                    pp = dict(p)
                    pp[nm] = float(p[nm]) + sgn * h
                    ks2, psl2, As2, ns2, piv2 = _solved_slices(
                        pp, kmax, zre, ks, n_c_inner, massive_nu,
                        component, z_slices, solver_opts)
                    bg2 = bgmod.background(merge_params(pp))
                    p02 = (psl2[0] * float(bg.As) / As2
                           * (ks2 / piv2) ** (float(bg.ns) - ns2))
                    _, pf2, _ = _graft_eh_tail(bg2, ks2, p02,
                                               k_graft, k_table_max)
                    tabs.append(np.log(pf2))
                self._sens[nm] = (tabs[0] - tabs[1]) / (2.0 * h)

    def _resid(self, mode: str):
        """ln R table (nzs, nk_b): solved slice ratios divided by the
        serve-mode growth factor AT THE CTOR COSMOLOGY (fiducial-fixed,
        so traced-growth Fisher derivatives stay intact)."""
        if mode not in self._resid_cache:
            a = 1.0 / (1.0 + np.asarray(self.z_slices))
            d = np.asarray(bgmod.d_growth(self._bg0, jnp.asarray(a),
                                          norm="z0norm", mode=mode))
            lnr = self._lnratio - np.log(d)[:, None]
            lnr[0] = 0.0                  # exact by construction
            self._resid_cache[mode] = lnr
        return self._resid_cache[mode]

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
        lnp0 = self._lnp0(lks)
        if self._sens is not None:
            # first-order ln-P response of the TABLE to the traced
            # shape parameters (exact jacfwd = the cached central
            # difference; also corrects small finite shifts)
            bgv = {"omch2": bg.omch2, "ombh2": bg.ombh2, "H0": bg.H0}
            for nm, tab in self._sens.items():
                lnp0 = lnp0 + (bgv[nm] - self._theta0[nm]) * jnp.interp(
                    lks, jnp.asarray(self._lnk), jnp.asarray(tab))
        p0 = jnp.exp(lnp0)
        # exact amplitude/tilt response to the traced As, ns
        amp = (bg.As / self._As0) * jnp.exp(
            (bg.ns - self._ns0) * (lks - np.log(self._pivot0)))
        a = 1.0 / (1.0 + zs)
        dz0 = bgmod.d_growth(bg, a, norm="z0norm", mode=growth_mode)
        pzk = p0[None, :] * amp[None, :] * dz0[:, None] ** 2
        if self._z_resolved:
            # growth-normalized residual of the solved trajectory:
            # bilinear in (ln(1+z), ln k), flat beyond the table edges
            lnr_t = jnp.asarray(self._resid(growth_mode))
            lnk_b = jnp.asarray(self._lnk_b)
            rows = jax.vmap(lambda row: jnp.interp(lks, lnk_b, row))(
                lnr_t)                                   # (nzs, nk)
            us = jnp.asarray(self._u_slices)
            u = jnp.log1p(zs)
            iu = jnp.clip(jnp.searchsorted(us, u) - 1, 0, us.size - 2)
            t = jnp.clip((u - us[iu]) / (us[iu + 1] - us[iu]), 0.0, 1.0)
            lnr = rows[iu] * (1.0 - t[:, None]) + rows[iu + 1] * t[:, None]
            pzk = pzk * jnp.exp(2.0 * lnr)
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
