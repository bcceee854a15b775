"""Linear matter power: engine abstraction + sigma^2(R,z) pipeline.

The reference abstracts CAMB vs CLASS behind one interface
(hmvec/cosmology.py:17-25) and offers three accuracy tiers for P_lin
(cosmology.py:353-402):

  'high'   -> engine P(z,k) spline            (P_lin_slow, :376)
  'medium' -> EH shape normalized to engine P at knorm=1e-4  (P_lin, :353)
  'low'    -> fully analytic EH x growth       (P_lin_approx, :391)

Here the engines are:

  * EHEngine        -- engine-free analytic Eisenstein-Hu power (all tiers
                       coincide by construction, since the analytic
                       normalization equals the analytic shape at knorm).
  * TabulatedEngine -- a host-provided P(z,k) table (e.g. precomputed by
                       CAMB offline); 'high' interpolates the table, and
                       'medium' normalizes the EH shape to it, matching the
                       reference's CAMB path semantics.

sigma^2(R,z) (reference: cosmology.py:245-269) is one (z,k)@(k,m) matmul
with static Simpson weights -- MXU-friendly instead of a 20x200x10000
broadcast integrand.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.weights import simpson_weights
from ..ops.special import Wkr
from . import background as bgmod
from .transfer import transfer_eh98, eh99_neutrino_ratio

CSPEED_KMS = 299792.458


def _mnu_maybe_active(omnu0) -> bool:
    """Trace-time decision: does this build need the EH99 neutrino ratio?

    A traced omnu0 (any jitted path taking bg as an argument) may carry
    mnu > 0 at runtime, so the ratio is compiled in (it gates itself to
    exactly 1.0 when f_nu <= 1e-7, keeping the mnu = 0 output bit-exact);
    a concrete zero skips it entirely.
    """
    if isinstance(omnu0, jax.core.Tracer):
        return True
    return float(np.asarray(omnu0)) > 0.0


def plin_approx(bg, zs, ks, kind: str = "eisenhu_osc",
                growth_mode: str = "closed", component: str = "total",
                fast_f32: bool = False):
    """Fully analytic linear P(k,z) in Mpc^3 (reference: cosmology.py:391-402).

    P = [8 pi^2 As c^4 / (25 (omm H0^2)^2)] (k/kp)^(ns-1) k D(z)^2 T(k)^2

    growth_mode: 'closed' (Heath/2F1, LCDM-exact) or 'ode' (general w0/wa;
    see background.growth_table).  Decide host-side via
    background.growth_mode_for(params).

    Massive neutrinos: when mnu > 0 (or traced), the EH99 free-streaming
    suppression ratio multiplies the EH98 spectrum (transfer.
    eh99_neutrino_ratio) -- the engine-free analogue of the reference
    passing mnu to CAMB (cosmology.py:167); exact pass-through at mnu = 0.
    """
    zs = jnp.atleast_1d(jnp.asarray(zs))
    ks = jnp.asarray(ks)
    # serving-tier fast path (fast_f32): the per-k transcendental chain
    # (EH98 transfer + tilt powers + EH99 ratio) runs in f32 -- native
    # VPU speed instead of TPU-emulated f64 -- while the z-factors
    # (growth) and the final assembly stay f64.  ~1e-6-class on P;
    # gated against the f64 twin in tests/test_fast_sampling.py.
    cd = jnp.float32 if fast_f32 else None
    ksc = ks.astype(cd) if cd is not None else ks
    tk = transfer_eh98(bg, ks, kind, compute_dtype=cd)[None, :]
    a = 1.0 / (1.0 + zs)
    dz = bgmod.d_growth(bg, a, norm="anorm", mode=growth_mode)[:, None]
    # omm*H0^2 including massive neutrinos (ref cosmology.py:399)
    omh2 = (bg.omch2 + bg.ombh2) * 100.0**2 + bg.omnu0 * bg.H0**2
    kfacts = (ksc / (bg.pivot_scalar.astype(cd) if cd else bg.pivot_scalar)
              ) ** ((bg.ns.astype(cd) if cd else bg.ns) - 1.0) * ksc
    # host-folded constant first, then traced factors: keeps device
    # intermediates mid-range (TPU double-single f64, see background.py)
    pref = bg.As * (8.0 * np.pi**2 * CSPEED_KMS**4 / 25.0) / omh2**2
    p = pref * kfacts[None, :] * dz**2 * tk**2
    if _mnu_maybe_active(bg.omnu0):
        if cd is not None:
            bgc = jax.tree_util.tree_map(
                lambda v: jnp.asarray(v).astype(cd), bg)
            ratio = eh99_neutrino_ratio(bgc, ksc, dz[:, 0].astype(cd),
                                        component=component)
        else:
            ratio = eh99_neutrino_ratio(bg, ks, dz[:, 0],
                                        component=component)
        p = p * ratio ** 2
    return p


class EHEngine:
    """Engine-free analytic linear power (the default here: no CAMB/CLASS
    exists in this environment, and the EH tier is the reference's own
    accuracy='low' mode, cosmology.py:98-99)."""

    name = "eh"
    supports_fast_f32 = True   # pipeline serving tier may request the
    #                            f32 per-k transcendental chain

    def plin(self, bg, zs, ks, accuracy: str = "medium",
             growth_mode: str = "closed", component: str = "total",
             fast_f32: bool = False):
        p = plin_approx(bg, zs, ks, growth_mode=growth_mode,
                        component=component, fast_f32=fast_f32)
        if accuracy != "low":
            p = bg.as8**2 * p  # as8 knob applies on engine-normalized tiers
        return p

    def pzk_grid(self, bg, zs, ks, nonlinear: bool = False,
                 growth_mode: str = "closed", fast_f32: bool = False):
        if nonlinear:
            raise NotImplementedError(
                "EHEngine has no nonlinear power; use halofit module or a table")
        return bg.as8**2 * plin_approx(bg, zs, ks, growth_mode=growth_mode,
                                       fast_f32=fast_f32)


def _hermite_weights(t):
    """Cubic-Hermite basis (h00, h10, h01, h11) at fraction t."""
    t2 = t * t
    t3 = t2 * t
    return (2 * t3 - 3 * t2 + 1, t3 - 2 * t2 + t,
            -2 * t3 + 3 * t2, t3 - t2)


class TabulatedEngine:
    """P(z,k) from a host-side table (CAMB/CLASS parity path).

    ``zs_t, ks_t, p_t`` define the table; interpolation is tensor-product
    cubic Hermite (Catmull-Rom node slopes, precomputed host-side) of
    ln P in (z, ln k) -- matching the bicubic-spline semantics of the
    interpolator the reference builds via
    camb.get_matter_power_interpolator (cosmology.py:772-809,
    utils.py:53-182) to ~1e-5 on CAMB-shaped grids
    (tests/test_tabulated_semantics.py pins the measured bound), with
    LINEAR extrapolation of ln P beyond the table edges (= power law in k,
    the reference's extrap_kmax behaviour; the reference's raw spline
    extrapolates cubically, which diverges).
    """

    name = "tabulated"

    def __init__(self, zs_t, ks_t, p_t, p_nl_t=None):
        self.zs_t = np.asarray(zs_t, dtype=np.float64)
        self.ks_t = np.asarray(ks_t, dtype=np.float64)
        self.lkt = np.log(self.ks_t)
        self.logp_t = np.log(np.asarray(p_t, dtype=np.float64))
        self.logp_nl_t = (np.log(np.asarray(p_nl_t, dtype=np.float64))
                          if p_nl_t is not None else None)
        # Catmull-Rom node slopes (np.gradient: 2nd-order central,
        # one-sided at the edges) -- host-side statics
        self._slopes = {id(self.logp_t): self._make_slopes(self.logp_t)}
        if self.logp_nl_t is not None:
            self._slopes[id(self.logp_nl_t)] = self._make_slopes(
                self.logp_nl_t)

    def _make_slopes(self, tab):
        mk = np.gradient(tab, self.lkt, axis=1)
        if self.zs_t.size > 1:
            mz = np.gradient(tab, self.zs_t, axis=0)
            mzk = np.gradient(mz, self.lkt, axis=1)
        else:
            mz = np.zeros_like(tab)
            mzk = np.zeros_like(tab)
        return mk, mz, mzk

    @staticmethod
    def _hermite_axis(y, m, x_nodes, iq, tq, h, inside):
        """Hermite along the LAST axis of y (slopes m) at intervals iq,
        fraction tq, width h; linear from the clamped interval's left node
        outside the node range."""
        y0 = y[..., iq]
        y1 = y[..., iq + 1]
        m0 = m[..., iq]
        m1 = m[..., iq + 1]
        h00, h10, h01, h11 = _hermite_weights(tq)
        val = h00 * y0 + h10 * h * m0 + h01 * y1 + h11 * h * m1
        lin = jnp.where(tq < 0.5, y0 + tq * h * m0,
                        y1 + (tq - 1.0) * h * m1)
        return jnp.where(inside, val, lin)

    def _interp(self, logp_t, zs, ks):
        zs = jnp.atleast_1d(jnp.asarray(zs))
        lks = jnp.log(jnp.asarray(ks))
        zt = jnp.asarray(self.zs_t)
        lkt = jnp.asarray(self.lkt)
        tab = jnp.asarray(logp_t)
        mk_t, mz_t, mzk_t = (jnp.asarray(a) for a in
                             self._slopes[id(logp_t)])

        # ---- pass 1: cubic Hermite along ln k (values and z-slopes) ----
        ik = jnp.clip(jnp.searchsorted(lkt, lks) - 1, 0, lkt.size - 2)
        hk = lkt[ik + 1] - lkt[ik]
        tk = (lks - lkt[ik]) / hk
        in_k = (lks >= lkt[0]) & (lks <= lkt[-1])
        val_k = self._hermite_axis(tab, mk_t, lkt, ik, tk, hk, in_k)
        if zt.size == 1:
            return jnp.exp(jnp.broadcast_to(val_k[0], (zs.size, lks.size)))
        mz_k = self._hermite_axis(mz_t, mzk_t, lkt, ik, tk, hk, in_k)

        # ---- pass 2: cubic Hermite along z ----
        iz = jnp.clip(jnp.searchsorted(zt, zs) - 1, 0, zt.size - 2)
        hz = zt[iz + 1] - zt[iz]
        tz = (zs - zt[iz]) / hz
        in_z = (zs >= zt[0]) & (zs <= zt[-1])
        y0 = val_k[iz]
        y1 = val_k[iz + 1]
        m0 = mz_k[iz]
        m1 = mz_k[iz + 1]
        h00, h10, h01, h11 = (w[:, None] for w in _hermite_weights(tz))
        out = (h00 * y0 + h10 * hz[:, None] * m0
               + h01 * y1 + h11 * hz[:, None] * m1)
        lin = jnp.where(tz[:, None] < 0.5,
                        y0 + (tz * hz)[:, None] * m0,
                        y1 + ((tz - 1.0) * hz)[:, None] * m1)
        return jnp.exp(jnp.where(in_z[:, None], out, lin))

    def plin(self, bg, zs, ks, accuracy: str = "medium",
             growth_mode: str = "closed"):
        if accuracy == "high":
            return bg.as8**2 * self._interp(self.logp_t, zs, ks)
        if accuracy == "low":
            return plin_approx(bg, zs, ks, growth_mode=growth_mode)
        # 'medium': EH shape, table normalization at knorm (ref :353-374)
        knorm = 1e-4
        ks = jnp.asarray(ks)
        tk = transfer_eh98(bg, ks, "eisenhu_osc")
        pnorm = self._interp(self.logp_t, zs, jnp.asarray([knorm]))  # (nz,1)
        tnorm = transfer_eh98(bg, jnp.asarray([knorm]), "eisenhu_osc") * knorm**bg.ns
        plin = (pnorm / tnorm) * (tk**2 * ks**bg.ns)[None, :]
        return bg.as8**2 * plin

    def pzk_grid(self, bg, zs, ks, nonlinear: bool = False,
                 growth_mode: str = "closed"):
        del growth_mode  # table carries its own growth
        tab = self.logp_nl_t if nonlinear else self.logp_t
        if tab is None:
            raise ValueError("No nonlinear table provided")
        return bg.as8**2 * self._interp(tab, zs, ks)


def make_engine(engine="eh", pk_table=None, params=None, engine_opts=None):
    if not isinstance(engine, str):
        # an already-constructed engine object (EHEngine, TabulatedEngine,
        # BoltzEngine, or any duck-typed plin/pzk_grid provider)
        return engine
    if engine == "boltz":
        # engine-grade linear P(k,z) from the boltzlite hierarchy solve
        # (the reference's default tier is a Boltzmann P_lin,
        # cosmology.py:376,:784-786); shape pinned at `params`
        from .boltz_engine import BoltzEngine
        return BoltzEngine(params, **(engine_opts or {}))
    if engine in ("eh", "camb", "class"):
        # 'camb'/'class' accepted for API compatibility: they resolve to a
        # table if one is supplied, else the analytic engine.
        if pk_table is not None:
            return TabulatedEngine(*pk_table)
        return EHEngine()
    raise ValueError(f"Unknown engine {engine!r}")


def sigma2_k_grid(params):
    return np.geomspace(params["sigma2_kmin"], params["sigma2_kmax"],
                        params["sigma2_numks"])


def _mixed32_matmul(a64, b64):
    """(... , K) @ (K, M) double-single matmul: hi/lo f32 split, 3 true-f32
    MXU passes, f64 combination.  The TPU's emulated-f64 dot_general runs
    at ~21 GMAC/s AND (batched) materializes an expanded [8, ..., K, M]
    f32 temp (9.8 GB for the B=128 sigma^2 contraction -- an HBM OOM);
    this form stays MXU-shaped at any batch.  Accuracy: products exact to
    ~2^-48, f32 tree accumulation ~1e-7 relative on positive-term sums
    (measured; same recipe as ops/sine_transform._sine_dft_mixed)."""
    ah = a64.astype(jnp.float32)
    al = (a64 - ah.astype(jnp.float64)).astype(jnp.float32)
    bh = b64.astype(jnp.float32)
    bl = (b64 - bh.astype(jnp.float64)).astype(jnp.float32)

    def mm(x, y):
        return jax.lax.dot_general(
            x, y, dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)

    return (mm(ah, bh).astype(jnp.float64)
            + (mm(ah, bl) + mm(al, bh)).astype(jnp.float64))


def sigma2_R(bg, R_m, zs, spzk, ks_sigma2, taylor_switch=0.01,
             matmul: str = "f64"):
    """sigma^2(z, m) = int dk k^2 P(z,k) W^2(k R_m) / (2 pi^2).

    ``R_m``: (nm,) Lagrangian radii; ``spzk``: (nz, nks) linear power on the
    sigma^2 grid; ``ks_sigma2``: static numpy grid.  One matmul:
    (nz, nk) @ (nk, nm).  Reference: cosmology.py:245-269.

    matmul='mixed32': the double-single f32 MXU contraction (the fast /
    batch-serving tier -- ~1e-7 relative on sigma^2, amplified to at most
    a few 1e-6 on the mass-function tail, inside the 1e-5 twin gate;
    keep 'f64' for the exact tiers).
    """
    ks_np = np.asarray(ks_sigma2)
    ks = jnp.asarray(ks_np)
    # k^2 w / 2pi^2 folded host-side (static grid)
    kw = jnp.asarray(simpson_weights(ks_np) * ks_np**2 / (2.0 * np.pi**2))
    W2 = Wkr(ks[None, :], jnp.asarray(R_m)[:, None], taylor_switch) ** 2  # (nm, nk)
    lhs = spzk * kw[None, :]                                             # (nz, nk)
    if matmul == "mixed32":
        return _mixed32_matmul(lhs, W2.T)
    return lhs @ W2.T
