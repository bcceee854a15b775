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
import jax.numpy as jnp

from ..utils.weights import simpson_weights
from ..ops.special import Wkr
from . import background as bgmod
from .transfer import transfer_eh98

CSPEED_KMS = 299792.458


def plin_approx(bg, zs, ks, kind: str = "eisenhu_osc"):
    """Fully analytic linear P(k,z) in Mpc^3 (reference: cosmology.py:391-402).

    P = [8 pi^2 As c^4 / (25 (omm H0^2)^2)] (k/kp)^(ns-1) k D(z)^2 T(k)^2
    """
    zs = jnp.atleast_1d(jnp.asarray(zs))
    ks = jnp.asarray(ks)
    tk = transfer_eh98(bg, ks, kind)[None, :]
    a = 1.0 / (1.0 + zs)
    dz = bgmod.d_growth(bg, a, norm="anorm")[:, None]
    # omm*H0^2 including massive neutrinos (ref cosmology.py:399)
    omh2 = (bg.omch2 + bg.ombh2) * 100.0**2 + bg.omnu0 * bg.H0**2
    kfacts = (ks / bg.pivot_scalar) ** (bg.ns - 1.0) * ks
    # host-folded constant first, then traced factors: keeps device
    # intermediates mid-range (TPU double-single f64, see background.py)
    pref = bg.As * (8.0 * np.pi**2 * CSPEED_KMS**4 / 25.0) / omh2**2
    return pref * kfacts[None, :] * dz**2 * tk**2


class EHEngine:
    """Engine-free analytic linear power (the default here: no CAMB/CLASS
    exists in this environment, and the EH tier is the reference's own
    accuracy='low' mode, cosmology.py:98-99)."""

    name = "eh"

    def plin(self, bg, zs, ks, accuracy: str = "medium"):
        p = plin_approx(bg, zs, ks)
        if accuracy != "low":
            p = bg.as8**2 * p  # as8 knob applies on engine-normalized tiers
        return p

    def pzk_grid(self, bg, zs, ks, nonlinear: bool = False):
        if nonlinear:
            raise NotImplementedError(
                "EHEngine has no nonlinear power; use halofit module or a table")
        return bg.as8**2 * plin_approx(bg, zs, ks)


class TabulatedEngine:
    """P(z,k) from a host-side table (CAMB/CLASS parity path).

    ``zs_t, ks_t, p_t`` define the table; interpolation is bilinear in
    (z, ln k) of ln P -- the same spline family the reference builds via
    camb.get_matter_power_interpolator (cosmology.py:772-809), with
    power-law extrapolation beyond the table kmax.
    """

    name = "tabulated"

    def __init__(self, zs_t, ks_t, p_t, p_nl_t=None):
        self.zs_t = np.asarray(zs_t, dtype=np.float64)
        self.ks_t = np.asarray(ks_t, dtype=np.float64)
        self.logp_t = np.log(np.asarray(p_t, dtype=np.float64))
        self.logp_nl_t = (np.log(np.asarray(p_nl_t, dtype=np.float64))
                          if p_nl_t is not None else None)

    def _interp(self, logp_t, zs, ks):
        zs = jnp.atleast_1d(jnp.asarray(zs))
        lks = jnp.log(jnp.asarray(ks))
        zt = jnp.asarray(self.zs_t)
        lkt = jnp.asarray(np.log(self.ks_t))
        tab = jnp.asarray(logp_t)

        # indices along z
        iz = jnp.clip(jnp.searchsorted(zt, zs) - 1, 0, zt.size - 2)
        tz = jnp.where(zt.size > 1,
                       (zs - zt[iz]) / (zt[iz + 1] - zt[iz] + 1e-300), 0.0)
        # indices along ln k (linear extrapolation both ends = power law in P)
        ik = jnp.clip(jnp.searchsorted(lkt, lks) - 1, 0, lkt.size - 2)
        tk = (lks - lkt[ik]) / (lkt[ik + 1] - lkt[ik])

        p00 = tab[iz[:, None], ik[None, :]]
        p01 = tab[iz[:, None], ik[None, :] + 1]
        p10 = tab[iz[:, None] + 1, ik[None, :]]
        p11 = tab[iz[:, None] + 1, ik[None, :] + 1]
        pz0 = p00 * (1 - tk)[None, :] + p01 * tk[None, :]
        pz1 = p10 * (1 - tk)[None, :] + p11 * tk[None, :]
        return jnp.exp(pz0 * (1 - tz)[:, None] + pz1 * tz[:, None])

    def plin(self, bg, zs, ks, accuracy: str = "medium"):
        if accuracy == "high":
            return bg.as8**2 * self._interp(self.logp_t, zs, ks)
        if accuracy == "low":
            return plin_approx(bg, zs, ks)
        # 'medium': EH shape, table normalization at knorm (ref :353-374)
        knorm = 1e-4
        ks = jnp.asarray(ks)
        tk = transfer_eh98(bg, ks, "eisenhu_osc")
        pnorm = self._interp(self.logp_t, zs, jnp.asarray([knorm]))  # (nz,1)
        tnorm = transfer_eh98(bg, jnp.asarray([knorm]), "eisenhu_osc") * knorm**bg.ns
        plin = (pnorm / tnorm) * (tk**2 * ks**bg.ns)[None, :]
        return bg.as8**2 * plin

    def pzk_grid(self, bg, zs, ks, nonlinear: bool = False):
        tab = self.logp_nl_t if nonlinear else self.logp_t
        if tab is None:
            raise ValueError("No nonlinear table provided")
        return bg.as8**2 * self._interp(tab, zs, ks)


def make_engine(engine="eh", pk_table=None):
    if isinstance(engine, (EHEngine, TabulatedEngine)):
        return engine
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


def sigma2_R(bg, R_m, zs, spzk, ks_sigma2, taylor_switch=0.01):
    """sigma^2(z, m) = int dk k^2 P(z,k) W^2(k R_m) / (2 pi^2).

    ``R_m``: (nm,) Lagrangian radii; ``spzk``: (nz, nks) linear power on the
    sigma^2 grid; ``ks_sigma2``: static numpy grid.  One matmul:
    (nz, nk) @ (nk, nm).  Reference: cosmology.py:245-269.
    """
    ks_np = np.asarray(ks_sigma2)
    ks = jnp.asarray(ks_np)
    # k^2 w / 2pi^2 folded host-side (static grid)
    kw = jnp.asarray(simpson_weights(ks_np) * ks_np**2 / (2.0 * np.pi**2))
    W2 = Wkr(ks[None, :], jnp.asarray(R_m)[:, None], taylor_switch) ** 2  # (nm, nk)
    lhs = spzk * kw[None, :]                                             # (nz, nk)
    return lhs @ W2.T
