"""Lensed CMB spectra: first-order flat-sky lensing convolution.

The reference gets lensed Cls from CAMB ('total',
/root/reference/hmvec/cosmology.py:67-81).  Engine-free, this module
lenses unlensed scalar spectra with a lensing-potential spectrum using
the lowest-order-in-C_phiphi flat-sky result (Hu 2000, Lewis &
Challinor 2006 review eqs. 4.12-4.20):

    Ctilde_l^TT = (1 - l^2 R) C_l^TT + T_1[C^TT],
    Ctilde_l^EE = (1 - l^2 R) C_l^EE + T_cos2[C^EE],
    Ctilde_l^BB =                      T_sin2[C^EE],
    Ctilde_l^TE = (1 - l^2 R) C_l^TE + T_cos[C^TE],

    T_w[X](l) = (1/(2pi)^2) int d^2l' [l'.(l-l')]^2 C_phiphi(|l-l'|)
                X(l') w(2 phi_{l'l}),
    R = <|grad phi|^2>/2 = (1/4pi) int dl l^3 C_phiphi.

Accuracy: O((l^2 C_gl)^2) terms are dropped -- percent-level on TT/EE
through l ~ 2000 and the standard white-noise lensed-BB plateau at low
l; consistent with the boltzlite few-percent tier.  The convolution is
evaluated at ~O(100) l-nodes (dense (l', phi) grids, vmapped -- MXU/VPU
friendly) and the smooth correction is splined onto all integer l.

TPU note: everything inside `_lens_corrections` is jit-compatible
(static shapes, lax.map over nodes); the spline assembly is host-side
numpy like the rest of the Cls table plumbing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .boltzlite import default_l_nodes


def _clpp_interp(clpp):
    """Linear interpolant of q(s) = s^4 C_phiphi(s) (the smooth combo);
    returns a closure s -> C_phiphi(s), zero outside [2, lmax_pp]."""
    lmax_pp = clpp.shape[0] - 1
    s_grid = jnp.arange(lmax_pp + 1, dtype=jnp.float64)
    q_grid = s_grid**4 * clpp

    def cpp(s):
        q = jnp.interp(s, s_grid, q_grid, left=0.0, right=0.0)
        s4 = jnp.maximum(s, 2.0) ** 4
        return jnp.where((s >= 2.0) & (s <= lmax_pp), q / s4, 0.0)

    return cpp


def _lens_corrections(l_nodes, cl_tt, cl_ee, cl_te, clpp, n_phi: int = 256):
    """Convolution terms T_w at the nodes; returns (tt, ee, bb, te) arrays.

    cl_* are full integer-l arrays (index = l); the l' integral is the
    exact sum over integer l' >= 2 with the phi integral by trapezoid.
    """
    lmax_in = cl_tt.shape[0] - 1
    lp = jnp.arange(2.0, lmax_in + 1.0)               # (nlp,)
    phi = jnp.linspace(0.0, jnp.pi, n_phi)            # (nphi,)
    wphi = jnp.full((n_phi,), jnp.pi / (n_phi - 1)).at[0].mul(0.5) \
        .at[-1].mul(0.5) * 2.0                        # symmetric doubling
    cosphi = jnp.cos(phi)
    cos2 = jnp.cos(2.0 * phi)
    cpp = _clpp_interp(jnp.asarray(clpp))

    ctt = jnp.asarray(cl_tt)[2:]
    cee = jnp.asarray(cl_ee)[2:]
    cte = jnp.asarray(cl_te)[2:]

    def one_node(l):
        # (nlp, nphi) geometry
        dot = l * lp[:, None] * cosphi[None, :] - lp[:, None] ** 2
        s = jnp.sqrt(jnp.maximum(
            l**2 + lp[:, None] ** 2
            - 2.0 * l * lp[:, None] * cosphi[None, :], 0.0))
        kern = dot**2 * cpp(s)                        # (nlp, nphi)
        base = kern @ wphi                            # (nlp,) int dphi
        base2 = (kern * cos2[None, :]) @ wphi
        base2sq = (kern * cos2[None, :] ** 2) @ wphi
        pref = lp / (2.0 * jnp.pi) ** 2
        t_tt = jnp.sum(pref * ctt * base)
        t_te = jnp.sum(pref * cte * base2)
        t_ee = jnp.sum(pref * cee * base2sq)
        t_bb = jnp.sum(pref * cee * (base - base2sq))  # sin^2 = 1 - cos^2
        return t_tt, t_ee, t_bb, t_te

    return jax.lax.map(one_node, jnp.asarray(l_nodes, dtype=jnp.float64))


def lens_cls_flat_sky(cl_unlensed, clpp, lmax_out: int | None = None,
                      n_phi: int = 256):
    """Lensed (lmax_out+1, 4) [TT, EE, BB, TE] from unlensed scalar Cls.

    cl_unlensed: (lmax_in+1, 4) raw C_l (muK^2), BB column ignored.
    clpp: (lmax_pp+1,) raw C_phiphi (NOT the [l(l+1)]^2/2pi convention).
    lmax_out defaults to lmax_in; must allow enough headroom lmax_in -
    lmax_out for the convolution support (C_phiphi falls ~l^-4, so a few
    hundred is plenty).
    """
    cl_unlensed = np.asarray(cl_unlensed, dtype=np.float64)
    clpp = np.asarray(clpp, dtype=np.float64)
    lmax_in = cl_unlensed.shape[0] - 1
    if lmax_out is None:
        lmax_out = lmax_in
    ells = np.arange(lmax_out + 1, dtype=np.float64)

    # R = (1/4pi) int dl l^3 C_pp (integer-l sum)
    lpp = np.arange(clpp.shape[0], dtype=np.float64)
    r_tot = float(np.sum(lpp**3 * clpp)) / (4.0 * np.pi)

    l_nodes = default_l_nodes(lmax_out).astype(np.float64)
    t_tt, t_ee, t_bb, t_te = (np.asarray(a) for a in _lens_corrections(
        l_nodes, cl_unlensed[:, 0], cl_unlensed[:, 1], cl_unlensed[:, 3],
        clpp, n_phi=n_phi))

    # spline the smooth convolution terms onto all l; the (1 - l^2 R)
    # part uses the exact unlensed C_l at every integer l
    from scipy.interpolate import CubicSpline

    def to_all(t_nodes):
        out = np.zeros(lmax_out + 1)
        out[2:] = CubicSpline(np.log(l_nodes), t_nodes)(np.log(ells[2:]))
        return out

    out = np.zeros((lmax_out + 1, 4))
    damp = 1.0 - ells**2 * r_tot
    out[:, 0] = damp * cl_unlensed[:lmax_out + 1, 0] + to_all(t_tt)
    out[:, 1] = damp * cl_unlensed[:lmax_out + 1, 1] + to_all(t_ee)
    out[:, 2] = to_all(t_bb)
    out[:, 3] = damp * cl_unlensed[:lmax_out + 1, 3] + to_all(t_te)
    out[:2] = 0.0
    return out
