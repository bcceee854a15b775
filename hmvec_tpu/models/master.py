"""Pseudo-C_l (MASTER) mode-coupling for masked survey spectra.

EXTENSION beyond the reference (whose covariance layer is the fsky-scaled
Knox formula only, hmvec/cov.py:33-63): on a cut sky the measured
("pseudo") spectrum is a linear mixing of the true one,

    <C~_l1> = sum_l2 M_{l1 l2}[W] C_l2,

with M set by the mask power spectrum W_l (Hivon et al. 2002; the
spin-2 generalization of Kogut et al. / the NaMaster matrices).  This
module builds the exact coupling matrices for every spin pairing used by
the package's spectra (TT/gg/yy; TE/g-shear; EE/BB shear), couples and
decouples binned bandpowers, and provides an analytic azimuthal-cap mask
for self-contained use (no map libraries needed).

TPU-first design — quadrature, not 3j recursions: using

    int_{-1}^{1} d^{l1}_{m1 n1} d^{l2}_{m2 n2} d^{l3}_{m3 n3} dx
        = 2 (l1 l2 l3; m1 m2 m3)(l1 l2 l3; n1 n2 n3),

every Sum_l3 (2l3+1) W_l3 (3j)(3j) collapses to a single x-integral of
the mask correlation function xi_W(x) = Sum_l3 (2l3+1)/(4pi) W_l3 P_l3(x)
against a product of two Wigner-d functions:

    M^{mn}_{l1 l2} = (2 l2 + 1) * 1/2 int dx xi_W(x) d^{l1}_{mn} d^{l2}_{mn}.

The integrand is a polynomial of degree <= 2 lmax + lmax_mask, so
Gauss-Legendre with Q >= (2 lmax + lmax_mask)/2 + 1 nodes is EXACT (to
f64 roundoff), and the whole matrix is one (L,Q) x (Q,L) matmul against
the d-tables built by the `lax.scan` recurrence in models/shear.py — an
MXU contraction instead of NaMaster's per-row C 3j recursions.  The
parity-split spin-2 matrices come from the d_{2,2}/d_{2,-2} pair via
(3j; -2,2,0) = (-1)^{l1+l2+l3} (3j; 2,-2,0):

    M^{++/--}_{l1 l2} = (2l2+1)/4 int dx xi_W [d22 d22 +/- d2m2 d2m2],

with C~_EE = M^{++} C_EE + M^{--} C_BB (and B <-> E symmetrically);
M^{02} (TE-like) uses the d_{20} pair.

Oracle: the exact sympy Wigner-3j at low lmax pins all four matrices at
~1e-13 (tests/test_master.py), plus full-sky identity (M = I), row-sum
-> fsky, quadrature-doubling invariance, and a bin/decouple round trip.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .shear import wigner_d_rows


def _gl_nodes(lmax, lmax_mask, dtype=np.float64):
    """Host-side Gauss-Legendre nodes/weights exact for the coupling
    integrand (degree 2*lmax + lmax_mask)."""
    q = (2 * int(lmax) + int(lmax_mask)) // 2 + 1
    from ..utils.weights import leggauss_cached
    xs, ws = leggauss_cached(q)
    return jnp.asarray(xs.astype(dtype)), jnp.asarray(ws.astype(dtype))


def mask_correlation(mask_cl, xs):
    """xi_W(x) = sum_l3 (2l3+1)/(4pi) W_l3 P_l3(x) at the nodes."""
    mask_cl = jnp.asarray(mask_cl)
    lmax_mask = mask_cl.shape[0] - 1
    P = wigner_d_rows(lmax_mask, xs, (0, 0))           # (l3, Q)
    l3 = jnp.arange(lmax_mask + 1, dtype=mask_cl.dtype)
    return ((2.0 * l3 + 1.0) / (4.0 * jnp.pi) * mask_cl) @ P


def coupling_matrix(lmax, mask_cl, spins=(0, 0)):
    """Mode-coupling matrix/matrices on l = 0..lmax for one spin pairing.

    spins=(0,0):  returns M^{00}  (TT / gg / yy / kappa-kappa)
    spins=(0,2):  returns M^{02}  (TE / galaxy x shear-E)
    spins=(2,2):  returns {'++': M_EExEE (=BBxBB), '--': M_EExBB}

    All satisfy <C~_l1> = sum_l2 M_{l1 l2} C_l2 with the (2l2+1)
    convention of Hivon et al. 2002 (so the full-sky mask W_l =
    4 pi delta_{l0} gives M = identity).
    """
    mask_cl = jnp.asarray(mask_cl)
    xs, ws = _gl_nodes(lmax, mask_cl.shape[0] - 1, dtype=np.float64)
    xi = mask_correlation(mask_cl, xs)
    twol2p1 = 2.0 * jnp.arange(lmax + 1, dtype=xi.dtype) + 1.0
    wxi = ws * xi                                       # (Q,)

    def quad(mn):
        D = wigner_d_rows(lmax, xs, mn)                 # (l, Q)
        # (2l2+1)/2 * sum_q w_q xi_q D[l1,q] D[l2,q]
        return 0.5 * (D * wxi[None, :]) @ D.T * twol2p1[None, :]

    s = tuple(sorted(abs(int(v)) for v in spins))
    if s == (0, 0):
        return quad((0, 0))
    if s == (0, 2):
        return quad((2, 0))
    if s == (2, 2):
        A = quad((2, 2))
        B = quad((2, -2))
        return {"++": 0.5 * (A + B), "--": 0.5 * (A - B)}
    raise ValueError(f"unsupported spin pairing {spins}; use (0,0), "
                     f"(0,2) or (2,2)")


def couple_cls(M, cls):
    """Pseudo-spectrum C~ = M @ C (spin-0/cross), or the (EE, BB) pair
    mixing for M = {'++','--'} with cls = (cl_ee, cl_bb)."""
    if isinstance(M, dict):
        cl_ee, cl_bb = cls
        return (M["++"] @ jnp.asarray(cl_ee) + M["--"] @ jnp.asarray(cl_bb),
                M["++"] @ jnp.asarray(cl_bb) + M["--"] @ jnp.asarray(cl_ee))
    return M @ jnp.asarray(cls)


def bin_operator(lmax, edges, weights=None):
    """(B, P): bandpower binning and piecewise-constant interpolation
    operators (Hivon et al. 2002 eqs. 20-21 with flat weights by default,
    or w_l proportional to weights within each band).

    B: (nb, lmax+1) averages C_l into bands [edges[i], edges[i+1]);
    P: (lmax+1, nb) spreads bandpowers back to per-l (B @ P = I).
    """
    edges = np.asarray(edges, dtype=np.int64)
    ls = np.arange(lmax + 1)
    w = np.ones(lmax + 1) if weights is None else np.asarray(weights, float)
    nb = edges.size - 1
    B = np.zeros((nb, lmax + 1))
    P = np.zeros((lmax + 1, nb))
    for i in range(nb):
        sel = (ls >= edges[i]) & (ls < edges[i + 1])
        wi = w * sel
        B[i] = wi / wi.sum()
        P[sel, i] = 1.0
    return jnp.asarray(B), jnp.asarray(P)


def decouple_bandpowers(M, pseudo_cl, lmax, edges, weights=None):
    """MASTER-decoupled bandpowers: solve (B M P) c_b = B C~.

    Exact inverse of :func:`couple_cls` for spectra that are piecewise
    constant over the bands; the standard unbiased bandpower estimator
    otherwise.  M may be the spin-2 dict (then pseudo_cl = (EE~, BB~)
    and a coupled 2-block system is solved).
    """
    B, P = bin_operator(lmax, edges, weights)
    if isinstance(M, dict):
        mpp = B @ M["++"] @ P
        mmm = B @ M["--"] @ P
        nb = mpp.shape[0]
        big = jnp.block([[mpp, mmm], [mmm, mpp]])
        rhs = jnp.concatenate([B @ jnp.asarray(pseudo_cl[0]),
                               B @ jnp.asarray(pseudo_cl[1])])
        sol = jnp.linalg.solve(big, rhs)
        return sol[:nb], sol[nb:]
    return jnp.linalg.solve(B @ M @ P, B @ jnp.asarray(pseudo_cl))


def coupling_kernel_xi(lmax, mask_cl):
    """Xi_{l1 l2} = sum_l3 (2l3+1)/(4pi) W_l3 (l1 l2 l3; 0 0 0)^2 —
    the coupling matrix without the (2l2+1) factor (symmetric); the
    per-mode kernel of the NKA Gaussian covariance."""
    mask_cl = jnp.asarray(mask_cl)
    xs, ws = _gl_nodes(lmax, mask_cl.shape[0] - 1, dtype=np.float64)
    xi = mask_correlation(mask_cl, xs)
    D = wigner_d_rows(lmax, xs, (0, 0))
    return 0.5 * (D * (ws * xi)[None, :]) @ D.T


def gaussian_covariance_nka(lmax, mask_sq_cl, cl13, cl24, cl14, cl23):
    """Mode-coupled Gaussian covariance of two masked pseudo-spectra,

        Cov(C~^{12}_l, C~^{34}_l') ~= Xi_{ll'}[W_{w^2}]
            x ( C13_l C24_l' + C13_l' C24_l
              + C14_l C23_l' + C14_l' C23_l ) / 2,

    the narrow-kernel approximation (Efstathiou 2004; the same shape
    NaMaster's gaussian_covariance uses) for four fields sharing one
    mask w.  ``mask_sq_cl`` is the power spectrum of w^2 (equal to the
    mask's own W_l for a binary mask).  The input spectra must include
    noise.  Full-sky limit: Xi = delta_{ll'}/(2l+1), recovering Knox
    exactly.  This is the covariance OF THE COUPLED pseudo-spectra;
    propagate through :func:`decouple_bandpowers`'s linear map (see
    :func:`decoupled_covariance`) for bandpower errors.  EXTENSION
    beyond the reference's fsky-Knox covariance (cov.py:33-63).
    """
    Xi = coupling_kernel_xi(lmax, mask_sq_cl)
    cl13 = jnp.asarray(cl13)
    cl24 = jnp.asarray(cl24)
    cl14 = jnp.asarray(cl14)
    cl23 = jnp.asarray(cl23)
    sym = 0.5 * (cl13[:, None] * cl24[None, :] + cl13[None, :] * cl24[:, None]
                 + cl14[:, None] * cl23[None, :]
                 + cl14[None, :] * cl23[:, None])
    return Xi * sym


def decoupled_covariance(M, cov, lmax, edges, weights=None):
    """Propagate a pseudo-C_l covariance through the binned MASTER
    decoupling: K = (B M P)^{-1} B, returns K cov K^T (nb, nb)."""
    B, P = bin_operator(lmax, edges, weights)
    K = jnp.linalg.solve(B @ M @ P, B)
    return K @ jnp.asarray(cov) @ K.T


def cap_mask_cl(lmax, theta_cap_rad):
    """Mask power spectrum W_l of an azimuthal polar cap (mask = 1 for
    theta < theta_cap, else 0), in closed form:

        a_l0 = sqrt(pi (2l+1)) I_l,  I_l = int_c^1 P_l dx
             = (P_{l-1}(c) - P_{l+1}(c)) / (2l+1)   [l >= 1],
        W_l = |a_l0|^2 / (2l+1) = pi I_l^2,

    with c = cos(theta_cap).  Satisfies the binary-mask identity
    sum_l (2l+1) W_l / (4 pi) = fsky = (1-c)/2 as lmax -> infinity.
    """
    c = float(np.cos(theta_cap_rad))
    # P_0..P_{lmax+1}(c) by the stable upward Legendre recurrence
    P = np.zeros(lmax + 2)
    P[0] = 1.0
    if lmax + 1 >= 1:
        P[1] = c
    for l in range(1, lmax + 1):
        P[l + 1] = ((2 * l + 1) * c * P[l] - l * P[l - 1]) / (l + 1)
    ls = np.arange(lmax + 1)
    I = np.empty(lmax + 1)
    I[0] = 1.0 - c
    I[1:] = (P[:lmax] - P[2:lmax + 2]) / (2.0 * ls[1:] + 1.0)
    return jnp.asarray(np.pi * I**2)
