"""Gaussian (Knox) bandpower covariances (reference: hmvec/cov.py).

The reference's trailing free function KnoxCov is truncated mid-body
(cov.py:65-88); here the class covers both use cases and `knox_cov` is a
complete standalone implementation.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..utils.weights import trapz_weights
from ..ops.quadrature import gradient


def angular_correlation(ells, cls, thetas_rad):
    """w(theta) = sum_l (2l+1)/(4pi) C_l P_l(cos theta).

    ells: (nl,) consecutive integer multipoles starting at any l0 >= 0;
    cls: (..., nl); thetas_rad: (nt,).  Returns (..., nt).  EXTENSION
    beyond the reference (which exposes only harmonic-space spectra):
    the standard curved-sky Legendre sum, evaluated by the upward
    three-term recurrence as one lax.scan over l (P_l for all thetas is
    O(nl nt), no special functions).  Pinned against scipy
    eval_legendre in tests/test_cov_lensing.py.

    Implementation: the (m, n) = (0, 0) Wigner small-d matrices ARE the
    Legendre polynomials, so this delegates to the generic spin-weighted
    scan in models/shear.py rather than carrying a second copy of the
    same recurrence.
    """
    from .shear import wigner_d_sum
    return wigner_d_sum(ells, cls, thetas_rad, mn=(0, 0))


def bin_annuli(ells, cls, bin_edges):
    """ell-weighted bandpower binning (reference cov.py:11-14)."""
    ells = jnp.asarray(ells)
    cls = jnp.asarray(cls)
    edges = np.asarray(bin_edges)
    nb = edges.size - 1
    idx = jnp.clip(jnp.searchsorted(jnp.asarray(edges), ells, side="right") - 1,
                   0, nb - 1)
    # scipy.binned_statistic includes the right edge in the last bin
    in_range = (ells >= edges[0]) & (ells <= edges[-1])
    w = jnp.where(in_range, ells, 0.0)
    numer = jnp.zeros(nb).at[idx].add(jnp.where(in_range, ells * cls, 0.0))
    denom = jnp.zeros(nb).at[idx].add(w)
    return numer / denom


def shot_noise(ngal):
    """Galaxy shot noise for ngal per arcmin^2 (cov.py:19-20)."""
    return 1.0 / (ngal * 1.18e7)


def lensing_shape_noise(ngal, shape_noise=0.3):
    """(cov.py:22-23)"""
    return shape_noise**2 / 2.0 / shot_noise(ngal)


def get_avail_cls(acls, x, y):
    """Order-insensitive lookup of the 'x_y' spectrum in a cls dict,
    0 if absent (reference cov.py:25-31 -- whose reversed-key fallback
    references an out-of-scope ``self`` and always falls through to 0;
    here the same dict is searched both ways as intended)."""
    if x + "_" + y in acls:
        return acls[x + "_" + y]
    return acls.get(y + "_" + x, 0)


class GaussianCov:
    """Registry of binned Cls + noise; Knox-formula covariance
    (reference cov.py:33-63)."""

    def __init__(self, bin_edges):
        self.cls = {}
        self.nls = {}
        ellmin, ellmax = bin_edges[0], bin_edges[-1]
        self.ells = np.arange(ellmin, ellmax + 1, 1)
        self.bin_edges = np.asarray(bin_edges)
        self.dls = np.diff(self.bin_edges)
        self.ls = (self.bin_edges[1:] + self.bin_edges[:-1]) / 2.0

    def add_cls(self, name1, name2, ells, cls, ellsn=None, ncls=None):
        assert "_" not in name1 and "_" not in name2
        assert name2 + "_" + name1 not in self.cls
        fine = jnp.interp(jnp.asarray(self.ells, dtype=jnp.float64),
                          jnp.asarray(ells, dtype=jnp.float64),
                          jnp.asarray(cls))
        self.cls[name1 + "_" + name2] = bin_annuli(self.ells, fine,
                                                   self.bin_edges)
        if ellsn is not None and ncls is not None:
            finen = jnp.interp(jnp.asarray(self.ells, dtype=jnp.float64),
                               jnp.asarray(ellsn, dtype=jnp.float64),
                               jnp.asarray(ncls))
            self.nls[name1 + "_" + name2] = bin_annuli(self.ells, finen,
                                                       self.bin_edges)

    def _lookup(self, registry, x, y):
        if x + "_" + y in registry:
            return registry[x + "_" + y]
        if y + "_" + x in registry:
            return registry[y + "_" + x]
        return 0.0

    def get_scls(self, x, y):
        return self._lookup(self.cls, x, y)

    def get_ncls(self, x, y):
        return self._lookup(self.nls, x, y)

    def get_tcls(self, x, y):
        return self.get_scls(x, y) + self.get_ncls(x, y)

    def get_cov(self, x, y, w, z, fsky):
        """cov(C^xy_b, C^wz_b) = (C_xw C_yz + C_xz C_yw)/((2l+1) dl fsky)."""
        clsum = (self.get_tcls(x, w) * self.get_tcls(y, z)
                 + self.get_tcls(x, z) * self.get_tcls(y, w))
        return clsum / (2.0 * self.ls + 1.0) / self.dls / fsky


def knox_cov(cl_xw, cl_yz, cl_xz, cl_yw, ell_mids, delta_ells, fsky):
    """Standalone Knox formula on already-binned total spectra (completes
    the reference's truncated KnoxCov, cov.py:65-88)."""
    clsum = cl_xw * cl_yz + cl_xz * cl_yw
    return clsum / (2.0 * jnp.asarray(ell_mids) + 1.0) \
        / jnp.asarray(delta_ells) / fsky


# ---------------------------------------------------------------------------
# P(k) covariance: Gaussian + 1-halo trispectrum + super-sample terms.
# EXTENSION beyond the reference (whose cov.py covers only bandpower C_l
# Knox errors): the standard survey-volume covariance of band-averaged
# power-spectrum estimates, in the halo-model language this package
# already speaks (n(z,m) grids, u(k|z,m) profiles, linear P).  Forms follow
# Takada & Hu 2013 (PRD 87, 123504)-style mode counting and response.
# ---------------------------------------------------------------------------

def pk_cov_gaussian(ks, pk_tot, volume_mpc3, dks=None):
    """Diagonal Gaussian covariance of shell-averaged P(k) in a volume V.

    cov_ii = 2 P(k_i)^2 / N_i with N_i = V k_i^2 dk_i / (2 pi^2) Fourier
    modes in the shell.  ``pk_tot`` (..., nk) should include shot noise if
    applicable; broadcasts over leading axes.  Returns (..., nk, nk).
    """
    ks = jnp.asarray(ks)
    pk_tot = jnp.asarray(pk_tot)
    if dks is None:
        dks = jnp.gradient(ks)
    nmodes = volume_mpc3 * ks**2 * jnp.asarray(dks) / (2.0 * jnp.pi**2)
    diag = 2.0 * pk_tot**2 / nmodes
    nk = ks.shape[-1]
    return diag[..., None] * jnp.eye(nk, dtype=diag.dtype)


def trispectrum_1h(nzm, ms, rho_matter0, uk1, uk2=None):
    """Connected 1-halo matter trispectrum T^1h(z, k, k').

    T = int dm n(z,m) (m/rho_m0)^4 u1(k|z,m)^2 u2(k'|z,m)^2 -- the
    dominant non-Gaussian covariance term on small scales; the covariance
    contribution is T/V.  Contracted as one einsum over the mass axis (an
    MXU matmul per z), never materializing the (z,m,k,k') grid.
    """
    if uk2 is None:
        uk2 = uk1
    ms = jnp.asarray(ms)
    w = jnp.asarray(trapz_weights(np.asarray(ms)))
    mfac = (ms / rho_matter0) ** 2
    a1 = jnp.asarray(uk1) ** 2 * mfac[None, :, None]   # (z, m, k)
    a2 = jnp.asarray(uk2) ** 2 * mfac[None, :, None]
    return jnp.einsum("zm,zmk,zmq->zkq", jnp.asarray(nzm) * w[None, :],
                      a1, a2)


def trispectrum_1h_terms(nzm, ms, term12, term34):
    """Generic connected 1-halo trispectrum from per-halo term products.

    term12/term34: (z, m, k) grids t1*t2 and t3*t4 of the 1-halo "square
    terms" for any tracer pairing (m u/rho for matter, the y-weighted
    p(k) for pressure, (Nc + Ns u)/ngal for HOD ...), exactly the
    quantities power_1halo integrates.  Returns
    T(z, k, k') = int dm n(m) t1 t2(k) t3 t4(k'), one einsum per z.
    """
    ms = jnp.asarray(ms)
    w = jnp.asarray(trapz_weights(np.asarray(ms)))
    return jnp.einsum("zm,zmk,zmq->zkq", jnp.asarray(nzm) * w[None, :],
                      jnp.asarray(term12), jnp.asarray(term34))


def _interp2_loglog(Tz, lks, lk1, lk2):
    """Bilinear interpolation of one z-slice T(k, k') in (ln k, ln k')
    at the outer product of curve points lk1 x lk2 (each (nl,))."""
    def axis_interp(M, lke):
        # M: (n, nk) -> (n, nl), linear in lks along the last axis
        i = jnp.clip(jnp.searchsorted(lks, lke) - 1, 0, lks.size - 2)
        t = jnp.clip((lke - lks[i]) / (lks[i + 1] - lks[i]), 0.0, 1.0)
        return M[:, i] * (1.0 - t)[None, :] + M[:, i + 1] * t[None, :]

    A = axis_interp(Tz, lk2)            # (nk, nl2)
    return axis_interp(A.T, lk1).T      # (nl1, nl2)


def cl_cov_t1h(ells, zs, ks, t_zkk, Wz1s, Wz2s, hzs, chis, fsky=1.0,
               Wz3s=None, Wz4s=None):
    """Connected (1-halo trispectrum) covariance of C_ell bandpowers:

        Cov(C^12_ell, C^34_ell') = (1/(4 pi fsky))
            int dz H^3 (W1 W2)(W3 W4) / chi^6  T^1h(k_ell, k_ell', z),

    the Limber-projected Cooray-Hu/Takada-Jain non-Gaussian term, with
    the SAME window/H/chi conventions as limber_integral (C_ell =
    int dz H W1 W2 P / chi^2; converting to the per-dchi kernels
    q_i = H W_i gives the H^3 once dchi -> dz).  t_zkk from
    trispectrum_1h / trispectrum_1h_terms (pass term12 != term34 for the
    cross-covariance of two different spectra; Wz3s/Wz4s default to
    Wz1s/Wz2s).  EXTENSION: the reference's covariance module is
    Gaussian-only.
    """
    ells = jnp.asarray(ells)
    zs = jnp.asarray(zs)
    lks = jnp.log(jnp.asarray(ks))
    chis = jnp.asarray(chis)
    hzs = jnp.asarray(hzs)
    Wz3s = Wz1s if Wz3s is None else Wz3s
    Wz4s = Wz2s if Wz4s is None else Wz4s
    pref = (hzs**3 * (jnp.asarray(Wz1s) * jnp.asarray(Wz2s))
            * (jnp.asarray(Wz3s) * jnp.asarray(Wz4s))
            / chis**6 / (4.0 * jnp.pi * fsky))
    lke = jnp.log((ells[:, None] + 0.5) / chis[None, :])   # (nl, nz)

    import jax
    Tcurve = jax.vmap(lambda Tz, lkz: _interp2_loglog(Tz, lks, lkz, lkz),
                      in_axes=(0, 1))(jnp.asarray(t_zkk), lke)  # (nz,nl,nl)
    integrand = Tcurve * pref[:, None, None]
    wz = jnp.asarray(trapz_weights(np.asarray(zs)))
    return jnp.einsum("z,zab->ab", wz, integrand)


def sigma_b2_disk(fsky, chis, ks_lin, plin):
    """Per-z variance of the background mode over the flat-sky survey
    disk: sigma_b^2(z) = (1/2 pi) int dk k P_lin(z, k) W^2(k chi theta_s),
    with W the normalized disk window 2 J1(x)/x and theta_s the radius of
    the spherical cap of area 4 pi fsky.  plin: (nz, nk) -> (nz,)."""
    from ..ops.special import disk_window
    theta_s = jnp.arccos(1.0 - 2.0 * fsky)
    ks_lin = jnp.asarray(ks_lin)
    x = ks_lin[None, :] * jnp.asarray(chis)[:, None] * theta_s   # (nz, nk)
    W2 = disk_window(x) ** 2
    w = jnp.asarray(trapz_weights(np.asarray(ks_lin)))
    return (jnp.asarray(plin) * W2 * ks_lin[None, :] / (2.0 * jnp.pi)) @ w


def cl_cov_ssc(ells, zs, ks, pk_zk, Wz1s, Wz2s, hzs, chis, sigma_b2_z,
               resp_zk=None):
    """Super-sample covariance of C_ell bandpowers:

        Cov(C_l, C_l') = int dz H^3 (W1 W2)^2 / chi^4
                         [R P](k_l, z) [R P](k_l', z) sigma_b^2(z),

    the flat-sky Takada-Hu/Krause-Eifler form with the SAME window/H/chi
    conventions as limber_integral (per-dchi kernel q^2 = H^2 W1 W2, one
    H converting dchi -> dz).  resp_zk defaults to the linear
    dilation+beat-coupling response of pk_zk (pk_response_ssc).
    sigma_b2_z from sigma_b2_disk.  EXTENSION: reference is
    Gaussian-only."""
    from .limber import interp_pzk_at_curve
    ells = jnp.asarray(ells)
    zs = jnp.atleast_1d(jnp.asarray(zs))
    chis = jnp.asarray(chis)
    hzs = jnp.asarray(hzs)
    if resp_zk is None:
        resp_zk = pk_response_ssc(ks, pk_zk)
    kevals = (ells[:, None] + 0.5) / chis[None, :]          # (nl, nz)
    RP = interp_pzk_at_curve(zs, jnp.asarray(ks),
                             jnp.atleast_2d(jnp.asarray(resp_zk)),
                             zs, kevals)                    # (nl, nz)
    pref = (hzs**3 * (jnp.asarray(Wz1s) * jnp.asarray(Wz2s)) ** 2
            / chis**4 * jnp.asarray(sigma_b2_z))
    wz = jnp.asarray(trapz_weights(np.asarray(zs)))
    return jnp.einsum("z,az,bz->ab", wz * pref, RP, RP)


# ---------------------------------------------------------------------------
# Joint cluster-counts x C_ell super-sample covariance.  EXTENSION: the
# cross term every joint (counts + power-spectrum) likelihood needs --
# both observables respond to the same super-survey background modes, so
# neglecting the cross block double-counts their information.  The
# background mode is discretized onto the SAME redshift-bin windows as
# the counts (models/cluster_counts.window_sigma2, Lima-Hu separable
# flat-sky windows), which makes the three SSC blocks manifestly
# consistent:
#
#   delta N_i   = <bN>_i delta_b,i
#   delta C_l   = sum_j r_{l,j} delta_b,j,
#   r_{l,j}     = int_{z-bin j} dz H W1 W2 / chi^2 [R P](k_l, z)
#
#   Cov(N_i, N_j)   = <bN>_i <bN>_j sigma^2_ij      (counts_covariance)
#   Cov(N_i, C_l)   = <bN>_i sum_j sigma^2_ij r_{l,j}
#   Cov(C_l, C_l')  = sum_ij r_{l,i} sigma^2_ij r_{l',j}
#
# The C_l-C_l' block converges to the continuous per-z form cl_cov_ssc
# when the bins are wide vs the radial correlation length (sinc^2
# integral -> 1/D_i, cross terms -> 0) and narrow vs evolution -- a
# cross-formalism check the tests pin quantitatively.
# ---------------------------------------------------------------------------

def cl_ssc_response_binned(ells, zedges, zs, ks, pk_zk, Wz1s, Wz2s, hzs,
                           chis, resp_zk=None):
    """Per-redshift-bin SSC response r_{b,l} of C_ell (shape (nbin, nl)).

    zedges must lie inside the zs grid; each bin integrates the Limber
    integrand times the power response over [lo, hi] with INCLUSIVE
    endpoints, so bins sharing an on-grid edge sum exactly to the
    full-range integral (tested).  resp_zk defaults to
    pk_response_ssc(ks, pk_zk)."""
    from .limber import interp_pzk_at_curve
    ells = jnp.asarray(ells)
    zs_np = np.asarray(zs)
    zs_j = jnp.asarray(zs)
    chis = jnp.asarray(chis)
    if resp_zk is None:
        resp_zk = pk_response_ssc(ks, pk_zk)
    kevals = (ells[:, None] + 0.5) / chis[None, :]          # (nl, nz)
    RP = interp_pzk_at_curve(zs_j, jnp.asarray(ks),
                             jnp.atleast_2d(jnp.asarray(resp_zk)),
                             zs_j, kevals)                  # (nl, nz)
    rho = RP * (jnp.asarray(hzs) * jnp.asarray(Wz1s) * jnp.asarray(Wz2s)
                / chis**2)[None, :]                         # (nl, nz)
    Wb = _bin_overlap_weights(zedges, zs_np)
    return jnp.einsum("bz,lz->bl", jnp.asarray(Wb), rho)


def _bin_overlap_weights(zedges, zs):
    """(nbin, nz) weight matrix integrating a piecewise-linear function
    of zs over each [lo, hi] bin EXACTLY: every grid interval's overlap
    with the bin is integrated analytically (partial intervals included,
    the integrand at an off-grid edge folded onto the two neighboring
    grid weights by its lerp coefficients).  Rows therefore sum across
    bins to the full-range trapz weights whenever the bins tile the
    range -- additivity holds for ARBITRARY edges, not only on-grid
    ones."""
    zs = np.asarray(zs, dtype=float)
    zedges = np.asarray(zedges, dtype=float)
    nb = zedges.size - 1
    Wb = np.zeros((nb, zs.size))
    z0, z1 = zs[:-1], zs[1:]
    dz = z1 - z0
    for b, (lo, hi) in enumerate(zip(zedges[:-1], zedges[1:])):
        a = np.clip(np.maximum(lo, z0), z0, z1)
        c = np.clip(np.minimum(hi, z1), z0, z1)
        olen = np.maximum(c - a, 0.0)
        with np.errstate(invalid="ignore", divide="ignore"):
            ta = np.where(dz > 0, (a - z0) / dz, 0.0)
            tc = np.where(dz > 0, (c - z0) / dz, 0.0)
        # int_a^c lerp(f_i, f_i+1) dz = olen/2 [(1-ta)+(1-tc)] f_i
        #                              + olen/2 [ta+tc] f_i+1
        Wb[b, :-1] += olen * (2.0 - ta - tc) / 2.0
        Wb[b, 1:] += olen * (ta + tc) / 2.0
    return Wb


def cov_counts_cl_ssc(bN_i, sigma2_ij, r_bl):
    """SSC cross-covariance Cov(N_i, C_l) = <bN>_i (sigma^2 r)_{i,l}.

    bN_i: bias-weighted counts per z bin; sigma2_ij from window_sigma2 on
    the SAME zedges as r_bl (cl_ssc_response_binned).  Returns (nbin, nl).
    """
    return jnp.asarray(bN_i)[:, None] * (jnp.asarray(sigma2_ij)
                                         @ jnp.asarray(r_bl))


def cov_cl_cl_ssc_binned(r_bl, sigma2_ij, r_bl2=None):
    """Binned-window C_l SSC block: r^T sigma^2 r' (nl, nl')."""
    r_bl2 = r_bl if r_bl2 is None else r_bl2
    return jnp.asarray(r_bl).T @ jnp.asarray(sigma2_ij) @ jnp.asarray(r_bl2)


def joint_counts_cl_cov(N_i, bN_i, sigma2_ij, r_bl, cov_cl_gauss=None):
    """Full joint covariance of (N_1..N_nb, C_l1..C_lnl):

        [ diag(N) + bN bN^T o sigma^2   diag(bN) sigma^2 r        ]
        [ (diag(bN) sigma^2 r)^T        r^T sigma^2 r (+ Gaussian) ]

    The SSC part is M sigma^2 M^T with M = [diag(bN); r^T] stacked, so it
    is PSD whenever sigma^2 is (tested); Poisson and the optional
    Gaussian C_l covariance add on the diagonal blocks."""
    N_i = jnp.asarray(N_i)
    bN_i = jnp.asarray(bN_i)
    sigma2_ij = jnp.asarray(sigma2_ij)
    r_bl = jnp.asarray(r_bl)
    top_left = jnp.diag(N_i) + bN_i[:, None] * bN_i[None, :] * sigma2_ij
    top_right = cov_counts_cl_ssc(bN_i, sigma2_ij, r_bl)
    bot_right = cov_cl_cl_ssc_binned(r_bl, sigma2_ij)
    if cov_cl_gauss is not None:
        bot_right = bot_right + jnp.asarray(cov_cl_gauss)
    return jnp.block([[top_left, top_right],
                      [top_right.T, bot_right]])


def pk_response_ssc(ks, pk):
    """Linear-response dP/d(delta_b): (68/21 - (1/3) dln k^3 P/dlnk) P.

    The standard beat-coupling + dilation response of the power spectrum
    to a super-survey background mode (Takada & Hu 2013 eq 31 regime).
    pk: (..., nk), differentiated along the last axis on the ks grid.
    """
    ks = jnp.asarray(ks)
    pk = jnp.asarray(pk)
    lnk3p = jnp.log(ks**3 * pk)
    dlnk3p = gradient(lnk3p, jnp.log(ks), axis=-1)
    return (68.0 / 21.0 - dlnk3p / 3.0) * pk


def sigma_b2_tophat(volume_mpc3, ks_lin, plin):
    """Variance of the background mode over a spherical survey volume:
    sigma_b^2 = (1/2 pi^2) int dk k^2 P_lin(z, k) W^2(kR), with W the
    top-hat window and R = (3V/4pi)^(1/3).  plin: (..., nk) -> (...,).
    """
    from ..ops.special import Wkr
    ks_lin = jnp.asarray(ks_lin)
    R = (3.0 * volume_mpc3 / (4.0 * jnp.pi)) ** (1.0 / 3.0)
    W2 = Wkr(ks_lin, R, 0.01) ** 2
    w = jnp.asarray(trapz_weights(np.asarray(ks_lin)))
    integrand = jnp.asarray(plin) * W2 * ks_lin**2 / (2.0 * jnp.pi**2)
    return integrand @ w


def pk_cov_ssc(response, sigma_b2):
    """Super-sample covariance: cov(k,k') = R(k) R(k') sigma_b^2.

    response: (..., nk) from pk_response_ssc; sigma_b2: (...,) from
    sigma_b2_tophat.  Rank-1 and symmetric by construction.
    """
    response = jnp.asarray(response)
    return (response[..., :, None] * response[..., None, :]
            * jnp.asarray(sigma_b2)[..., None, None])
