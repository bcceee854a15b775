"""Gaussian (Knox) bandpower covariances (reference: hmvec/cov.py).

The reference's trailing free function KnoxCov is truncated mid-body
(cov.py:65-88); here the class covers both use cases and `knox_cov` is a
complete standalone implementation.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def angular_correlation(ells, cls, thetas_rad):
    """w(theta) = sum_l (2l+1)/(4pi) C_l P_l(cos theta).

    ells: (nl,) consecutive integer multipoles starting at any l0 >= 0;
    cls: (..., nl); thetas_rad: (nt,).  Returns (..., nt).  EXTENSION
    beyond the reference (which exposes only harmonic-space spectra):
    the standard curved-sky Legendre sum, evaluated by the upward
    three-term recurrence as one lax.scan over l (P_l for all thetas is
    O(nl nt), no special functions).  Pinned against scipy
    eval_legendre in tests/test_cov_lensing.py.
    """
    import jax
    ells = np.asarray(ells)
    assert ells.ndim == 1 and np.all(np.diff(ells) == 1), \
        "ells must be consecutive integers"
    l0 = int(ells[0])
    x = jnp.cos(jnp.asarray(thetas_rad))
    cls = jnp.asarray(cls)

    # run the recurrence from l = 0 regardless of l0; weights select the
    # provided range
    nl_total = int(ells[-1]) + 1
    wcls = cls * ((2.0 * jnp.asarray(ells, dtype=cls.dtype) + 1.0)
                  / (4.0 * jnp.pi))                  # (..., nl)
    w = jnp.zeros((nl_total,) + cls.shape[:-1] + (1,), dtype=cls.dtype)
    w = w.at[l0:].set(jnp.moveaxis(wcls, -1, 0)[..., None])

    # accumulate sum_l w_l P_l(x) with a scan carrying (P_{l-1}, P_l):
    # P_{l+1} = ((2l+1) x P_l - l P_{l-1}) / (l+1)
    def body(carry, wl):
        pm1, p, l, acc = carry
        acc = acc + wl * p
        pnext = ((2.0 * l + 1.0) * x * p - l * pm1) / (l + 1.0)
        return (p, pnext, l + 1.0, acc), None

    p0 = jnp.ones_like(x)
    init = (jnp.zeros_like(x), p0, jnp.asarray(0.0),
            jnp.zeros(cls.shape[:-1] + x.shape))
    (_, _, _, acc), _ = jax.lax.scan(body, init, w)
    return acc


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
