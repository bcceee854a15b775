"""Explicit-loop numpy twin of models/bispectrum.py.

Loops over redshift and mass indices with per-row np.interp (flat edge
clipping, matching the jax lerp's clipped-index semantics) and
np.trapezoid mass integrals -- no vectorized jax-style broadcasting, so a
slip in the jax module's axis bookkeeping cannot be mirrored here.
Operates on a TwinHaloModel(Ext) instance; same-halo pair/triple
occupation moments follow the module-docstring conventions of
models/bispectrum.py (same-name legs share moments; different names
factorize).  Covers matter / pressure / HOD tracers (the CIB triple is
checked inline in the tests against its closed contraction).
"""

from __future__ import annotations

import numpy as np


def _normalize_kq(kq, nz):
    kq = np.atleast_1d(np.asarray(kq, dtype=np.float64))
    if kq.ndim == 1:
        kq = np.broadcast_to(kq[None, :], (nz, kq.shape[0]))
    return kq


def mu12_from_closure(k1, k2, k3):
    return (k3**2 - k1**2 - k2**2) / (2.0 * k1 * k2)


def f2_kernel(k1, k2, k3):
    mu = mu12_from_closure(k1, k2, k3)
    return 5.0 / 7.0 + 0.5 * mu * (k1 / k2 + k2 / k1) + (2.0 / 7.0) * mu**2


def tree_bispectrum(P1, P2, P3, k1, k2, k3):
    return 2.0 * (f2_kernel(k1, k2, k3) * P1 * P2
                  + f2_kernel(k2, k3, k1) * P2 * P3
                  + f2_kernel(k3, k1, k2) * P3 * P1)


def b2_sheth_torman(sigma2, params):
    a, p, dc = params["st_a"], params["st_p"], params["st_deltac"]
    anu2 = a * dc**2 / sigma2
    e1 = (anu2 - 1.0) / dc
    e2 = (anu2 / dc**2) * (anu2 - 3.0)
    E1 = (2.0 * p / dc) / (1.0 + anu2**p)
    E2 = E1 * ((1.0 + 2.0 * p) / dc + 2.0 * e1)
    return (8.0 / 21.0) * (e1 + E1) + e2 + E2


def _interp_rows(lks, rows, lkq):
    """rows (nm, nk) -> (nm, nq) by per-row np.interp (explicit loop)."""
    out = np.empty((rows.shape[0], lkq.shape[0]))
    for im in range(rows.shape[0]):
        out[im] = np.interp(lkq, lks, rows[im])
    return out


def _ingredients(hm, name, iz, lkq):
    """Per-(z, leg) interpolated tracer pieces."""
    lks = np.log(hm.ks)
    if name in hm.hods:
        hod = hm.hods[name]
        us = _interp_rows(lks, hm.uk_profiles[hod["satellite_profile"]][iz],
                          lkq)
        if hod["central_profile"] is None:
            uc = np.ones_like(us)
        else:
            uc = _interp_rows(lks, hm.uk_profiles[hod["central_profile"]][iz],
                              lkq)
        ngal = hod["ngal"][iz]
        term = (uc * hod["Nc"][iz][:, None]
                + us * hod["Ns"][iz][:, None]) / ngal
        return {"kind": "hod", "name": name, "us": us, "uc": uc,
                "term": term, "hod": hod, "iz": iz}
    term = _interp_rows(lks, np.asarray(hm._term(name))[iz], lkq)
    return {"kind": "other", "name": name, "term": term}


def _pair_term(a, b):
    if a["name"] == b["name"] and a["kind"] == "hod":
        hod, iz = a["hod"], a["iz"]
        return (((a["uc"] * b["us"] + a["us"] * b["uc"])
                 * hod["NcNs"][iz][:, None]
                 + a["us"] * b["us"] * hod["NsNsm1"][iz][:, None])
                / hod["ngal"][iz] ** 2)
    return a["term"] * b["term"]


def _triple_term(a, b, c):
    if a["name"] == b["name"] == c["name"] and a["kind"] == "hod":
        hod, iz = a["hod"], a["iz"]
        ncnsns = (hod["NcNs"][iz] * hod["Ns"][iz])[:, None]
        ns3 = (hod["NsNsm1"][iz] * hod["Ns"][iz])[:, None]
        return ((a["uc"] * b["us"] * c["us"] + a["us"] * b["uc"] * c["us"]
                 + a["us"] * b["us"] * c["uc"]) * ncnsns
                + a["us"] * b["us"] * c["us"] * ns3) / hod["ngal"][iz] ** 3
    for (x, y, z) in ((a, b, c), (b, c, a), (c, a, b)):
        if x["name"] == y["name"] and x["name"] != z["name"]:
            return _pair_term(x, y) * z["term"]
    return a["term"] * b["term"] * c["term"]


def _leg_completed_at(hm, name, iz, lkq):
    i, c, b = hm._2halo_leg(name)
    I1 = i + (b if np.isscalar(b) else np.asarray(b)) - c   # (nz, nk)
    return np.interp(lkq, np.log(hm.ks), I1[iz])


def bispectrum(hm, name1, name2, name3, k1, k2, k3, terms="total",
               include_b2=False):
    """B(z; cfg) via explicit z loops.  Legs follow the jax module's
    broadcasting: scalar / (nq,) shared, (nz, nq) per-z."""
    nz = hm.zs.shape[0]
    k1 = _normalize_kq(k1, nz)
    k2 = _normalize_kq(k2, nz)
    k3 = _normalize_kq(k3, nz)
    nq = k1.shape[1]
    names = (name1, name2, name3)
    w = np.asarray(hm.ms, dtype=np.float64)
    lks = np.log(hm.ks)
    b2h = (b2_sheth_torman(hm.sigma2, hm.p) if include_b2 else None)

    out = np.zeros((nz, nq))
    for iz in range(nz):
        lkq = [np.log(k[iz]) for k in (k1, k2, k3)]
        legs = [_ingredients(hm, names[i], iz, lkq[i]) for i in range(3)]
        Ps = [np.interp(lkq[i], lks, hm.Pzk[iz]) for i in range(3)]
        I1 = [_leg_completed_at(hm, names[i], iz, lkq[i]) for i in range(3)]
        kq = [k1[iz], k2[iz], k3[iz]]

        if terms in ("1h", "total"):
            integ = hm.nzm[iz][:, None] * _triple_term(*legs)
            b1h = np.trapezoid(integ, w, axis=0)
            for kqi in kq:
                b1h = b1h * (1.0 - np.exp(-((kqi / hm.p["kstar_damping"]) ** 2)))
            out[iz] += b1h

        if terms in ("2h", "total"):
            wgt = (hm.nzm[iz] * hm.bh[iz])[:, None]
            for i in range(3):
                j, l = (i + 1) % 3, (i + 2) % 3
                I2 = np.trapezoid(wgt * _pair_term(legs[j], legs[l]), w,
                                  axis=0)
                out[iz] += Ps[i] * I1[i] * I2

        if terms in ("3h", "total"):
            out[iz] += I1[0] * I1[1] * I1[2] * tree_bispectrum(
                Ps[0], Ps[1], Ps[2], kq[0], kq[1], kq[2])
            if b2h is not None:
                for l in range(3):
                    i, j = (l + 1) % 3, (l + 2) % 3
                    Ib2 = np.trapezoid(
                        (hm.nzm[iz] * b2h[iz])[:, None] * legs[l]["term"],
                        w, axis=0)
                    out[iz] += I1[i] * I1[j] * Ib2 * Ps[i] * Ps[j]
    return out


def projected_bispectrum(hm, ells1, ells2, ells3, name1, name2, name3,
                         Wz1s=None, Wz2s=None, Wz3s=None, terms="total"):
    """b(l1,l2,l3) = int dz H^2 W1 W2 W3 / chi^4 B(k_i=(l_i+1/2)/chi)."""
    e1, e2, e3 = np.broadcast_arrays(np.atleast_1d(np.asarray(ells1, float)),
                                     np.atleast_1d(np.asarray(ells2, float)),
                                     np.atleast_1d(np.asarray(ells3, float)))
    zs = np.asarray(hm.zs)
    chis = np.asarray(hm.comoving_radial_distance(zs))
    hzs = np.asarray(hm.h_of_z(zs))
    kq = [(e[None, :] + 0.5) / chis[:, None] for e in (e1, e2, e3)]
    B = bispectrum(hm, name1, name2, name3, kq[0], kq[1], kq[2], terms)
    ones = np.ones_like(zs)
    W = [(ones if wv is None else np.asarray(wv)) for wv in (Wz1s, Wz2s, Wz3s)]
    pre = hzs**2 * W[0] * W[1] * W[2] / chis**4
    return np.trapezoid(pre[:, None] * B, zs, axis=0)
