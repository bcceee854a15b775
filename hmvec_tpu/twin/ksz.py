"""Numpy twin of the kSZ forecasting core (parity oracle for config 5)."""

from __future__ import annotations

import numpy as np

from ..params import default_params
from .halo_ext import TwinHaloModelExt

constants = {
    "thompson_SI": 6.6524e-29,
    "meter_to_megaparsec": 3.241e-23,
    "G_SI": 6.674e-11,
    "mProton_SI": 1.673e-27,
    "H100_SI": 3.241e-18,
}


def ne0_shaw(ombh2, Yp, NHe=0, gasfrac=0.9):
    chi = (1.0 - Yp * (1.0 - NHe / 4.0)) / (1.0 - Yp / 2.0)
    fact = 3.0 * constants["H100_SI"] ** 2 / (
        constants["mProton_SI"] * 8.0 * np.pi * constants["G_SI"])
    return chi * gasfrac * ombh2 * fact / 1.14


def ksz_radial_function(z, ombh2, Yp, xe=1, tau=0, params=None):
    if params is None:
        params = default_params
    pref = (params["T_CMB"] * constants["thompson_SI"] * ne0_shaw(ombh2, Yp)
            / constants["meter_to_megaparsec"])
    return pref * (1.0 + np.asarray(z)) ** 2 * xe * np.exp(-tau)


def get_interpolated_cls(Cls, chistar, kss):
    Cls = np.array(Cls, dtype=np.float64)
    Cls[:2] = 0.0
    ell = chistar * np.asarray(kss)
    idx = np.clip(ell.astype(int), 0, Cls.size - 1)
    out = Cls[idx]
    out[ell > Cls.size - 1] = np.inf
    return out


def _sanitize(x):
    x = np.array(x)
    x[~np.isfinite(x)] = 0.0
    return x


def nvv_core_integral(chi_star, Fstar, mu, kL, kSs, Cls, Pge, Pgg_tot):
    amu = mu[:, None] + 0.0 * kL[None, :]
    prefact = amu ** (-2.0) * 2.0 * np.pi * chi_star**2 / Fstar**2
    Clkstot = get_interpolated_cls(Cls, chi_star, kSs)
    integrand = _sanitize(kSs * Pge**2 / (Pgg_tot * Clkstot))
    integral = np.trapezoid(integrand, kSs, axis=-1)
    return prefact / integral


class TwinKSZ(TwinHaloModelExt):
    """Mirror of models.ksz.kSZ for a single-z-bin forecasting config."""

    def __init__(self, zs, volumes_gpc3, ngals_mpc3, kL_max=0.1,
                 num_kL_bins=100, kS_min=0.1, kS_max=10.0, num_kS_bins=101,
                 num_mu_bins=102, ms=None, params=None,
                 electron_profile_nxs=None, electron_profile_xmax=None,
                 skip_hod=False, b1=None):
        zs = np.atleast_1d(np.asarray(zs, dtype=np.float64))
        volumes = np.atleast_1d(np.asarray(volumes_gpc3, dtype=np.float64))
        ngals = np.atleast_1d(np.asarray(ngals_mpc3, dtype=np.float64))
        if ms is None:
            ms = np.geomspace(1e6, 1e16, 1000)
        ks = np.geomspace(kS_min, kS_max, num_kS_bins)
        super().__init__(zs, ks, ms, params=params)
        self.kS = self.ks
        self.mu = np.linspace(-1.0, 1.0, num_mu_bins)
        self.add_battaglia_profile("e", nxs=electron_profile_nxs,
                                   xmax=electron_profile_xmax)
        if not skip_hod:
            self.add_hod("g", ngal=ngals)
            self.sPggs = self.get_power("g", b1=b1, b2=b1)
            self.sPges = self.get_power("g", "e", b1=b1)

        vol_mpc3 = np.max(volumes) * 1e9
        kmin = np.pi / vol_mpc3 ** (1.0 / 3.0)
        self.kLs = np.geomspace(kmin, kL_max, num_kL_bins)

        p = self.plin(zs, self.kLs, accuracy="medium")
        growth = self.growth_rate_f(zs)
        a = 1.0 / (1.0 + zs)
        H = self.h_of_z(zs)
        self.Pmms = np.broadcast_to(p[:, None, :],
                                    (zs.size, self.mu.size, self.kLs.size))
        self.adotf = growth * a * H
        self.d2vs = (growth * a * H)[:, None] / self.kLs[None, :]
        self.kstars = ksz_radial_function(zs, self.ombh2,
                                          self.p.get("Yp", 0.24),
                                          params=self.p)
        self.chistars = self.comoving_radial_distance(zs)
        if not skip_hod:
            self.bgs = self.hods["g"]["bg"]

            nggs = 1.0 / ngals
            flPgg = (self.Pmms[:, 0, :] * self.bgs[:, None] ** 2
                     + nggs[:, None])
            flPgv = self.Pmms[:, 0, :] * self.bgs[:, None] * self.d2vs
            integrand = _sanitize(self.kLs[None, :] ** 2 * flPgv**2 / flPgg)
            self.vrec = np.trapezoid(integrand, self.kLs, axis=-1)
            self.sPggtot = self.sPggs + nggs[:, None]
            self.sPge = self.sPges

    # ---- long-wavelength spectra (mirror models/ksz.py:279-294) ----
    def lPvv(self, zindex, bv1=1, bv2=1):
        return (self.d2vs[zindex][None, :] ** 2 * self.Pmms[zindex]
                * bv1 * bv2)

    def lPgg(self, zindex, bg1, bg2):
        return self.Pmms[zindex] * bg1 * bg2

    def lPgv(self, zindex, bg, bv=1):
        return self.Pmms[zindex] * bg * bv * self.d2vs[zindex][None, :]

    def ksz_radial_function(self, zindex):
        return ksz_radial_function(self.zs[zindex], self.ombh2,
                                   self.p.get("Yp", 0.24), params=self.p)

    def Nvv(self, zindex, Cls):
        return nvv_core_integral(self.chistars[zindex], self.kstars[zindex],
                                 self.mu, self.kLs, np.asarray(self.kS), Cls,
                                 self.sPge[zindex], self.sPggtot[zindex])


# ---------------------------------------------------------------------------
# kSZ signal oracles: template cross, squeezed auto, full-B28 auto.
# Independent numpy implementations of the integrals in models/ksz.py
# (reference: ksz.py:340-419, :661-873, :471-658), written with explicit
# loops; parity pinned in tests/test_ksz_signals.py.
# ---------------------------------------------------------------------------

def twin_template_signal(ells, volume_gpc3, z, ngal_mpc3, bg,
                         fparams=None, params=None, **ksz_kwargs):
    """C_ell^(That T) template cross-spectrum (models/ksz.py:363-393)."""
    fksz = TwinKSZ([z], [volume_gpc3], [ngal_mpc3], params=fparams,
                   **ksz_kwargs)
    pksz = (TwinKSZ([z], [volume_gpc3], [ngal_mpc3], params=params,
                    **ksz_kwargs) if params is not None else fksz)

    ngg = 1.0 / ngal_mpc3
    fsPgg = fksz.sPggs[0] + ngg
    fsPge = fksz.sPges[0]
    psPge = pksz.sPges[0] if params is not None else fsPge

    chistar = pksz.comoving_radial_distance(np.float64(z))
    ratio = _sanitize(fsPge * psPge / fsPgg)
    Pks = np.interp(np.asarray(ells) / chistar, fksz.kS, ratio,
                    left=0.0, right=0.0)

    fF = fksz.ksz_radial_function(0)
    pF = pksz.ksz_radial_function(0) if params is not None else fF
    V = volume_gpc3 * 1e9
    pref = fF * pF * V ** (1.0 / 3.0) / 6.0 / np.pi**2 / chistar**2

    flPgg = fksz.lPgg(0, bg1=bg, bg2=bg)[0, :] + ngg
    flPgv = fksz.lPgv(0, bg=bg)[0, :]
    plPgv = pksz.lPgv(0, bg=bg)[0, :] if params is not None else flPgv
    kls = fksz.kLs
    vrec = np.trapezoid(_sanitize(kls**2 * flPgv * plPgv / flPgg), kls)
    return pref * Pks * vrec


def _twin_cl_from_pq(twin, ells, zs, ks, Pq, extra_half=False):
    """chi integral of a P_q table to C_ell (models/ksz.py:459-495)."""
    chi_max = twin.comoving_radial_distance(zs[-1])
    ne0 = ne0_shaw(twin.ombh2, twin.p.get("Yp", 0.24))
    kfact = (constants["thompson_SI"] * ne0
             / constants["meter_to_megaparsec"]) ** 2
    tcmb_uk = twin.p["T_CMB"]
    lks = np.log(ks)
    nz = zs.size
    cl = np.zeros(np.atleast_1d(ells).size)
    for i, ell in enumerate(np.atleast_1d(ells)):
        chi_int = np.geomspace(ell / 30.0, chi_max, 100)
        k_int = ell / chi_int
        z_int = twin.redshift_at_comoving_radial_distance(chi_int)
        pv = np.zeros(chi_int.size)
        for j in range(chi_int.size):
            if nz > 1:
                iz = np.clip(np.searchsorted(zs, z_int[j]) - 1, 0, nz - 2)
                tz = np.clip((z_int[j] - zs[iz]) / (zs[iz + 1] - zs[iz]),
                             0.0, 1.0)
                row = Pq[iz] * (1 - tz) + Pq[iz + 1] * tz
            else:
                row = Pq[0]
            lke = np.log(k_int[j])
            ik = int(np.clip(np.searchsorted(lks, lke) - 1, 0, ks.size - 2))
            t = (lke - lks[ik]) / (lks[ik + 1] - lks[ik])
            v = row[ik] * (1 - t) + row[ik + 1] * t
            if k_int[j] < ks[0] or k_int[j] > ks[-1]:
                v = 0.0
            pv[j] = v
        integrand = pv / chi_int**2 * (1.0 + z_int) ** 4
        integrand = integrand * kfact * tcmb_uk**2
        if extra_half:
            integrand = 0.5 * integrand
        cl[i] = np.trapezoid(integrand, chi_int)
    return cl


def twin_auto_squeezed(ells, volume_gpc3, zs, ngals_mpc3, bgs, params=None,
                       k_max=100.0, num_k_bins=200, num_mu_bins=102,
                       ms=None, electron_profile_nxs=None,
                       electron_profile_xmax=None, template=False,
                       ngals_mpc3_for_v=None):
    """Ma&Fry squeezed-limit kSZ auto C_ell (models/ksz.py:396-495)."""
    from ..params import merge_params
    zs = np.sort(np.atleast_1d(np.asarray(zs, dtype=np.float64)))
    volumes = volume_gpc3 * np.ones_like(zs)
    if ngals_mpc3_for_v is None:
        ngals_mpc3_for_v = ngals_mpc3
    p = merge_params(params)
    p["hod_bisection_search_min_log10mthresh"] = 1
    kmin = np.pi / (volume_gpc3 * 1e9) ** (1.0 / 3.0)

    twin = TwinKSZ(zs, volumes, np.asarray(ngals_mpc3) * np.ones_like(zs),
                   kL_max=k_max, num_kL_bins=num_k_bins, kS_min=kmin,
                   kS_max=k_max, num_kS_bins=num_k_bins,
                   num_mu_bins=num_mu_bins, ms=ms, params=p,
                   electron_profile_nxs=electron_profile_nxs,
                   electron_profile_xmax=electron_profile_xmax,
                   skip_hod=not template, b1=bgs)
    ks = np.asarray(twin.kS)
    kls = twin.kLs
    nz = zs.size

    if not template:
        sPee = twin.get_power("e", "e")
        lPvv = np.stack([twin.lPvv(zi)[0, :] for zi in range(nz)])
        vint = np.trapezoid(_sanitize(kls[None, :] ** 2 * lPvv), kls,
                            axis=-1)
        Pqr = sPee * vint[:, None] / (6.0 * np.pi**2)
    else:
        ngals = np.atleast_1d(np.asarray(ngals_mpc3)) * np.ones_like(zs)
        ngals_v = (np.atleast_1d(np.asarray(ngals_mpc3_for_v))
                   * np.ones_like(zs))
        sPgg_e = twin.sPggs + (1.0 / ngals)[:, None]
        sPgg_v = twin.sPggs + (1.0 / ngals_v)[:, None]
        sPge = twin.sPges
        lPgv = np.stack([twin.lPgv(zi, bg=bgs[zi])[0, :]
                         for zi in range(nz)])
        vint = np.trapezoid(_sanitize(kls[None, :] ** 2 * lPgv**2 / sPgg_v),
                            kls, axis=-1)
        Pqr = _sanitize(sPge**2 / sPgg_e) * vint[:, None] / (6.0 * np.pi**2)

    return _twin_cl_from_pq(twin, ells, zs, ks, Pqr)


def twin_auto_mafry(ells, volume_gpc3, zs, ngal_mpc3, bg, params=None,
                    k_max=100.0, num_k_bins=200, num_mu_bins=102, ms=None,
                    electron_profile_nxs=None, electron_profile_xmax=None):
    """Full Smith et al (B28) P_q_perp kSZ auto C_ell, explicit loops
    (models/ksz.py:498-598)."""
    zs = np.sort(np.atleast_1d(np.asarray(zs, dtype=np.float64)))
    volumes = volume_gpc3 * np.ones_like(zs)
    ngals = ngal_mpc3 * np.ones_like(zs)
    kmin = np.pi / (volume_gpc3 * 1e9) ** (1.0 / 3.0)

    twin = TwinKSZ(zs, volumes, ngals, kL_max=k_max,
                   num_kL_bins=num_k_bins, kS_min=kmin, kS_max=k_max,
                   num_kS_bins=num_k_bins, num_mu_bins=num_mu_bins, ms=ms,
                   params=params,
                   electron_profile_nxs=electron_profile_nxs,
                   electron_profile_xmax=electron_profile_xmax,
                   skip_hod=True)
    ks = np.asarray(twin.kS)
    mus = twin.mu
    nz = zs.size
    sPee = twin.get_power("e", "e")
    Pmm = np.asarray(twin.Pmms[:, 0, :])
    lks = np.log(ks)

    def interp_k(row, kq):
        kq = np.maximum(kq, 1e-300)
        lkq = np.log(kq)
        ik = np.clip(np.searchsorted(lks, lkq) - 1, 0, ks.size - 2)
        t = (lkq - lks[ik]) / (lks[ik + 1] - lks[ik])
        v = row[ik] * (1 - t) + row[ik + 1] * t
        return np.where((kq < ks[0]) | (kq > ks[-1]), 0.0, v)

    Pqperp = np.zeros((nz, ks.size))
    kp = ks[:, None]
    mu_m = mus[None, :]
    for zi in range(nz):
        for i, k in enumerate(ks):
            frac = (k * (k - 2.0 * kp * mu_m) * (1.0 - mu_m**2)
                    / (kp**2 * (kp**2 + k**2 - 2.0 * k * kp * mu_m)))
            kmkp = np.sqrt(kp**2 + k**2 - 2.0 * k * kp * mu_m)
            igr = (kp**2 * frac * interp_k(Pmm[zi], kp + 0.0 * mu_m)
                   * interp_k(sPee[zi], kmkp))
            igr = np.where(np.isfinite(igr), igr, 0.0)
            inner = np.trapezoid(igr, ks, axis=0)
            outer = np.trapezoid(inner, mus)
            Pqperp[zi, i] = (twin.adotf[zi] ** 2
                             * (2.0 * np.pi) ** (-2) * outer)

    return _twin_cl_from_pq(twin, ells, zs, ks, Pqperp, extra_half=True)
