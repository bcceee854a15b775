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
                 electron_profile_nxs=None, electron_profile_xmax=None):
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
        self.add_hod("g", ngal=ngals)

        self.sPggs = self.get_power("g")
        self.sPges = self.get_power("g", "e")

        vol_mpc3 = np.max(volumes) * 1e9
        kmin = np.pi / vol_mpc3 ** (1.0 / 3.0)
        self.kLs = np.geomspace(kmin, kL_max, num_kL_bins)

        p = self.plin(zs, self.kLs, accuracy="medium")
        growth = self.growth_rate_f(zs)
        a = 1.0 / (1.0 + zs)
        H = self.h_of_z(zs)
        self.Pmms = np.broadcast_to(p[:, None, :],
                                    (zs.size, self.mu.size, self.kLs.size))
        self.d2vs = (growth * a * H)[:, None] / self.kLs[None, :]
        self.kstars = ksz_radial_function(zs, self.ombh2,
                                          self.p.get("Yp", 0.24),
                                          params=self.p)
        self.chistars = self.comoving_radial_distance(zs)
        self.bgs = self.hods["g"]["bg"]

        nggs = 1.0 / ngals
        flPgg = self.Pmms[:, 0, :] * self.bgs[:, None] ** 2 + nggs[:, None]
        flPgv = self.Pmms[:, 0, :] * self.bgs[:, None] * self.d2vs
        integrand = _sanitize(self.kLs[None, :] ** 2 * flPgv**2 / flPgg)
        self.vrec = np.trapezoid(integrand, self.kLs, axis=-1)
        self.sPggtot = self.sPggs + nggs[:, None]
        self.sPge = self.sPges

    def Nvv(self, zindex, Cls):
        return nvv_core_integral(self.chistars[zindex], self.kstars[zindex],
                                 self.mu, self.kLs, np.asarray(self.kS), Cls,
                                 self.sPge[zindex], self.sPggtot[zindex])
