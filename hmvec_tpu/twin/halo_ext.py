"""Numpy twin extensions: Battaglia profiles, pressure, HOD, mass conversion.

Completes the twin's coverage of BASELINE configs 2 and 3 (Battaglia
electron Pee/Pme; HOD Pgg/Pgm/Pge).  Mirrors reference semantics
(hmvec/hmvec.py) with scipy-free vectorized float64 numpy.
"""

from __future__ import annotations

import numpy as np
from scipy.special import erf

from ..params import battaglia_defaults
from .halo import TwinHaloModel, R_from_M
from .profile_fft import generic_profile_fft


def fcon(c):
    return np.log(1.0 + c) - c / (1.0 + c)


def mdelta_from_mdelta(M1, C1, delta_rhos1, delta_rhos2, num_iter=90,
                       log_bracket=10.0):
    """Bisection mass conversion; same fixed-iteration spec as
    models/mass_conversion.py (the twin matches the jax path exactly)."""
    M1g = np.asarray(M1)[None, :] + 0.0 * C1
    logM1 = np.log(M1g)
    dr1 = np.asarray(delta_rhos1)[:, None]
    dr2 = np.asarray(delta_rhos2)[:, None]
    F1 = 1.0 / fcon(C1)
    lo = logM1 - log_bracket
    hi = logM1 + log_bracket
    for _ in range(num_iter):
        mid = (lo + hi) / 2.0
        C2 = C1 * (np.exp(mid - logM1) * (dr1 / dr2)) ** (1.0 / 3.0)
        val = M1g * F1 - np.exp(mid) / fcon(C2)
        go_right = val > 0
        lo = np.where(go_right, mid, lo)
        hi = np.where(go_right, hi, mid)
    return np.exp((lo + hi) / 2.0)


def battaglia_fit(m, z, A0, am, az):
    return A0 * (m / 1e14) ** am * (1.0 + z) ** az


_BEHROOZI_LOWZ = (10.72, 0.55, 12.35, 0.28, 0.44, 0.18, 1.56, 2.51, 0.57, 0.17)
_BEHROOZI_HIZ = (11.09, 0.56, 12.27, -0.84, 0.65, 0.31, 1.12, -0.53, 0.56, -0.12)


def _behroozi_core(log10mstar, a, p):
    (Mstar00, Mstara, M1, M1a, beta0, beta_a,
     gamma0, gamma_a, delta0, delta_a) = p
    log10M1 = M1 + M1a * (a - 1.0)
    log10Mstar0 = Mstar00 + Mstara * (a - 1.0)
    beta = beta0 + beta_a * (a - 1.0)
    gamma = gamma0 + gamma_a * (a - 1.0)
    delta = delta0 + delta_a * (a - 1.0)
    d = log10mstar - log10Mstar0
    return (-0.5 + log10M1 + beta * d
            + 10.0 ** (delta * d) / (1.0 + 10.0 ** (-gamma * d)))


def mhalo_from_mstellar(zs, log10mstellar):
    zcol = np.atleast_1d(zs).reshape(-1, 1)
    a = 1.0 / (1.0 + zcol)
    ms = np.broadcast_to(np.asarray(log10mstellar),
                         (zcol.shape[0], np.shape(log10mstellar)[-1]))
    low = _behroozi_core(ms, a, _BEHROOZI_LOWZ)
    high = _behroozi_core(ms, a, _BEHROOZI_HIZ)
    return np.where(zcol <= 0.8, low, high)


_MSTAR_GRID = np.linspace(-18.0, 18.0, 4000)


def mstellar_from_mhalo(zs, log10mhalo):
    mh = mhalo_from_mstellar(zs, _MSTAR_GRID[None, :])
    nz = mh.shape[0]
    mhal = np.broadcast_to(np.asarray(log10mhalo).reshape(1, -1),
                           (nz, np.shape(log10mhalo)[-1]))
    out = np.zeros_like(mhal)
    for i in range(nz):
        out[i] = np.interp(mhal[i], mh[i], _MSTAR_GRID)
    return out


class TwinHaloModelExt(TwinHaloModel):
    """Twin with Battaglia/pressure/HOD (mirrors models/halo_model.py)."""

    def _m200critz(self):
        rhocritz = self.rho_critical_z(self.zs)
        if self.mdef == "vir":
            delta_rhos1 = rhocritz * self.deltav(self.zs)
        else:
            delta_rhos1 = self.rho_matter_z(self.zs) * 200.0
        cs = self.concentration()
        delta_rhos2 = 200.0 * rhocritz
        m200 = mdelta_from_mdelta(self.ms, cs, delta_rhos1, delta_rhos2)
        r200 = R_from_M(m200, rhocritz[:, None], delta=200.0)
        return m200, r200, rhocritz

    def add_battaglia_profile(self, name, family=None, nxs=None, xmax=None):
        if nxs is None:
            nxs = self.p["electron_density_profile_integral_numxs"]
        if xmax is None:
            xmax = self.p["electron_density_profile_integral_xmax"]
        if family is None:
            family = self.p["battaglia_gas_family"]
        fp = dict(battaglia_defaults[family])
        gamma = self.p["battaglia_gas_gamma"]
        m200, r200, rhocritz = self._m200critz()
        rvirs = self.rvir(self.ms[None, :], self.zs[:, None])
        omb = self.p["ombh2"] / self.h**2
        omm = self.omm0

        def rhofunc(xs):
            m = m200[..., None]
            z = self.zs[:, None, None]
            rho0 = battaglia_fit(m, z, fp["rho0_A0"], fp["rho0_alpham"], fp["rho0_alphaz"])
            alpha = battaglia_fit(m, z, fp["alpha_A0"], fp["alpha_alpham"], fp["alpha_alphaz"])
            beta = battaglia_fit(m, z, fp["beta_A0"], fp["beta_alpham"], fp["beta_alphaz"])
            x = xs[None, None, :]
            return ((omb / omm) * rhocritz[:, None, None] * rho0 * x**gamma
                    * (1.0 + x**alpha) ** (-(beta + gamma) / alpha))

        rgs = r200 / 2.0
        cgs = rvirs / rgs
        _, uk = generic_profile_fft(rhofunc, cgs, rgs, self.zs, self.ks,
                                    xmax, nxs)
        self.uk_profiles[name] = uk
        return uk

    def add_battaglia_pres_profile(self, name, family=None, nxs=None,
                                   xmax=None):
        if nxs is None:
            nxs = self.p["electron_pressure_profile_integral_numxs"]
        if xmax is None:
            xmax = self.p["electron_pressure_profile_integral_xmax"]
        if family is None:
            family = self.p["battaglia_pres_family"]
        fp = dict(battaglia_defaults[family])
        gamma = self.p["battaglia_pres_gamma"]
        alpha_p = self.p["battaglia_pres_alpha"]
        m200, r200, rhocritz = self._m200critz()
        rvirs = self.rvir(self.ms[None, :], self.zs[:, None])
        omb = self.p["ombh2"] / self.h**2
        omm = self.omm0

        def presfunc(xs):
            m = m200[..., None]
            r2 = r200[..., None]
            z = self.zs[:, None, None]
            P0 = battaglia_fit(m, z, fp["P0_A0"], fp["P0_alpham"], fp["P0_alphaz"])
            xc = battaglia_fit(m, z, fp["xc_A0"], fp["xc_alpham"], fp["xc_alphaz"])
            beta = battaglia_fit(m, z, fp["beta_A0"], fp["beta_alpham"], fp["beta_alphaz"])
            XH = 0.76
            eFrac = 2.0 * (XH + 1.0) / (5.0 * XH + 3.0)
            # scipy.constants.G, as the reference's P_e_generic_x uses
            G_newt = 6.67430e-11 / (3.08567758e16 * 1e6) ** 3 * 1.989e30
            x = xs[None, None, :]
            return (eFrac * (omb / omm) * 200.0 * m * G_newt
                    * rhocritz[:, None, None] / (2.0 * r2) * P0
                    * (x / xc) ** gamma * (1.0 + (x / xc) ** alpha_p) ** (-beta))

        rgs = r200
        cgs = rvirs / rgs
        _, pk = generic_profile_fft(presfunc, cgs, rgs, self.zs, self.ks,
                                    xmax, nxs, do_mass_norm=False)
        sigmaT = 6.6524587321e-29
        mElect = 9.1093837015e-31 / 1.989e30
        c_SI = 299792458.0
        unit = (4.0 * np.pi * (sigmaT / (mElect * c_SI**2))
                * (r200**3 * ((1.0 + self.zs) ** 2
                              / self.h_of_z(self.zs))[..., None])[..., None])
        self.pk_profiles[name] = pk * unit
        return self.pk_profiles[name]

    # ---- HOD ----
    def _avg_nc(self, log10mhalo, thresh):
        log10mstar = mstellar_from_mhalo(self.zs, log10mhalo)
        num = thresh - log10mstar
        return 0.5 * (1.0 - erf(num / (np.sqrt(2.0)
                                       * self.p["hod_sig_log_mstellar"])))

    def _avg_ns(self, log10mhalo, thresh, Nc):
        mth = mhalo_from_mstellar(self.zs, thresh)
        Msat = 1e12 * self.p["hod_Bsat"] * 10.0 ** ((mth - 12.0)
                                                    * self.p["hod_betasat"])
        Mcut = 1e12 * self.p["hod_Bcut"] * 10.0 ** ((mth - 12.0)
                                                    * self.p["hod_betacut"])
        masses = 10.0 ** np.asarray(log10mhalo)
        return (Nc * (masses / Msat) ** self.p["hod_alphasat"]
                * np.exp(-Mcut / masses))

    def ngal_from_mthresh(self, log10mthresh):
        log10mhalo = np.log10(self.ms)[None, :]
        thresh = np.asarray(log10mthresh)[:, None]
        Nc = self._avg_nc(log10mhalo, thresh)
        Ns = self._avg_ns(log10mhalo, thresh, Nc)
        return np.trapezoid(self.nzm * (Nc + Ns), self.ms, axis=-1)

    def add_hod(self, name, mthresh=None, ngal=None, corr="max",
                satellite_profile_name="nfw", num_iter=90):
        if ngal is not None:
            target = np.asarray(ngal)
            lo = np.full_like(target,
                              self.p["hod_bisection_search_min_log10mthresh"])
            hi = np.full_like(target,
                              self.p["hod_bisection_search_max_log10mthresh"])
            for _ in range(num_iter):
                mid = (lo + hi) / 2.0
                val = self.ngal_from_mthresh(mid)
                go_right = val > target  # decreasing
                lo = np.where(go_right, mid, lo)
                hi = np.where(go_right, hi, mid)
            log10mthresh = (lo + hi) / 2.0
            mthresh = 10.0 ** (log10mthresh * self.p["hod_A_log10mthresh"])
        mthresh = np.asarray(mthresh)
        log10mhalo = np.log10(self.ms)[None, :]
        thresh = np.log10(mthresh)[:, None]
        Nc = self._avg_nc(log10mhalo, thresh)
        Ns = self._avg_ns(log10mhalo, thresh, Nc)
        if corr == "max":
            with np.errstate(divide="ignore", invalid="ignore"):
                NsNsm1 = np.where(np.isclose(Nc, 0.0), 0.0, Ns**2 / Nc)
            NcNs = Ns
        else:
            NsNsm1 = Ns**2
            NcNs = Ns * Nc
        ngal_out = np.trapezoid(self.nzm * (Nc + Ns), self.ms, axis=-1)
        bg = (np.trapezoid(self.nzm * (Nc + Ns) * self.bh, self.ms, axis=-1)
              / ngal_out)
        self.hods[name] = dict(Nc=Nc, Ns=Ns, NsNsm1=NsNsm1, NcNs=NcNs,
                               ngal=ngal_out, bg=bg,
                               satellite_profile=satellite_profile_name,
                               central_profile=None,
                               log10mthresh=thresh)
        return self.hods[name]
