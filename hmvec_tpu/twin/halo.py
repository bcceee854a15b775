"""Numpy twin of the halo-model core: mass function, NFW, 1h/2h spectra.

Mirrors reference behaviour (hmvec/hmvec.py) in vectorized float64 numpy.
Used as the parity oracle and the CPU baseline timed by bench.py.
"""

from __future__ import annotations

import numpy as np
from scipy.special import sici

from .core import TwinCosmology
from ..utils.weights import trapz_weights

DELTAC = 1.686

# Tinker 2008 Table 2 / 2010 Table 4 parameters vs overdensity (wrt mean
# matter density).  Same published data as models/mass_function, but the
# interpolation here is INDEPENDENT: scipy CubicSpline with natural
# boundary conditions in log10(Delta).
from scipy.interpolate import CubicSpline  # noqa: E402

_T_LOGD = np.log10([200., 300., 400., 600., 800., 1200., 1600., 2400., 3200.])
_T08_SPL = [CubicSpline(_T_LOGD, col, bc_type="natural") for col in np.array([
    [0.186, 0.200, 0.212, 0.218, 0.248, 0.255, 0.260, 0.260, 0.260],   # A
    [1.47, 1.52, 1.56, 1.61, 1.87, 2.13, 2.30, 2.53, 2.66],            # a
    [2.57, 2.25, 2.05, 1.87, 1.59, 1.51, 1.46, 1.44, 1.41],            # b
    [1.19, 1.27, 1.34, 1.45, 1.58, 1.80, 1.97, 2.24, 2.44]])]          # c
_T10_SPL = [CubicSpline(_T_LOGD, col, bc_type="natural") for col in np.array([
    [0.589, 0.585, 0.544, 0.543, 0.564, 0.623, 0.637, 0.673, 0.702],   # beta0
    [0.864, 0.922, 0.987, 1.09, 1.20, 1.34, 1.50, 1.68, 1.81],         # gamma0
    [-0.729, -0.789, -0.910, -1.05, -1.20, -1.26, -1.45, -1.50, -1.49],  # phi0
    [-0.243, -0.261, -0.261, -0.273, -0.278, -0.301, -0.301, -0.319,
     -0.336]])]                                                        # eta0


def _t_params(spls, delta):
    x = np.clip(np.log10(np.asarray(delta, dtype=np.float64)),
                _T_LOGD[0], _T_LOGD[-1])
    return tuple(s(x) for s in spls)


def R_from_M(M, rho, delta):
    return (3.0 * M / 4.0 / np.pi / delta / rho) ** (1.0 / 3.0)


class TwinHaloModel(TwinCosmology):
    def __init__(self, zs, ks, ms, params=None, mass_function="sheth-torman",
                 mdef="vir", accuracy="medium", tinker_delta=None):
        super().__init__(params)
        self.zs = np.asarray(zs, dtype=np.float64)
        self.ks = np.asarray(ks, dtype=np.float64)
        self.ms = np.asarray(ms, dtype=np.float64)
        self.mdef = mdef
        self.mode = mass_function
        self.accuracy = accuracy
        self.tinker_delta = tinker_delta
        self.Pzk = self.plin(self.zs, self.ks,
                             accuracy="low" if accuracy == "low" else "medium")
        self.init_mass_function()
        self.uk_profiles = {}
        self.uk2_profiles = {}
        self.pk_profiles = {}
        self.hods = {}
        self.add_nfw_profile("nfw")

    # ---- virial defs ----
    def deltav(self, z):
        x = self.omz(z) - 1.0
        return 18.0 * np.pi**2 + 82.0 * x - 39.0 * x**2

    def rvir(self, m, z):
        if self.mdef == "vir":
            return R_from_M(m, self.rho_critical_z(z), delta=self.deltav(z))
        if self.mdef == "mean":
            return R_from_M(m, self.rho_matter_z(z), delta=200.0)
        raise ValueError(self.mdef)

    def R_of_m(self, ms):
        return R_from_M(ms, self.rho_matter_z(0.0), delta=1.0)

    # ---- mass function ----
    def init_mass_function(self):
        self.sigma2 = self.sigma2_R(self.R_of_m(self.ms), self.zs)
        self.nzm = self.get_nzm()
        self.bh = self.get_bh()

    # ST-form constant sets for the PS / Despali-16 extension families
    # (lockstep mirror of models/mass_function._PS_PARAMS/_DESPALI_PARAMS)
    _ST_FORM = {"press-schechter": (0.5, 1.0, 0.0),
                "despali": (0.3292, 0.7665, 0.2488)}

    def get_fsigmaz(self):
        s2 = self.sigma2
        deltac = self.p["st_deltac"]
        if self.mode == "sheth-torman" or self.mode in self._ST_FORM:
            if self.mode == "sheth-torman":
                A, a, pp = self.p["st_A"], self.p["st_a"], self.p["st_p"]
            else:
                A, a, pp = self._ST_FORM[self.mode]
            sigma = np.sqrt(s2)
            return (A * np.sqrt(2.0 * a / np.pi)
                    * (1.0 + (s2 / a / deltac**2) ** pp)
                    * (deltac / sigma) * np.exp(-a * deltac**2 / 2.0 / s2))
        if self.mode == "tinker":
            nus = deltac / np.sqrt(s2)
            return nus * self.tinker_f_nu(nus, self.zs[:, None],
                                          self._tinker_delta())
        if self.mode == "tinker2008":
            sigma = np.sqrt(s2)
            dl = np.asarray(self._tinker_delta(), dtype=np.float64)
            A, a, b, c = _t_params(_T08_SPL, dl)
            zp1 = 1.0 + np.minimum(self.zs[:, None], 3.0)
            al = 10.0 ** (-((0.75 / np.log10(dl / 75.0)) ** 1.2))
            return (A * zp1**-0.14 * (1.0 + (sigma / (b * zp1**-al)) ** -(a * zp1**-0.06))
                    * np.exp(-c / s2))
        raise NotImplementedError(self.mode)

    @staticmethod
    def tinker_bias(nu, delta=200.0):
        y = np.log10(delta)
        bigA = 1.0 + 0.24 * y * np.exp(-((4.0 / y) ** 4))
        a = 0.44 * y - 0.88
        bigC = 0.019 + 0.107 * y + 0.19 * np.exp(-((4.0 / y) ** 4))
        nua = nu**a
        return 1.0 - bigA * nua / (nua + DELTAC**a) + 0.183 * nu**1.5 + bigC * nu**2.4

    @staticmethod
    def _tinker_f_unnorm(nu, zs, delta=200.0):
        zc = np.minimum(zs, 3.0)
        beta0, gamma0, phi0, eta0 = _t_params(_T10_SPL, delta)
        beta = beta0 * (1.0 + zc) ** 0.20
        phi = phi0 * (1.0 + zc) ** -0.08
        eta = eta0 * (1.0 + zc) ** 0.27
        gamma = gamma0 * (1.0 + zc) ** -0.01
        return ((1.0 + (beta * nu) ** (-2.0 * phi))
                * nu ** (2.0 * eta) * np.exp(-gamma * nu**2 / 2.0))

    def _tinker_delta(self):
        td = self.tinker_delta
        if td is None:
            return 200.0
        if isinstance(td, str):
            if td != "auto":
                raise ValueError(td)
            if self.mdef == "vir":
                return (self.deltav(self.zs) / self.omz(self.zs))[:, None]
            return 200.0
        td = np.asarray(td, dtype=np.float64)
        return td[:, None] if td.ndim == 1 else td

    def tinker_f_nu(self, nu, zs, delta=200.0):
        nus_grid = np.logspace(-8, 2, 10000)
        dcol = np.asarray(delta, dtype=np.float64)
        dcol = dcol[:, None] if dcol.ndim == 1 else dcol
        f_grid = self._tinker_f_unnorm(nus_grid[None, :],
                                       np.atleast_1d(zs).reshape(-1, 1), dcol)
        b_grid = np.broadcast_to(self.tinker_bias(nus_grid[None, :], dcol),
                                 f_grid.shape)
        alpha = 1.0 / np.trapezoid(f_grid * b_grid, nus_grid, axis=-1)
        return (alpha.reshape(zs.shape[:1] + (1,) * (nu.ndim - 1))
                * self._tinker_f_unnorm(nu, zs, dcol))

    def get_nzm(self):
        ln_sigma_inv = -0.5 * np.log(self.sigma2)
        dln = np.gradient(ln_sigma_inv, np.log(self.ms), axis=-1)
        return (self.rho_matter_z(0.0) * self.get_fsigmaz() * dln
                / self.ms[None, :] ** 2)

    def get_bh(self):
        s2 = self.sigma2
        deltac = self.p["st_deltac"]
        if self.mode == "sheth-torman" or self.mode in self._ST_FORM:
            if self.mode == "sheth-torman":
                a, pp = self.p["st_a"], self.p["st_p"]
            else:
                _, a, pp = self._ST_FORM[self.mode]
            return (1.0 + (1.0 / deltac) * ((a * deltac**2 / s2) - 1.0)
                    + (2.0 * pp / deltac) / (1.0 + (a * deltac**2 / s2) ** pp))
        if self.mode in ("tinker", "tinker2008"):
            return self.tinker_bias(deltac / np.sqrt(s2),
                                    self._tinker_delta())
        raise NotImplementedError(self.mode)

    # ---- profiles ----
    def concentration(self):
        key = {"mean": ("duffy_A_mean", "duffy_alpha_mean", "duffy_beta_mean"),
               "vir": ("duffy_A_vir", "duffy_alpha_vir", "duffy_beta_vir")}[self.mdef]
        A, alpha, beta = self.p[key[0]], self.p[key[1]], self.p[key[2]]
        return (A * (self.h * self.ms[None, :] / 2.0e12) ** alpha
                * (1.0 + self.zs[:, None]) ** beta)

    def _nfw_uk_from_c(self, cs, rvirs):
        rss = (rvirs / cs)[..., None]
        cs3 = cs[..., None]
        mc = np.log(1.0 + cs3) - cs3 / (1.0 + cs3)
        x = self.ks[None, None, :] * rss * (1.0 + self.zs[:, None, None])
        si, ci = sici(x)
        sic, cic = sici((1.0 + cs3) * x)
        return (np.sin(x) * (sic - si) - np.sin(cs3 * x) / ((1.0 + cs3) * x)
                + np.cos(x) * (cic - ci)) / mc

    def add_nfw_profile(self, name, conc_scatter=None):
        cs = self.concentration()
        rvirs = self.rvir(self.ms[None, :], self.zs[:, None])
        if conc_scatter is not None:
            # INDEPENDENT quadrature of the lognormal expectation: dense
            # trapz over ln c in +-6 sigma (the jax side uses
            # Gauss-Hermite nodes)
            ts = np.linspace(-6.0, 6.0, 481)
            pdf = np.exp(-0.5 * ts**2) / np.sqrt(2.0 * np.pi)
            dt = ts[1] - ts[0]
            w = np.full(ts.size, dt)
            w[0] = w[-1] = dt / 2.0
            um, u2 = 0.0, 0.0
            for t, wi in zip(ts, w * pdf):
                ui = self._nfw_uk_from_c(cs * np.exp(conc_scatter * t),
                                         rvirs)
                um = um + wi * ui
                u2 = u2 + wi * ui * ui
            self.uk_profiles[name] = um
            self.uk2_profiles[name] = u2
            return um
        uk = self._nfw_uk_from_c(cs, rvirs)
        self.uk_profiles[name] = uk
        self.uk2_profiles.pop(name, None)
        return uk

    # ---- power ----
    def _matter_term(self, name, lowklim=False):
        uk = 1.0 if lowklim else self.uk_profiles[name]
        return self.ms[None, :, None] * uk / self.rho_matter_z(0.0)

    def _hod_term(self, name, lowklim=False):
        hod = self.hods[name]
        uc = 1.0 if hod["central_profile"] is None else self.uk_profiles[hod["central_profile"]]
        us = self.uk_profiles[hod["satellite_profile"]]
        if lowklim:
            uc, us = 1.0, 1.0
        return ((uc * hod["Nc"][..., None] + us * hod["Ns"][..., None])
                / hod["ngal"][..., None, None])

    def _pressure_term(self, name, lowklim=False):
        pk = self.pk_profiles[name]
        if lowklim:
            return np.broadcast_to(pk[:, :, :1], pk.shape)
        return pk

    def _term(self, name, lowklim=False):
        if name in self.hods:
            return self._hod_term(name, lowklim)
        if name in self.uk_profiles:
            return self._matter_term(name, lowklim)
        if name in self.pk_profiles:
            return self._pressure_term(name, lowklim)
        raise ValueError(name)

    def get_power_1halo(self, name="nfw", name2=None):
        name2 = name if name2 is None else name2
        if name in self.hods and name2 in self.hods:
            hod = self.hods[name]
            uc = 1.0 if hod["central_profile"] is None else self.uk_profiles[hod["central_profile"]]
            sp = hod["satellite_profile"]
            us = self.uk_profiles[sp]
            # conc scatter: the same-halo sat-sat pair carries <u^2>
            us_sq = self.uk2_profiles[sp] if sp in self.uk2_profiles else us**2
            square = ((2.0 * uc * us * hod["NcNs"][..., None]
                       + hod["NsNsm1"][..., None] * us_sq)
                      / hod["ngal"][..., None, None] ** 2)
        elif name in self.pk_profiles and name2 in self.pk_profiles:
            square = self._pressure_term(name) ** 2
        elif name == name2 and name in self.uk2_profiles:
            # concentration scatter: auto term carries <u^2>
            square = ((self.ms[None, :, None] / self.rho_matter_z(0.0)) ** 2
                      * self.uk2_profiles[name])
        else:
            square = self._term(name) * self._term(name2)
        integrand = self.nzm[..., None] * square
        w = trapz_weights(self.ms)
        integral = np.einsum("zmk,m->zk", integrand, w)
        damping = 1.0 - np.exp(-((self.ks / self.p["kstar_damping"]) ** 2))
        return integral * damping[None, :]

    def _2halo_leg(self, name):
        w = trapz_weights(self.ms)
        term = self._term(name)
        weighted = self.nzm[..., None] * self.bh[..., None]
        integral = np.einsum("zmk,m->zk", weighted * term, w)
        if name in self.pk_profiles:
            return integral, np.zeros_like(integral), 0.0
        term0 = self._term(name, lowklim=True)
        consistency = np.einsum("zmk,m->zk", weighted * term0, w)
        if name in self.hods:
            b = self.hods[name]["bg"][:, None]
        else:
            b = 1.0
        return integral, consistency, b

    def _2halo_leg_fnl(self, name):
        """(b-1)-weighted leg for the fNL scale-dependent bias (explicit
        per-(z,k) loops; independent of models/power._leg_fnl)."""
        w = trapz_weights(self.ms)
        term = self._term(name)
        out_i = np.empty((self.zs.size, self.ks.size))
        out_c = np.empty_like(out_i)
        term0 = np.broadcast_to(self._term(name, lowklim=True), term.shape)
        for iz in range(self.zs.size):
            wb = self.nzm[iz] * (self.bh[iz] - 1.0)
            for ik in range(self.ks.size):
                out_i[iz, ik] = np.dot(wb * term[iz, :, ik], w)
                out_c[iz, ik] = np.dot(wb * term0[iz, :, ik], w)
        if name in self.pk_profiles:
            return out_i, np.zeros_like(out_i), 0.0
        if name in self.hods:
            return out_i, out_c, self.hods[name]["bg"][:, None] - 1.0
        return out_i, out_c, 0.0

    def alpha_fnl(self, zs, ks):
        """2 k^2 T(k) D_anorm(z) / (3 Om H0^2) on the (nz, nk) grid."""
        D = self.d_growth(1.0 / (1.0 + np.atleast_1d(zs)), norm="anorm")
        h0 = self.hubble_parameter(0.0) / 299792.458  # 1/Mpc
        Tk = self.transfer(ks, "eisenhu_osc")
        return (2.0 * np.asarray(ks) ** 2 * Tk)[None, :] / (
            3.0 * self.omm0 * h0**2) * np.atleast_1d(D)[:, None]

    def get_power_2halo(self, name="nfw", name2=None, b1_in=None, b2_in=None,
                        fnl=None, deltac=1.42):
        name2 = name if name2 is None else name2
        i1, c1, b1 = self._2halo_leg(name)
        i2, c2, b2 = self._2halo_leg(name2)
        if b1_in is not None:
            b1 = np.asarray(b1_in).reshape(-1, 1)
        if b2_in is not None:
            b2 = np.asarray(b2_in).reshape(-1, 1)
        e1 = i1 + b1 - c1
        e2 = i2 + b2 - c2
        if fnl is not None:
            pref = 2.0 * fnl * deltac / self.alpha_fnl(self.zs, self.ks)
            if1, cf1, bf1 = self._2halo_leg_fnl(name)
            if2, cf2, bf2 = self._2halo_leg_fnl(name2)
            e1 = e1 + pref * (if1 + bf1 - cf1)
            e2 = e2 + pref * (if2 + bf2 - cf2)
        return self.Pzk * e1 * e2

    def get_power(self, name="nfw", name2=None, b1=None, b2=None):
        return (self.get_power_1halo(name, name2)
                + self.get_power_2halo(name, name2, b1, b2))
