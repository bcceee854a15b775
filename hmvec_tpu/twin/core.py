"""Float64 numpy twin: background + EH transfer + linear power + sigma^2.

Independent implementation of the same math as hmvec_tpu.models.* (written
against the published formulas; structured like the reference pipeline,
hmvec/cosmology.py).  Used as the parity oracle in tests and as the CPU
"numpy reference" baseline in bench.py.
"""

from __future__ import annotations

import numpy as np
from scipy.special import hyp2f1

from ..utils.weights import simpson_weights, gauss_legendre
from ..params import merge_params

CSPEED_KMS = 299792.458
_HZ_TO_SI = 3.241e-20
_G_SI = 6.67259e-11
_RHO_SI_TO_MSUN_MPC3 = 1.477543e37
# pre-folded rho_crit factor (same spec as models/background.py)
_RHO_CRIT_FACTOR = (3.0 * _HZ_TO_SI**2 / (8.0 * np.pi * _G_SI)
                    * _RHO_SI_TO_MSUN_MPC3)

_GL_NODES, _GL_WEIGHTS = gauss_legendre(128)


class TwinCosmology:
    def __init__(self, params=None, include_radiation=True):
        self.p = merge_params(params)
        h = self.p["H0"] / 100.0
        omch2 = self.p["omch2"]
        if self.p.get("omm") is not None:
            omch2 = self.p["omm"] * h**2 - self.p["ombh2"]
        self.omch2 = omch2
        self.ombh2 = self.p["ombh2"]
        self.h = h
        self.H0 = self.p["H0"]
        self.omm0 = (omch2 + self.ombh2) / h**2
        self.omk0 = self.p["omk"]
        self.oml0 = 1.0 - self.omm0 - self.omk0
        self.omr0 = (2.47282e-5 * (1.0 + 0.2271 * self.p["nnu"]) / h**2
                     if include_radiation else 0.0)
        self.omnu0 = self.p["mnu"] / 93.14 / h**2
        self.as8 = self.p.get("as8", 1.0)
        self.ns = self.p["ns"]
        self.As = self.p["As"]
        self.w0 = self.p["w0"]
        self.wa = self.p["wa"]
        self.t_cmb_k = 2.7255

    # ---- background ----
    def e_of_z(self, z):
        zp1 = 1.0 + np.asarray(z, dtype=np.float64)
        de = zp1 ** (3.0 * (1.0 + self.w0 + self.wa)) * np.exp(
            -3.0 * self.wa * (1.0 - 1.0 / zp1))
        e2 = (self.omr0 * zp1**4 + (self.omm0 + self.omnu0) * zp1**3
              + self.omk0 * zp1**2 + self.oml0 * de)
        return np.sqrt(e2)

    def hubble_parameter(self, z):
        return self.H0 * self.e_of_z(z)

    def h_of_z(self, z):
        return self.hubble_parameter(z) / CSPEED_KMS

    def comoving_radial_distance(self, z):
        z = np.asarray(z, dtype=np.float64)
        zz = z[..., None] * _GL_NODES
        integrand = 1.0 / self.e_of_z(zz)
        return (CSPEED_KMS / self.H0) * z * (integrand @ _GL_WEIGHTS)

    def redshift_at_comoving_radial_distance(self, chi, zmax=1e4,
                                             num_iter=80):
        """Invert chi(z) by the same fixed-count bisection as the jax side
        (models/background.py:219-234; reference cosmology.py:713-730)."""
        chi = np.asarray(chi, dtype=np.float64)
        lo = np.zeros_like(chi)
        hi = np.full_like(chi, zmax)
        for _ in range(num_iter):
            mid = (lo + hi) / 2.0
            too_far = self.comoving_radial_distance(mid) > chi
            lo = np.where(too_far, lo, mid)
            hi = np.where(too_far, mid, hi)
        return (lo + hi) / 2.0

    def _sk(self, chi):
        k = -self.omk0 * (self.H0 / CSPEED_KMS) ** 2
        if k > 1e-12:
            sk = np.sqrt(k)
            return np.sin(sk * chi) / sk
        if k < -1e-12:
            sk = np.sqrt(-k)
            return np.sinh(sk * chi) / sk
        return chi

    def angular_diameter_distance(self, z1, z2=None):
        if z2 is None:
            return self._sk(self.comoving_radial_distance(z1)) / (1.0 + np.asarray(z1))
        chi1 = self.comoving_radial_distance(z1)
        chi2 = self.comoving_radial_distance(z2)
        return self._sk(chi2 - chi1) / (1.0 + np.asarray(z2))

    def sigma_crit(self, zlens, zsource):
        Gval = 4.517e-48
        cval = 9.716e-15
        Dd = self.angular_diameter_distance(zlens)
        Ds = self.angular_diameter_distance(zsource)
        Dds = self.angular_diameter_distance(zlens, zsource)
        return cval**2 * Ds / 4.0 / np.pi / Gval / Dd / Dds

    def rho_critical_z(self, z):
        return self.hubble_parameter(z) ** 2 * _RHO_CRIT_FACTOR

    def rho_matter_z(self, z):
        return self.rho_critical_z(0.0) * self.omm0 * (1.0 + np.asarray(z)) ** 3

    def omz(self, z):
        return self.rho_matter_z(z) / self.rho_critical_z(z)

    # ---- growth ----
    def _is_lcdm(self):
        return self.w0 == -1.0 and self.wa == 0.0

    def _growth_ode_sol(self):
        """Growing-mode D(a) for general (w0, wa): scipy solve_ivp on
        D'' + (3/a + E'/E) D' = (3/2) (omm0 a^-3 / E^2) D / a^2, integrated
        in a (an independent formulation from the jax side's RK4 in ln a of
        g = D/a; models/background.py growth_table).  Same reduced
        background as Heath: matter + curvature + DE, no radiation."""
        if getattr(self, "_growth_sol", None) is not None:
            return self._growth_sol
        from scipy.integrate import solve_ivp
        omm, omk, oml = self.omm0, self.omk0, self.oml0
        w0, wa = self.w0, self.wa

        def rhs(a, y):
            D, Dp = y
            fde = a ** (-3.0 * (1.0 + w0 + wa)) * np.exp(-3.0 * wa * (1.0 - a))
            e2 = omm * a**-3 + omk * a**-2 + oml * fde
            de2 = (-3.0 * omm * a**-4 - 2.0 * omk * a**-3
                   + oml * fde * (-3.0 * (1.0 + w0 + wa) / a + 3.0 * wa))
            hh = 0.5 * de2 / e2          # E'/E
            om_a = omm * a**-3 / e2
            return [Dp, -(3.0 / a + hh) * Dp + 1.5 * om_a * D / a**2]

        a0 = 1e-4
        sol = solve_ivp(rhs, (a0, 1.0), [a0, 1.0], rtol=1e-11, atol=1e-14,
                        dense_output=True, method="RK45")
        assert sol.success
        self._growth_sol = sol
        return sol

    def _growth_D_at(self, a_end, w0, wa):
        """Growing mode D(a_end) for given constant-CPL (w0, wa), MD
        initial conditions D = a at a = 1e-4 (independent solve_ivp
        integration in a; mirror of background.growth_dolag_ratio's
        per-model halves)."""
        from scipy.integrate import solve_ivp
        omm, omk, oml = self.omm0, self.omk0, self.oml0

        def rhs(a, y):
            D, Dp = y
            fde = a ** (-3.0 * (1.0 + w0 + wa)) * np.exp(
                -3.0 * wa * (1.0 - a))
            e2 = omm * a**-3 + omk * a**-2 + oml * fde
            de2 = (-3.0 * omm * a**-4 - 2.0 * omk * a**-3
                   + oml * fde * (-3.0 * (1.0 + w0 + wa) / a + 3.0 * wa))
            hh = 0.5 * de2 / e2
            om_a = omm * a**-3 / e2
            return [Dp, -(3.0 / a + hh) * Dp + 1.5 * om_a * D / a**2]

        sol = solve_ivp(rhs, (1e-4, a_end), [1e-4, 1.0],
                        rtol=1e-11, atol=1e-14)
        assert sol.success
        return float(sol.y[0, -1])

    def dolag_ratio(self, a_inf=10.0):
        """Dolag-2004 factor D_w(a_inf)/D_LCDM(a_inf); 1 for LCDM."""
        if self._is_lcdm():
            return 1.0
        return (self._growth_D_at(a_inf, self.w0, self.wa)
                / self._growth_D_at(a_inf, -1.0, 0.0))

    def growth_unnormalized(self, a):
        a = np.asarray(a, dtype=np.float64)
        if self._is_lcdm():
            x3 = ((self.oml0 / self.omm0) ** (1.0 / 3.0) * a) ** 3
            return np.sqrt(1.0 + x3) * hyp2f1(5.0 / 6.0, 1.5, 11.0 / 6.0, -x3) * a
        sol = self._growth_ode_sol()
        flat = np.ravel(a)
        D = sol.sol(np.clip(flat, 1e-4, 1.0))[0]
        D = np.where(flat < 1e-4, flat * (float(sol.sol(1e-4)[0]) / 1e-4), D)
        return D.reshape(np.shape(a)) if np.ndim(a) else float(D[0])

    def d_growth(self, a, norm="anorm"):
        d1 = self.growth_unnormalized(1.0)
        val = self.growth_unnormalized(a) / d1
        return val if norm == "z0norm" else val * d1

    def growth_rate_f(self, z):
        """dlnD/dlna: closed-form 2F1 derivative identity (LCDM), or
        a D'/D from the ODE solution (w0/wa)."""
        z = np.atleast_1d(np.asarray(z, dtype=np.float64))
        a = 1.0 / (1.0 + z)
        if not self._is_lcdm():
            sol = self._growth_ode_sol()
            D, Dp = sol.sol(np.clip(a, 1e-4, 1.0))
            return a * Dp / D
        x3 = ((self.oml0 / self.omm0) ** (1.0 / 3.0) * a) ** 3
        F = hyp2f1(5.0 / 6.0, 1.5, 11.0 / 6.0, -x3)
        dF = (5.0 / 6.0 * 1.5 / (11.0 / 6.0)) * hyp2f1(11.0 / 6.0, 2.5, 17.0 / 6.0, -x3)
        # dlnD/dlna = 1 + (3/2) x3/(1+x3) - 3 x3 dF/F
        return 1.0 + 1.5 * x3 / (1.0 + x3) - 3.0 * x3 * dF / F

    # ---- transfer & linear power ----
    def transfer(self, ks, kind="eisenhu_osc"):
        h = self.h
        k = np.asarray(ks, dtype=np.float64) / h
        w_m = self.omch2 + self.ombh2
        w_b = self.ombh2
        # the reference hardcodes 2.726 K inside Tk (cosmology.py:410),
        # distinct from CAMB's 2.7255 K background
        t27_sq = (2.726 / 2.7) ** 2
        k_eq = 7.46e-2 * w_m / t27_sq / h
        z_eq = 2.50e4 * w_m / t27_sq**2
        b1 = 0.313 * w_m**-0.419 * (1.0 + 0.607 * w_m**0.674)
        b2 = 0.238 * w_m**0.223
        z_d = 1291.0 * w_m**0.251 / (1.0 + 0.659 * w_m**0.828) * (1.0 + b1 * w_b**b2)
        r_d = 31.5 * w_b / t27_sq**2 * (1.0e3 / z_d)
        r_eq = 31.5 * w_b / t27_sq**2 * (1.0e3 / z_eq)
        sh_d = (2.0 / (3.0 * k_eq) * np.sqrt(6.0 / r_eq)
                * np.log((np.sqrt(1.0 + r_d) + np.sqrt(r_eq + r_d))
                         / (1.0 + np.sqrt(r_eq))))
        k_silk = 1.6 * w_b**0.52 * w_m**0.73 * (1.0 + (10.4 * w_m) ** -0.95) / h
        fb = w_b / w_m
        fc = self.omch2 / w_m

        if kind == "eisenhu":
            alpha_gamma = (1.0 - 0.328 * np.log(431.0 * w_m) * w_b / w_m
                           + 0.38 * np.log(22.3 * w_m) * fb**2)
            gamma_eff = self.omm0 * h * (
                alpha_gamma + (1.0 - alpha_gamma) / (1.0 + (0.43 * k * sh_d) ** 4))
            q = k * t27_sq / gamma_eff
            L = np.log(2.0 * np.e + 1.8 * q)
            C = 14.2 + 731.0 / (1.0 + 62.5 * q)
            return L / (L + C * q * q)

        a1 = (46.9 * w_m) ** 0.670 * (1.0 + (32.1 * w_m) ** -0.532)
        a2 = (12.0 * w_m) ** 0.424 * (1.0 + (45.0 * w_m) ** -0.582)
        alpha_c = a1**-fb * a2 ** (-(fb**3))
        b1c = 0.944 / (1.0 + (458.0 * w_m) ** -0.708)
        b2c = (0.395 * w_m) ** -0.0266
        beta_c = 1.0 / (1.0 + b1c * (fc**b2c - 1.0))

        def t_tilde(k1, alpha, beta):
            q = k1 / (13.41 * k_eq)
            L = np.log(np.e + 1.8 * beta * q)
            C = 14.2 / alpha + 386.0 / (1.0 + 69.9 * q**1.08)
            return L / (L + C * q * q)

        f = 1.0 / (1.0 + (k * sh_d / 5.4) ** 4)
        tc = f * t_tilde(k, 1.0, beta_c) + (1.0 - f) * t_tilde(k, alpha_c, beta_c)
        y = (1.0 + z_eq) / (1.0 + z_d)
        x = np.sqrt(1.0 + y)
        g_eh = y * (-6.0 * x + (2.0 + 3.0 * y) * np.log((x + 1.0) / (x - 1.0)))
        alpha_b = 2.07 * k_eq * sh_d * (1.0 + r_d) ** -0.75 * g_eh
        beta_node = 8.41 * w_m**0.435
        tilde_s = sh_d / (1.0 + (beta_node / (k * sh_d)) ** 3) ** (1.0 / 3.0)
        beta_b = 0.5 + fb + (3.0 - 2.0 * fb) * np.sqrt((17.2 * w_m) ** 2 + 1.0)
        tb = (t_tilde(k, 1.0, 1.0) / (1.0 + (k * sh_d / 5.2) ** 2)
              + alpha_b / (1.0 + (beta_b / (k * sh_d)) ** 3)
              * np.exp(-((k / k_silk) ** 1.4))) * np.sinc(k * tilde_s / np.pi)
        return fb * tb + fc * tc

    def eh99_neutrino_ratio(self, ks, d_anorm, component="total"):
        """(nz, nk) ratio R with P_mnu = R^2 * P_EH98 -- independent mirror
        of models/transfer.eh99_neutrino_ratio (EH99, astro-ph/9710252,
        equation numbers inline)."""
        h = self.h
        t27_sq = (2.726 / 2.7) ** 2
        w_b = self.ombh2
        w_nu = self.omnu0 * h**2
        w_m = self.omch2 + w_b + w_nu
        f_nu = w_nu / w_m
        if f_nu <= 1e-7:
            return np.ones((np.atleast_1d(d_anorm).size, np.asarray(ks).size))
        f_b = w_b / w_m
        f_c = 1.0 - f_nu - f_b
        f_cb = f_c + f_b
        nnu_m = float(self.p.get("num_massive_neutrinos", 3))
        k = np.asarray(ks, dtype=np.float64)

        z_eq = 2.50e4 * w_m / t27_sq**2                        # eq (1)
        b1 = 0.313 * w_m**-0.419 * (1.0 + 0.607 * w_m**0.674)
        b2 = 0.238 * w_m**0.223
        z_d = (1291.0 * w_m**0.251 / (1.0 + 0.659 * w_m**0.828)
               * (1.0 + b1 * w_b**b2))                         # eq (2)
        y_d = (1.0 + z_eq) / (1.0 + z_d)                       # eq (3)
        s_mpc = (44.5 * np.log(9.83 / w_m)
                 / np.sqrt(1.0 + 10.0 * w_b**0.75))            # eq (4)
        q = k * t27_sq / w_m                                   # eq (5)

        p_of = lambda f: 0.25 * (5.0 - np.sqrt(1.0 + 24.0 * f))  # eq (11)

        def alpha_of(p_c, p_cb, fr):                           # eq (15)
            return (fr * (5.0 - 2.0 * (p_c + p_cb)) / (5.0 - 4.0 * p_cb)
                    * (1.0 + y_d) ** (p_cb - p_c)
                    * (1.0 + 0.5 * (p_c - p_cb)
                       * (1.0 + 1.0 / ((3.0 - 4.0 * p_c)
                                       * (7.0 - 4.0 * p_cb)))
                       / (1.0 + y_d)))

        def tsup_of(alpha_nu, beta_c):                         # eqs (16-20)
            sqa = np.sqrt(alpha_nu)
            gamma_eff = w_m * (sqa + (1.0 - sqa)
                               / (1.0 + (0.43 * k * s_mpc) ** 4))
            q_eff = k * t27_sq / gamma_eff
            L = np.log(np.e + 1.84 * beta_c * sqa * q_eff)
            C = 14.4 + 325.0 / (1.0 + 60.5 * q_eff**1.11)
            return L / (L + C * q_eff**2)

        d1 = (1.0 + z_eq) * np.atleast_1d(np.asarray(d_anorm))

        p_c = p_of(f_c)
        p_cb = p_of(f_cb)
        tsup = tsup_of(alpha_of(p_c, p_cb, f_c / f_cb),
                       1.0 / (1.0 - 0.949 * (f_nu + f_b)))
        q_nu = 3.92 * q * np.sqrt(nnu_m) / f_nu                # eq (23)
        Bk = 1.0 + (1.24 * f_nu**0.64 * nnu_m ** (0.3 + 0.6 * f_nu)
                    / (q_nu**-1.6 + q_nu**0.8))                # eq (22)
        y_fs = (17.2 * f_nu * (1.0 + 0.488 * f_nu ** (-7.0 / 6.0))
                * (nnu_m * q / f_nu) ** 2)                     # eq (14)
        dfs = (d1[:, None] / (1.0 + y_fs[None, :])) ** 0.7
        if component == "cb":
            d_cbnu = ((1.0 + dfs) ** (p_cb / 0.7)
                      * d1[:, None] ** (1.0 - p_cb))           # eq (12)
        else:
            d_cbnu = ((f_cb ** (0.7 / p_cb) + dfs) ** (p_cb / 0.7)
                      * d1[:, None] ** (1.0 - p_cb))           # eq (13)

        f_c0 = 1.0 - f_b
        tsup0 = tsup_of(alpha_of(p_of(f_c0), 0.0, f_c0),
                        1.0 / (1.0 - 0.949 * f_b))
        return (tsup * Bk)[None, :] / tsup0[None, :] * (d_cbnu / d1[:, None])

    def plin_approx(self, zs, ks, kind="eisenhu_osc", component="total"):
        zs = np.atleast_1d(np.asarray(zs, dtype=np.float64))
        ks = np.asarray(ks, dtype=np.float64)
        tk = self.transfer(ks, kind)[None, :]
        dz = self.d_growth(1.0 / (1.0 + zs), norm="anorm")[:, None]
        omh2 = (self.omch2 + self.ombh2) * 100.0**2 + self.omnu0 * self.H0**2
        kfacts = (ks / self.p["pivot_scalar"]) ** (self.ns - 1.0) * ks
        pref = self.As * (8.0 * np.pi**2 * CSPEED_KMS**4 / 25.0) / omh2**2
        p = pref * kfacts[None, :] * dz**2 * tk**2
        if self.omnu0 > 0.0:
            p = p * self.eh99_neutrino_ratio(ks, dz[:, 0],
                                             component=component) ** 2
        return p

    def plin(self, zs, ks, accuracy="medium", component="total"):
        p = self.plin_approx(zs, ks, component=component)
        if accuracy != "low":
            p = self.as8**2 * p
        return p

    def Wkr(self, k, R, taylor_switch=None):
        if taylor_switch is None:
            taylor_switch = self.p["Wkr_taylor_switch"]
        kR = k * R
        with np.errstate(invalid="ignore", divide="ignore"):
            ans = 3.0 * (np.sin(kR) - kR * np.cos(kR)) / kR**3
        xx = kR * kR
        taylor = 1.0 - 0.1 * xx + 0.00357142857143 * xx * xx
        return np.where(kR < taylor_switch, taylor, ans)

    def sigma2_R(self, R_m, zs):
        ks = np.geomspace(self.p["sigma2_kmin"], self.p["sigma2_kmax"],
                          self.p["sigma2_numks"])
        kw = simpson_weights(ks) * ks**2 / (2.0 * np.pi**2)
        spzk = self.plin(zs, ks)                      # (nz, nk)
        W2 = self.Wkr(ks[None, :], np.asarray(R_m)[:, None]) ** 2  # (nm, nk)
        lhs = spzk * kw[None, :]
        return lhs @ W2.T
