"""User-facing HaloModel mirroring the reference API (hmvec/hmvec.py:75).

Stateful convenience wrapper over the pure staged functions; every array it
stores is a jnp array, so downstream code can jit/grad through method calls.
For the fully-fused single-jit pipeline used by the benchmark and the graft
entry, see hmvec_tpu.pipeline.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

import jax

from ..params import battaglia_defaults, scoped_override
from ..ops.sine_transform import generic_profile_fft
from .cosmology import Cosmology
from . import mass_function as mfm
from . import profiles as prof
from . import power as pwr
from .hod import build_hod
from .mass_conversion import mdelta_from_mdelta

# jitted entry points for the chunky class-API stages: the eager flow
# dispatches op-by-op (slow on CPU from 4M-element temporaries per op,
# ~23 ms/op over the TPU tunnel); these compile once per grid shape and
# are reused across instances in-process
_nfw_uk_analytic_j = jax.jit(prof.nfw_uk_analytic)
_mdelta_j = jax.jit(mdelta_from_mdelta)
_massfn_j = jax.jit(
    lambda sigma2, zs, ms, rho_m0, mode, pnum, delta: mfm.mass_function_grid(
        sigma2, zs, ms, rho_m0, mode, pnum, delta),
    static_argnames="mode")


def _numeric_params(p):
    return {k: v for k, v in p.items() if isinstance(v, (int, float))}

_HOD_PARAM_KEYS = [
    "hod_sig_log_mstellar", "hod_bisection_search_min_log10mthresh",
    "hod_bisection_search_max_log10mthresh", "hod_bisection_num_iter",
    "hod_alphasat", "hod_Bsat", "hod_betasat", "hod_Bcut", "hod_betacut",
    "hod_A_log10mthresh", "hod_Msat_override", "hod_Mcut_override",
    "hod_zheng_log10Mmin", "hod_zheng_siglogm", "hod_zheng_log10M0",
    "hod_zheng_log10M1", "hod_zheng_alpha",
]


class HaloModel(Cosmology):
    def __init__(self, zs, ks, ms=None, params=None,
                 mass_function="sheth-torman", halofit=None, mdef="vir",
                 nfw_numeric=False, skip_nfw=False, accuracy="medium",
                 engine="eh", pk_table=None, cls_table=None,
                 concmode="duffy", tinker_delta=None, engine_opts=None):
        super().__init__(params=params, halofit=halofit, engine=engine,
                         accuracy=accuracy, pk_table=pk_table,
                         cls_table=cls_table, engine_opts=engine_opts)
        self.zs = jnp.asarray(zs)
        self.ks = jnp.asarray(ks)
        self.mdef = mdef
        self.mode = mass_function
        self.concmode = concmode
        # Tinker overdensity (EXTENSION: the reference clamps delta = 200,
        # tinker.py:51,71).  None -> the reference's 200; a number -> that
        # Delta wrt mean matter density; "auto" -> the mdef's own
        # overdensity (Delta_v(z)/Omega_m(z) for 'vir', 200 for 'mean').
        self.tinker_delta = tinker_delta
        self.hods: dict = {}
        self.uk_profiles: dict = {}
        self.uk2_profiles: dict = {}   # <u^2> for c-scatter profiles
        self.pk_profiles: dict = {}
        self.cib_tracers: dict = {}

        # linear power on the target grid (reference hmvec.py:96-102)
        if accuracy == "low":
            self.Pzk = self.P_lin_approx(self.ks, self.zs)
        else:
            self.Pzk = self._get_matter_power(self.zs, self.ks, nonlinear=False)
        if halofit is not None:
            self.nPzk = self._get_matter_power(self.zs, self.ks, nonlinear=True)

        if ms is not None:
            self.ms = jnp.asarray(ms)
            self.init_mass_function(self.ms)
        if not skip_nfw:
            self.add_nfw_profile("nfw", numeric=nfw_numeric)

    # ---- virial definitions (hmvec.py:105-118) ----
    def deltav(self, z):
        return mfm.deltav_bryan_norman(self.omz(z))

    def rvir(self, m, z):
        if self.mdef == "vir":
            return mfm.R_from_M(m, self.rho_critical_z(z), self.deltav(z))
        if self.mdef == "mean":
            return mfm.R_from_M(m, self.rho_matter_z(z), 200.0)
        raise ValueError(self.mdef)

    def R_of_m(self, ms):
        return mfm.R_from_M(ms, self.rho_matter_z(0.0), delta=1.0)

    # ---- mass function (hmvec.py:121-161) ----
    def get_sigma2(self):
        return self.get_sigma2_R(self.R_of_m(self.ms), self.zs)

    def _tinker_delta_grid(self):
        """Resolve the ctor's ``tinker_delta`` option to the overdensity
        (wrt mean matter density) fed to the Tinker mass function."""
        td = self.tinker_delta
        if td is None:
            return 200.0                     # reference behavior (tinker.py:51)
        if isinstance(td, str):
            if td != "auto":
                raise ValueError(f"tinker_delta: {td!r}")
            if self.mdef == "vir":
                # Bryan-Norman Delta_v is wrt critical; Tinker tables are
                # wrt mean -> divide by Omega_m(z)
                return self.deltav(self.zs) / self.omz(self.zs)
            return 200.0
        return td

    def init_mass_function(self, ms):
        self.ms = jnp.asarray(ms)
        self.sigma2 = self.get_sigma2()
        self.nzm, self.bh = _massfn_j(
            self.sigma2, self.zs, self.ms, self.rho_matter_z(0.0),
            self.mode, _numeric_params(self.p),
            jnp.asarray(self._tinker_delta_grid()))

    def get_nzm(self):
        return self.nzm

    def get_bh(self):
        return self.bh

    def concentration(self, mode=None):
        """c(z,m) grid.  mode 'duffy' (reference default, hmvec.py:163-176)
        or 'bhattacharya' (Bhattacharya+13 nu-based fits; extension -- the
        reference raises NotImplementedError for anything non-Duffy).
        Defaults to the ctor's ``concmode`` so every profile builder picks
        the family up automatically."""
        if mode is None:
            mode = self.concmode
        if mode == "duffy":
            return prof.concentration_duffy(self.ms, self.zs, self.mdef,
                                            self.p, self.h)
        if mode == "bhattacharya":
            d = self.D_growth(1.0 / (1.0 + self.zs), type="z0norm")
            return prof.concentration_bhattacharya(self.sigma2, d, self.mdef)
        raise NotImplementedError(mode)

    # ---- profiles ----
    def add_nfw_profile(self, name, numeric=False, nxs=None, xmax=None,
                        ignore_existing=False, fast=False,
                        conc_scatter=None):
        """Analytic (Si/Ci) or numeric (sine-DFT) NFW u(k|m,z)
        (reference: hmvec.py:318-355).

        ``fast=True`` uses the fused f32 Pallas kernel
        (ops/pallas_kernels.nfw_uk_fast): ~5x faster on TPU at ~7e-6
        absolute accuracy -- for sampling loops where the f64 gate is not
        needed.

        ``conc_scatter`` (EXTENSION -- no reference analogue): lognormal
        scatter sigma_lnc of c at fixed mass.  Registers <u> as the
        profile (correct for 2-halo legs and crosses) and <u^2> for the
        1-halo auto term (profiles.nfw_uk_scatter)."""
        if not ignore_existing:
            assert name not in self.uk_profiles, "Profile name already exists."
        if nxs is None:
            nxs = self.p["nfw_integral_numxs"]
        if xmax is None:
            xmax = self.p["nfw_integral_xmax"]
        cs = self.concentration()
        rvirs = self.rvir(self.ms[None, :], self.zs[:, None])
        rss = rvirs / cs
        if conc_scatter is not None:
            if numeric or fast:
                raise ValueError("conc_scatter supports the analytic path")
            uk, uk2 = prof.nfw_uk_scatter(self.ks, self.zs, cs, rvirs,
                                          conc_scatter)
            self.uk_profiles[name] = uk
            self.uk2_profiles[name] = uk2
            return self.ks, uk
        if numeric:
            _, uk = generic_profile_fft(
                lambda x: prof.rho_nfw_x(x, rhoscale=1.0)[None, None, :],
                cs, rss, self.zs, self.ks, xmax, nxs)
        elif fast:
            from ..ops.pallas_kernels import nfw_uk_fast
            uk = nfw_uk_fast(self.ks, self.zs, cs, rss).astype(self.Pzk.dtype)
        else:
            uk = _nfw_uk_analytic_j(self.ks, self.zs, cs, rss)
        self.uk_profiles[name] = uk
        self.uk2_profiles.pop(name, None)  # re-registration drops scatter
        return self.ks, uk

    def add_einasto_profile(self, name, alpha=0.18, nxs=None, xmax=None,
                            ignore_existing=False):
        """Einasto u(k|m,z) via the batched sine-DFT transform (extension:
        the reference supports only NFW + Battaglia profiles).

        Same conventions as the numeric NFW path (hmvec.py:318-355 /
        fft.py:56-115): r_s = r_vir/c with the instance's concentration
        family, truncation at r_vir, trapz mass normalization so
        u(k->0) = 1.
        """
        if not ignore_existing:
            assert name not in self.uk_profiles, "Profile name already exists."
        if nxs is None:
            nxs = self.p["nfw_integral_numxs"]
        if xmax is None:
            xmax = self.p["nfw_integral_xmax"]
        cs = self.concentration()
        rvirs = self.rvir(self.ms[None, :], self.zs[:, None])
        rss = rvirs / cs
        _, uk = generic_profile_fft(
            lambda x: prof.rho_einasto_x(x, alpha=alpha)[None, None, :],
            cs, rss, self.zs, self.ks, xmax, nxs)
        self.uk_profiles[name] = uk
        self.uk2_profiles.pop(name, None)
        return self.ks, uk

    def _m200critz(self):
        """Convert self.ms to M200(rho_crit(z)) and R200 (hmvec.py:215-226)."""
        rhocritz = self.rho_critical_z(self.zs)
        if self.mdef == "vir":
            delta_rhos1 = rhocritz * self.deltav(self.zs)
        else:
            delta_rhos1 = self.rho_matter_z(self.zs) * 200.0
        cs = self.concentration()
        delta_rhos2 = 200.0 * rhocritz
        m200 = _mdelta_j(self.ms, cs, delta_rhos1, delta_rhos2)
        r200 = mfm.R_from_M(m200, rhocritz[:, None], delta=200.0)
        return m200, r200, rhocritz

    def add_battaglia_profile(self, name, family=None, param_override=None,
                              nxs=None, xmax=None, ignore_existing=False):
        """Battaglia 2016 gas density profile -> u(k) (hmvec.py:188-250)."""
        if not ignore_existing:
            assert name not in self.uk_profiles, "Profile name already exists."
        assert name != "nfw", "Name nfw is reserved."
        if nxs is None:
            nxs = self.p["electron_density_profile_integral_numxs"]
        if xmax is None:
            xmax = self.p["electron_density_profile_integral_xmax"]
        if family is None:
            family = self.p["battaglia_gas_family"]
        pparams = {"battaglia_gas_gamma": self.p["battaglia_gas_gamma"]}
        pparams.update(battaglia_defaults[family])
        pparams = scoped_override(
            pparams, param_override,
            set(pparams) | set(battaglia_defaults[family]), strict=False)

        m200, r200, rhocritz = self._m200critz()
        rvirs = self.rvir(self.ms[None, :], self.zs[:, None])
        omb = self.p["ombh2"] / self.h**2
        omm = self.omm0

        def rhofunc(xs):
            return prof.rho_gas_x(
                xs[None, None, :], m200[..., None],
                self.zs[:, None, None], omb, omm, rhocritz[:, None, None],
                pparams["battaglia_gas_gamma"], pparams)

        rgs = r200 / 2.0  # x = r/(R200/2) (hmvec.py:228-249)
        cgs = rvirs / rgs
        _, uk = generic_profile_fft(rhofunc, cgs, rgs, self.zs, self.ks,
                                    xmax, nxs)
        self.uk_profiles[name] = uk
        self.uk2_profiles.pop(name, None)
        return self.ks, uk

    def add_battaglia_pres_profile(self, name, family=None,
                                   param_override=None, nxs=None, xmax=None,
                                   ignore_existing=False):
        """Battaglia pressure profile -> y-weighted p(k) (hmvec.py:252-316)."""
        if not ignore_existing:
            assert name not in self.pk_profiles, "Profile name already exists."
        assert name != "nfw", "Name nfw is reserved."
        if nxs is None:
            nxs = self.p["electron_pressure_profile_integral_numxs"]
        if xmax is None:
            xmax = self.p["electron_pressure_profile_integral_xmax"]
        if family is None:
            family = self.p["battaglia_pres_family"]
        pparams = {"battaglia_pres_gamma": self.p["battaglia_pres_gamma"],
                   "battaglia_pres_alpha": self.p["battaglia_pres_alpha"]}
        pparams.update(battaglia_defaults[family])
        pparams = scoped_override(
            pparams, param_override,
            set(pparams) | set(battaglia_defaults[family]), strict=False)

        m200, r200, rhocritz = self._m200critz()
        rvirs = self.rvir(self.ms[None, :], self.zs[:, None])
        omb = self.p["ombh2"] / self.h**2
        omm = self.omm0

        def presfunc(xs):
            return prof.pressure_x(
                xs[None, None, :], m200[..., None], r200[..., None],
                self.zs[:, None, None], omb, omm, rhocritz[:, None, None],
                pparams["battaglia_pres_alpha"],
                pparams["battaglia_pres_gamma"], pparams)

        rgs = r200
        cgs = rvirs / rgs
        _, pk = generic_profile_fft(presfunc, cgs, rgs, self.zs, self.ks,
                                    xmax, nxs, do_mass_norm=False)
        # y-units conversion (hmvec.py:313-316)
        sigmaT = 6.6524587321e-29          # Thomson cross-section, m^2
        mElect = 9.1093837015e-31 / 1.989e30  # electron mass in Msun
        c_SI = 299792458.0
        unit = (4.0 * jnp.pi * (sigmaT / (mElect * c_SI**2))
                * (r200**3 * ((1.0 + self.zs)**2
                              / self.h_of_z(self.zs))[..., None])[..., None])
        self.pk_profiles[name] = pk * unit
        return self.ks, self.pk_profiles[name]

    def get_mean_compton_y(self, family=None, param_override=None,
                           n_x=512):
        """Sky-averaged Compton-y monopole (tSZ mean distortion, the
        COBE/FIRAS observable):

            <y> = int dz int dm n(z, m) u_y(z, m, k -> 0),

        exact in this package's y-profile conventions: u_y(k->0) =
        sigma_T/(m_e c^2) (1+z)^2/H(z) * int 4 pi r^2 P_e dr (physical
        thermal-energy integral) -- the same weights that make
        C_yy = int dz H P_yy / chi^2 (limber.py).  The k->0 limit is
        computed EXACTLY (models/pairwise.compton_y_k0_battaglia); the
        registered FFT profile flat-extrapolates below its output-grid
        floor ~0.3/Mpc (reference fft.py semantics) and would be ~5%
        low.  EXTENSION: the reference computes C_yy but not the
        monopole.  Usual halo-model caveat: the mass/z integration is
        limited to this instance's grid (no diffuse/unbound gas).
        """
        from ..utils.weights import trapz_weights
        from .pairwise import compton_y_k0_battaglia
        if family is None:
            family = self.p["battaglia_pres_family"]
        pparams = {"battaglia_pres_gamma": self.p["battaglia_pres_gamma"],
                   "battaglia_pres_alpha": self.p["battaglia_pres_alpha"]}
        pparams.update(battaglia_defaults[family])
        pparams = scoped_override(
            pparams, param_override,
            set(pparams) | set(battaglia_defaults[family]), strict=False)
        m200, r200, rhocritz = self._m200critz()
        rvirs = self.rvir(self.ms[None, :], self.zs[:, None])
        cmax = rvirs / r200        # pressure x = r/R200, truncated at rvir
        omb = self.p["ombh2"] / self.h**2
        uy0 = compton_y_k0_battaglia(
            self.zs, m200, r200, cmax, rhocritz, omb, self.omm0,
            pparams["battaglia_pres_alpha"],
            pparams["battaglia_pres_gamma"], pparams,
            self.h_of_z(self.zs), n_x=n_x)
        tw_m = jnp.asarray(trapz_weights(np.asarray(self.ms)))
        tw_z = jnp.asarray(trapz_weights(np.asarray(self.zs)))
        return ((self.nzm * uy0) @ tw_m) @ tw_z

    def get_tau_aperture(self, R_ap=None, theta_arcmin=None, family=None,
                         param_override=None, n_x=256):
        """Mean aperture Thomson optical depth tau_bar(z, m) of the
        Battaglia-16 gas density profile (the same profile
        add_battaglia_profile Fourier-transforms, hmvec.py:188-250)
        inside a disk of physical radius ``R_ap`` [Mpc] (scalar or
        per-z), or angular radius ``theta_arcmin`` (R_ap = theta *
        d_A(z)).  EXTENSION: the pairwise-kSZ forecasting ingredient
        (models/pairwise.py)."""
        from .pairwise import tau_aperture_battaglia
        if (R_ap is None) == (theta_arcmin is None):
            raise ValueError("pass exactly one of R_ap / theta_arcmin")
        if family is None:
            family = self.p["battaglia_gas_family"]
        pparams = {"battaglia_gas_gamma": self.p["battaglia_gas_gamma"]}
        pparams.update(battaglia_defaults[family])
        pparams = scoped_override(
            pparams, param_override,
            set(pparams) | set(battaglia_defaults[family]), strict=False)
        m200, r200, rhocritz = self._m200critz()
        rvirs = self.rvir(self.ms[None, :], self.zs[:, None])
        cmax = rvirs / (r200 / 2.0)   # truncate at r = rvir, like the FFT
        if R_ap is None:
            dA = self.angular_diameter_distance(self.zs)
            R_ap = (theta_arcmin * np.pi / (180.0 * 60.0)) * dA
        omb = self.p["ombh2"] / self.h**2
        return tau_aperture_battaglia(
            self.zs, m200, r200, cmax, rhocritz, omb, self.omm0, R_ap,
            pparams["battaglia_gas_gamma"], pparams, n_x=n_x)

    def get_tau_mean_hod(self, hod_name, tau_zm):
        """HOD-weighted sample-mean of a per-halo quantity:
        <q>(z) = int dm n(z,m) (Nc+Ns) q(z,m) / ngal(z)  (the galaxy
        aperture optical depth when q = get_tau_aperture output)."""
        from ..utils.weights import trapz_weights
        h = self.hods[hod_name]
        tw = jnp.asarray(trapz_weights(np.asarray(self.ms)))
        num = (self.nzm * (h["Nc"] + h["Ns"]) * jnp.asarray(tau_zm)) @ tw
        return num / h["ngal"]

    # ---- HOD (hmvec.py:357-466) ----
    def add_hod(self, name, mthresh=None, ngal=None, corr="max",
                satellite_profile_name="nfw", central_profile_name=None,
                ignore_existing=False, param_override=None,
                family="leauthaud"):
        """family: 'leauthaud' (the reference's Behroozi-SMHM threshold
        HOD, hmvec.py:357-466) or 'zheng05' (EXTENSION: the standard
        five-parameter Zheng et al 2005/2007 HOD -- params
        hod_zheng_log10Mmin/siglogm/log10M0/log10M1/alpha; ``ngal``
        solves log10 Mmin, ``mthresh`` is ignored)."""
        if not ignore_existing:
            assert name not in self.uk_profiles, "HOD name already used by profile."
            assert name not in self.hods, "HOD with that name already exists."
        assert satellite_profile_name in self.uk_profiles
        if central_profile_name is not None:
            assert central_profile_name in self.uk_profiles
        hp = {k: self.p[k] for k in _HOD_PARAM_KEYS if k in self.p}
        hp = scoped_override(hp, param_override, set(_HOD_PARAM_KEYS),
                             strict=True)
        if family == "zheng05":
            from .hod import build_hod_zheng05
            grid = build_hod_zheng05(self.zs, self.ms, self.nzm, self.bh,
                                     hp, ngal=ngal, corr=corr)
        elif family == "leauthaud":
            grid = build_hod(self.zs, self.ms, self.nzm, self.bh, hp,
                             mthresh=mthresh, ngal=ngal, corr=corr,
                             Msat_override=hp.get("hod_Msat_override"),
                             Mcut_override=hp.get("hod_Mcut_override"))
        else:
            raise ValueError(f"HOD family {family!r}: supported are "
                             "'leauthaud' (reference) and 'zheng05'")
        self.hods[name] = {
            "Nc": grid.Nc, "Ns": grid.Ns, "NsNsm1": grid.NsNsm1,
            "NcNs": grid.NcNs, "ngal": grid.ngal, "bg": grid.bg,
            "satellite_profile": satellite_profile_name,
            "central_profile": central_profile_name,
            "log10mthresh": grid.log10mthresh,
        }
        return self.hods[name]

    def get_bg(self, Nc, Ns, ngal):
        from ..utils.weights import trapz_weights
        tw = jnp.asarray(trapz_weights(np.asarray(self.ms)))
        return ((self.nzm * (Nc + Ns) * self.bh) @ tw) / ngal

    def get_ngal(self, Nc, Ns):
        from ..utils.weights import trapz_weights
        tw = jnp.asarray(trapz_weights(np.asarray(self.ms)))
        return (self.nzm * (Nc + Ns)) @ tw

    # ---- tracer resolution ----
    def _tracer(self, name):
        if name in self.hods:
            h = self.hods[name]
            uc = (None if h["central_profile"] is None
                  else self.uk_profiles[h["central_profile"]])
            return pwr.HODTracer(
                Nc=h["Nc"], Ns=h["Ns"], NsNsm1=h["NsNsm1"], NcNs=h["NcNs"],
                ngal=h["ngal"], bg=h["bg"],
                us=self.uk_profiles[h["satellite_profile"]], uc=uc,
                us2=self.uk2_profiles.get(h["satellite_profile"]))
        if name in self.uk_profiles:
            return pwr.MatterTracer(uk=self.uk_profiles[name],
                                    uk2=self.uk2_profiles.get(name))
        if name in self.pk_profiles:
            return pwr.PressureTracer(pk=self.pk_profiles[name])
        if name in self.cib_tracers:
            return self.cib_tracers[name]
        raise ValueError(f"Unknown tracer {name!r}")

    # ---- CIB (extension; models/cib.py, Shang et al 2012 forms) ----
    def add_cib_tracer(self, name, nu_ghz, param_override=None,
                       satellite_profile="nfw", ignore_existing=False):
        """Register an emissivity-weighted CIB tracer at an observed
        frequency [GHz].  Satellites follow the named u(k) profile
        (default the analytic NFW); centrals sit at the halo center.
        After this, ``get_power(name, other)`` gives every cross pairing
        (CIB x CIB, CIB x HOD, CIB x pressure, CIB x matter) through the
        generic 1h/2h machinery, and ``get_cib_cls`` projects to C_ell.
        """
        from . import cib as cibm
        if not ignore_existing:
            assert name not in self.cib_tracers, "Tracer name already exists."
        us = self.uk_profiles[satellite_profile]
        self.cib_tracers[name] = cibm.build_cib_tracer(
            self.ms, self.zs, nu_ghz, us, params=param_override,
            us2=self.uk2_profiles.get(satellite_profile))
        return self.cib_tracers[name]

    def get_cib_mean_emissivity(self, name):
        from . import cib as cibm
        return cibm.mean_emissivity(self.nzm, self.ms,
                                    self.cib_tracers[name])

    def get_cib_mean_intensity(self, name):
        from . import cib as cibm
        return cibm.mean_intensity(self.zs, self.h_of_z(self.zs),
                                   self.nzm, self.ms,
                                   self.cib_tracers[name])

    def get_cib_cls(self, ells, name1, name2=None):
        """C_ell of CIB anisotropies (or any pairing where both names are
        tracers registered on this instance): Limber projection
        C = int dchi a(chi)^2 P_jj'(k=(l+1/2)/chi) / chi^2 of the
        emissivity power (in L0^2 units; absolute calibration is a fit
        parameter in every published CIB analysis)."""
        from .limber import limber_integral
        P = self.get_power(name1, name2)
        hzs = self.h_of_z(self.zs)
        chis = self.comoving_radial_distance(self.zs)
        W = (1.0 / (1.0 + self.zs)) / hzs   # limber multiplies by hzs once
        return limber_integral(ells, self.zs, self.ks, P, self.zs,
                               W, W, hzs, chis)

    # ---- HI / 21 cm (extension; models/hi.py, VN18 M_HI form) ----
    def add_hi_tracer(self, name, profile_name="nfw",
                      param_override=None, ignore_existing=False):
        """Register a density-normalized HI tracer (models/hi.py): the
        HI mass follows M_HI(M) inside the named registered profile.
        ``get_power(name, other)`` then gives P_HIHI and every cross
        (HI x matter/HOD/y/CIB) through the generic 1h/2h machinery;
        ``get_p21`` converts to brightness-temperature units."""
        from . import hi as him
        from .hi import default_hi_params
        if not ignore_existing:
            assert name not in self.cib_tracers, "Tracer name already exists."
        assert profile_name in self.uk_profiles
        p = dict(default_hi_params)
        p = scoped_override(p, param_override, set(default_hi_params),
                            strict=True)
        tr, rho = him.build_hi_tracer(
            self.ms, self.nzm, self.uk_profiles[profile_name], p,
            us2=self.uk2_profiles.get(profile_name))
        self.cib_tracers[name] = tr
        if not hasattr(self, "_hi_params"):
            self._hi_params = {}
        self._hi_params[name] = p
        return tr

    def get_omega_hi(self, name=None, param_override=None):
        """Omega_HI(z) = int dm n M_HI / rho_crit(0)."""
        from . import hi as him
        p = (self._hi_params.get(name) if name is not None
             and hasattr(self, "_hi_params") else param_override)
        rc0 = self.rho_critical_z(jnp.asarray(0.0))
        return him.omega_hi(self.nzm, self.ms, rc0, p)

    def get_hi_bias(self, name=None, param_override=None):
        from . import hi as him
        p = (self._hi_params.get(name) if name is not None
             and hasattr(self, "_hi_params") else param_override)
        return him.hi_bias(self.nzm, self.bh, self.ms, p)

    def get_p21(self, name, name2=None):
        """21 cm brightness-temperature power P_21(k, z) [mK^2 Mpc^3]:
        Tb(z)^2 (or Tb1 Tb2 for a cross of two HI tracers) times the
        halo-model HI power."""
        from . import background as _bg
        from . import hi as him
        ez = _bg.e_of_z(self.bg, self.zs)
        om = self.get_omega_hi(name)
        tb1 = him.mean_brightness_temp_mk(self.zs, ez, om, self.h)
        tb2 = tb1
        if name2 is not None and name2 != name:
            om2 = self.get_omega_hi(name2)
            tb2 = him.mean_brightness_temp_mk(self.zs, ez, om2, self.h)
        P = self.get_power(name, name2)
        return (tb1 * tb2)[:, None] * P

    def get_galaxy_rsd_multipoles(self, hod_name, ks=None, model="tns",
                                  **kw):
        """Redshift-space multipoles of a registered HOD tracer
        (EXTENSION): linear bias b_g(z) from the HOD mass integral,
        f(z) from the growth rate, PT ingredients via
        Cosmology.get_rsd_multipoles (model: 'kaiser'/'scoccimarro'/
        'tns').  ks defaults to the model grid.  Returns
        {ell: (nz, nk)}."""
        bg = self.hods[hod_name]["bg"]
        ks = self.ks if ks is None else ks
        return self.get_rsd_multipoles(np.asarray(self.zs), ks, b=bg,
                                       model=model, **kw)

    # ---- spectra (hmvec.py:500-572) ----
    def get_power_1halo(self, name="nfw", name2=None):
        t1 = self._tracer(name)
        t2 = t1 if name2 in (None, name) else self._tracer(name2)
        return pwr.power_1halo(t1, t2, self.nzm, self.ms, self.ks,
                               self.rho_matter_z(0.0),
                               self.p["kstar_damping"])

    def exclusion_radius(self):
        """Bias-weighted mean comoving exclusion radius (nz,) [Mpc]:
        r_excl(z) = (1+z) * int n b (2 r_vir) dm / int n b dm -- the
        'two average halos touching' scale for the sharp Baldauf-13
        exclusion (power.exclusion_correction)."""
        rvirs = self.rvir(self.ms[None, :], self.zs[:, None])
        w = self.nzm * self.bh
        from ..utils.weights import trapz_weights
        tw = jnp.asarray(trapz_weights(np.log(np.asarray(self.ms))))[None, :]
        num = jnp.sum(tw * w * self.ms[None, :] * 2.0 * rvirs, axis=-1)
        den = jnp.sum(tw * w * self.ms[None, :], axis=-1)
        return (1.0 + self.zs) * num / den

    def get_power_2halo(self, name="nfw", name2=None, verbose=False,
                        b1_in=None, b2_in=None, fnl=None, deltac=1.42,
                        exclusion=None):
        """2-halo spectrum; ``fnl`` threads the scale-dependent bias
        through each leg's mass integral (models/power.py _leg_fnl) —
        EXTENSION: the reference provides bias_fnl only as a free function
        for manual application (cosmology.py:132-136).

        ``exclusion`` (EXTENSION, no reference analogue): halo-exclusion
        correction to the 2-halo term (power.exclusion_correction,
        Baldauf-13 sharp form).  'auto' uses the bias-weighted mean
        touching radius (self.exclusion_radius()); a scalar or (nz,)
        array gives the comoving exclusion radius in Mpc directly."""
        del verbose
        t1 = self._tracer(name)
        t2 = t1 if name2 in (None, name) else self._tracer(name2)
        alpha_zk = (self.alpha_fnl(self.zs, self.ks)
                    if fnl is not None else None)
        p2h = pwr.power_2halo(t1, t2, self.nzm, self.bh, self.ms, self.Pzk,
                              self.rho_matter_z(0.0), b1_in, b2_in,
                              fnl=fnl, alpha_zk=alpha_zk, deltac=deltac)
        if exclusion is not None:
            if isinstance(exclusion, str):
                if exclusion != "auto":
                    raise ValueError(
                        f"exclusion: unknown option {exclusion!r} "
                        "(use 'auto', a radius in Mpc, or an (nz,) array)")
                r_excl = self.exclusion_radius()
            else:
                r_excl = exclusion
            p2h = p2h + pwr.exclusion_correction(self.ks, p2h, r_excl)
        return p2h

    def get_power(self, name="nfw", name2=None, verbose=False, b1=None,
                  b2=None, fnl=None, deltac=1.42, exclusion=None):
        return (self.get_power_1halo(name, name2)
                + self.get_power_2halo(name, name2, verbose, b1, b2,
                                       fnl=fnl, deltac=deltac,
                                       exclusion=exclusion))

    # ---- bispectra (extension beyond the reference; models/bispectrum.py) ----
    def _b2_grid(self, include_b2):
        """Second-order halo bias grid for the 3-halo quadratic-bias term.
        The peak-background split is of the Sheth-Tormen multiplicity
        (exact for 'sheth-torman'/'press-schechter'/'despali' modes; used
        as an approximation under 'tinker')."""
        if not include_b2:
            return None
        from . import bispectrum as bsp
        return bsp.b2_sheth_torman(self.sigma2, self.p)

    def get_bispectrum(self, k1=None, k2=None, k3=None, name="nfw",
                       name2=None, name3=None, terms="total",
                       b1_in=(None, None, None), include_b2=False):
        """Halo-model bispectrum B(z; k1,k2,k3) for any registered tracer
        triple.  Each leg k_i may be a scalar, an (nq,) array (shared
        across z -- k1=k2=k3=self.ks gives the equilateral sweep), or an
        (nz, nq) array of per-z configurations; the triplet is evaluated
        configuration-wise (triangle closure fixes the F2 angles).
        ``terms`` selects '1h', '2h', '3h' or 'total'."""
        from . import bispectrum as bsp
        # reuse the same tracer OBJECT for repeated names: the same-halo
        # pair/triple moment structure dispatches on tracer identity
        t1 = self._tracer(name)
        t2 = t1 if name2 in (None, name) else self._tracer(name2)
        t3 = (t1 if name3 in (None, name)
              else (t2 if name3 == name2 else self._tracer(name3)))
        if k1 is None:
            k1 = self.ks
        if k2 is None:
            k2 = k1
        if k3 is None:
            k3 = k1
        rho = self.rho_matter_z(0.0)
        if terms == "1h":
            return bsp.bispectrum_1halo(t1, t2, t3, self.nzm, self.ms,
                                        self.ks, rho, k1, k2, k3,
                                        self.p["kstar_damping"])
        if terms == "2h":
            return bsp.bispectrum_2halo(t1, t2, t3, self.nzm, self.bh,
                                        self.ms, self.ks, self.Pzk, rho,
                                        k1, k2, k3, b1_in)
        if terms == "3h":
            return bsp.bispectrum_3halo(t1, t2, t3, self.nzm, self.bh,
                                        self.ms, self.ks, self.Pzk, rho,
                                        k1, k2, k3, b1_in,
                                        self._b2_grid(include_b2))
        if terms == "total":
            return bsp.bispectrum_total(t1, t2, t3, self.nzm, self.bh,
                                        self.ms, self.ks, self.Pzk, rho,
                                        k1, k2, k3,
                                        self.p["kstar_damping"], b1_in,
                                        self._b2_grid(include_b2))
        raise ValueError(f"Unknown bispectrum terms {terms!r}")

    def get_angular_bispectrum(self, ells1, ells2=None, ells3=None,
                               name="nfw", name2=None, name3=None,
                               Wz1s=None, Wz2s=None, Wz3s=None,
                               terms="total", include_b2=False):
        """Flat-sky Limber reduced bispectrum b(l1,l2,l3) of the tracer
        triple, with the same per-z window convention as limber_integral
        (W=None means unity, the tSZ-y case; pass lensing_window outputs
        or normalized dndz for projected densities).  ell triplets
        broadcast to a common shape (a scalar pair sweeps the third)."""
        from . import bispectrum as bsp
        if ells2 is None:
            ells2 = ells1
        if ells3 is None:
            ells3 = ells1
        chis = self.comoving_radial_distance(self.zs)
        hzs = self.h_of_z(self.zs)

        def B_fn(kq1, kq2, kq3):
            return self.get_bispectrum(kq1, kq2, kq3, name, name2, name3,
                                       terms=terms, include_b2=include_b2)

        return bsp.projected_bispectrum(ells1, ells2, ells3, self.zs, hzs,
                                        chis, Wz1s, Wz2s, Wz3s, B_fn)

    def cluster_counts(self, mmin, fsky=1.0, mmax=None):
        """Cluster abundance above a mass threshold: returns
        (dN/dz, N_total) for the full sky fraction ``fsky``.

        dN/dz = fsky * 4 pi * chi(z)^2 / H(z)[1/Mpc] * int_mmin n(z,m) dm
        (comoving volume element, flat geometry), with the mass integral a
        grid-level trapz on this instance's ms (size the grid to the
        threshold accordingly).  The reference exercises exactly this
        quantity in its manual szar/hmf cross-check
        (bin/tests.py:73-131) but ships no API for it.
        """
        from ..utils.weights import trapz_weights
        ms = np.asarray(self.ms)
        w = jnp.asarray(trapz_weights(ms))
        mask = (self.ms >= mmin)
        if mmax is not None:
            mask = mask & (self.ms <= mmax)
        n_of_z = (self.nzm * jnp.where(mask, w, 0.0)[None, :]).sum(axis=-1)
        chi = self.comoving_radial_distance(self.zs)
        dvdz = 4.0 * jnp.pi * chi**2 / self.h_of_z(self.zs)
        dndz = fsky * dvdz * n_of_z
        wz = jnp.asarray(trapz_weights(np.asarray(self.zs)))
        return dndz, dndz @ wz

    def cluster_counts_obs(self, q, sigma_noise, fsky=1.0, **scaling):
        """(dN/dz, N_total) of clusters DETECTED above SNR ``q`` through a
        lognormal-scatter Y-M relation (models/cluster_counts.py).

        ``sigma_noise``: survey noise sigma_N(z) in the relation's Y units
        (scalar or per-z); ``scaling``: lnYstar/alpha/beta/Mpivot/sigma_lnY/
        sigma_meas_ln overrides.  EXTENSION beyond the reference's sharp
        threshold (bin/tests.py:73-131)."""
        from .cluster_counts import dndz_detected
        from . import background as _bg
        ez = _bg.e_of_z(self.bg, self.zs)
        return dndz_detected(self.zs, self.ms, self.nzm,
                             self.comoving_radial_distance(self.zs),
                             self.h_of_z(self.zs), ez, q, sigma_noise,
                             fsky=fsky, **scaling)

    def cluster_counts_q_bins(self, q_edges, sigma_noise, fsky=1.0,
                              z_edges=None, **scaling):
        """Expected counts per (z, SNR) bin for a number-count likelihood
        (models/cluster_counts.py.counts_q_bins)."""
        from .cluster_counts import counts_q_bins
        from . import background as _bg
        ez = _bg.e_of_z(self.bg, self.zs)
        return counts_q_bins(self.zs, self.ms, self.nzm,
                             self.comoving_radial_distance(self.zs),
                             self.h_of_z(self.zs), ez, q_edges, sigma_noise,
                             fsky=fsky, z_edges=z_edges, **scaling)

    def cluster_counts_covariance(self, z_edges, mmin=None, fsky=1.0,
                                  q=None, sigma_noise=None, ks_lin=None,
                                  **scaling):
        """Binned cluster-count covariance Cov_ij = delta_ij N_i +
        <bN>_i <bN>_j sigma^2_ij (Poisson + sample variance; Hu &
        Kravtsov 2003, Lima & Hu 2004 flat-sky windows).

        Counts per z bin come from the sharp mass threshold ``mmin`` or,
        when ``q``/``sigma_noise`` are given, the lognormal Y-M
        completeness (models/cluster_counts.py); <bN> weights the same
        selection by the halo bias, and sigma^2_ij is the linear-power
        covariance of the background mode between the bin windows
        (window_sigma2).  Returns (N_i, cov).  EXTENSION: the reference
        ships no covariance for its manual cluster-count cross-check
        (bin/tests.py:73-131)."""
        from .cluster_counts import counts_covariance
        N_i, bN_i, s2 = self._counts_cov_parts(
            z_edges, mmin=mmin, fsky=fsky, q=q, sigma_noise=sigma_noise,
            ks_lin=ks_lin, **scaling)
        return N_i, counts_covariance(N_i, bN_i, s2)

    def _counts_cov_parts(self, z_edges, mmin=None, fsky=1.0, q=None,
                          sigma_noise=None, ks_lin=None, **scaling):
        """Ingredients of the binned count covariance: (N_i, <bN>_i,
        sigma^2_ij).  Private helper shared by cluster_counts_covariance
        and joint_counts_cl_cov (kept OFF the **scaling kwargs so a
        typo'd scaling key cannot silently change the return arity)."""
        from ..utils.weights import trapz_weights
        from . import background as _bg
        from .cluster_counts import completeness, window_sigma2
        z_edges = np.asarray(z_edges, dtype=float)
        zs = np.asarray(self.zs)
        chis = self.comoving_radial_distance(self.zs)
        dvdz = fsky * 4.0 * jnp.pi * chis**2 / self.h_of_z(self.zs)
        wm = jnp.asarray(trapz_weights(np.asarray(self.ms)))
        if q is not None:
            ez = _bg.e_of_z(self.bg, self.zs)
            sel = completeness(self.ms, ez, q, sigma_noise, **scaling)
        else:
            if mmin is None:
                raise ValueError("pass mmin or (q, sigma_noise)")
            sel = jnp.broadcast_to((self.ms >= mmin)[None, :],
                                   self.nzm.shape)
        dndz = dvdz * ((self.nzm * sel) @ wm)
        dbndz = dvdz * ((self.nzm * self.bh * sel) @ wm)

        def zbin_trapz(f):
            rows = []
            for lo, hi in zip(z_edges[:-1], z_edges[1:]):
                m = (zs >= lo) & (zs < hi)
                if m.sum() > 1:
                    rows.append(f[m] @ jnp.asarray(trapz_weights(zs[m])))
                else:
                    rows.append(jnp.zeros(()))
            return jnp.stack(rows)

        N_i = zbin_trapz(dndz)
        bN_i = zbin_trapz(dbndz)
        if ks_lin is None:
            ks_lin = np.geomspace(1e-4, 5.0, 400)
        plin = self.P_lin_slow(jnp.asarray(ks_lin), self.zs)
        s2 = window_sigma2(z_edges, self.zs, chis, ks_lin, plin, fsky)
        return N_i, bN_i, s2

    def joint_counts_cl_cov(self, z_edges, ells, name1, name2=None,
                            Wz1s=None, Wz2s=None, mmin=None, fsky=1.0,
                            q=None, sigma_noise=None, ks_lin=None,
                            cov_cl_gauss=None, pad_background=True,
                            **scaling):
        """Joint SSC covariance of binned cluster counts AND C_ell of the
        tracer pair -- the cross block every joint (counts + power
        spectrum) likelihood needs, since both observables respond to the
        same super-survey modes.  The background mode is discretized onto
        the z_edges count-bin windows (window_sigma2), making all three
        blocks mutually consistent (models/cov.py, joint block docs).

        Returns (N_i, cov) with cov of shape (nbin + nl, nbin + nl):
        Poisson + sample-variance counts block, the Cov(N_i, C_l) cross
        block, and the binned-window C_l SSC block (+``cov_cl_gauss``
        if given, e.g. a Knox diagonal).  Selection via ``mmin`` or
        ``(q, sigma_noise)`` exactly as cluster_counts_covariance.
        EXTENSION beyond the reference (Gaussian-only cov.py).

        The background mode is discretized on the count-bin windows, so
        with ``pad_background=False`` super-sample modes at redshifts
        OUTSIDE [z_edges[0], z_edges[-1]] are dropped from the C_l SSC
        and cross blocks -- a real underestimate when the tracer kernels
        are broad (e.g. CMB lensing) and the count bins narrow.  The
        default ``pad_background=True`` appends zero-count background
        bins tiling the rest of this instance's zs grid (count rows
        forced to zero; they contribute only through the C_l response),
        which restores those modes exactly in the binned formalism.
        z_edges must lie inside the zs grid (ValueError otherwise --
        edges beyond the grid would be silently truncated by the
        overlap weights)."""
        from . import cov as covm
        z_edges = np.asarray(z_edges, dtype=float)
        zs_np = np.asarray(self.zs)
        if z_edges[0] < zs_np[0] - 1e-12 or z_edges[-1] > zs_np[-1] + 1e-12:
            raise ValueError(
                f"z_edges [{z_edges[0]}, {z_edges[-1]}] extend beyond the "
                f"zs grid [{zs_np[0]}, {zs_np[-1]}]; background-mode "
                "windows outside the grid cannot be represented")
        nb = z_edges.size - 1
        lo_pads = hi_pads = np.empty(0)
        if pad_background:
            width = np.median(np.diff(z_edges))

            def _pads(a, b):
                if b - a <= 1e-10:
                    return np.empty(0)
                n = min(16, max(1, int(np.ceil((b - a) / width))))
                return np.linspace(a, b, n + 1)[:-1] if a < z_edges[0] \
                    else np.linspace(a, b, n + 1)[1:]

            lo_pads = _pads(zs_np[0], z_edges[0])
            hi_pads = _pads(z_edges[-1], zs_np[-1])
        edges_full = np.concatenate([lo_pads, z_edges, hi_pads])
        n_lo = lo_pads.size
        N_f, bN_f, s2 = self._counts_cov_parts(
            edges_full, mmin=mmin, fsky=fsky, q=q, sigma_noise=sigma_noise,
            ks_lin=ks_lin, **scaling)
        # pad bins are pure background modes: no observed counts there
        count_row = np.zeros(edges_full.size - 1)
        count_row[n_lo:n_lo + nb] = 1.0
        N_f = N_f * jnp.asarray(count_row)
        bN_f = bN_f * jnp.asarray(count_row)
        P = self.get_power(name1, name2)
        hzs = self.h_of_z(self.zs)
        chis = self.comoving_radial_distance(self.zs)
        ones = jnp.ones_like(jnp.asarray(self.zs))
        Wz1s = ones if Wz1s is None else Wz1s
        Wz2s = ones if Wz2s is None else Wz2s
        r_bl = covm.cl_ssc_response_binned(ells, edges_full, self.zs,
                                           self.ks, P, Wz1s, Wz2s, hzs, chis)
        cov_full = covm.joint_counts_cl_cov(N_f, bN_f, s2, r_bl,
                                            cov_cl_gauss=cov_cl_gauss)
        keep = np.concatenate([np.arange(n_lo, n_lo + nb),
                               np.arange(edges_full.size - 1,
                                         cov_full.shape[0])])
        return N_f[n_lo:n_lo + nb], cov_full[np.ix_(keep, keep)]

    def get_cl_cov_t1h(self, ells, name1, name2=None, Wz1s=None, Wz2s=None,
                       fsky=1.0, name3=None, name4=None, Wz3s=None,
                       Wz4s=None):
        """Connected (1-halo trispectrum) covariance of C_ell bandpowers,
        Cov(C^{12}_ell, C^{34}_ell'), with the same window conventions as
        limber_integral (W defaults to 1, e.g. the C_yy case; pass
        lensing_window outputs etc. for projected densities).  names 3/4
        default to 1/2 (the auto-covariance of one spectrum); passing
        them gives the CROSS-covariance between two different spectra
        (e.g. Cov(C_yy, C_gg), the term that correlates tSZ and galaxy
        bandpowers through shared massive halos).  Extension: the
        reference's covariance module is Gaussian-only."""
        from . import cov as covm

        def tracer_pair(na, nb):
            ta = self._tracer(na)
            tb = ta if nb in (None, na) else self._tracer(nb)
            return pwr.one_halo_square_term(ta, tb, self.ms,
                                            self.rho_matter_z(0.0))

        term12 = tracer_pair(name1, name2)
        if name3 is None and name4 is None:
            term34 = term12
        else:
            term34 = tracer_pair(name3 if name3 is not None else name1,
                                 name4 if name4 is not None else name2)
        t_zkk = covm.trispectrum_1h_terms(self.nzm, self.ms, term12, term34)
        hzs = self.h_of_z(self.zs)
        chis = self.comoving_radial_distance(self.zs)
        ones = jnp.ones_like(jnp.asarray(self.zs))
        Wz1s = ones if Wz1s is None else Wz1s
        Wz2s = ones if Wz2s is None else Wz2s
        return covm.cl_cov_t1h(ells, self.zs, self.ks, t_zkk, Wz1s, Wz2s,
                               hzs, chis, fsky,
                               Wz3s=Wz3s, Wz4s=Wz4s)

    def get_cl_cov_ssc(self, ells, name1, name2=None, Wz1s=None, Wz2s=None,
                       fsky=1.0):
        """Super-sample covariance of C_ell for the tracer pair (flat-sky
        disk window sized to fsky; linear response of this instance's
        1h+2h P for the pair).  Extension: reference is Gaussian-only."""
        from . import cov as covm
        P = self.get_power(name1, name2)
        hzs = self.h_of_z(self.zs)
        chis = self.comoving_radial_distance(self.zs)
        ks_lin = jnp.geomspace(1e-4, 1.0, 512)
        sb2 = covm.sigma_b2_disk(fsky, chis, ks_lin,
                                 self.P_lin(ks_lin, self.zs))
        ones = jnp.ones_like(jnp.asarray(self.zs))
        Wz1s = ones if Wz1s is None else Wz1s
        Wz2s = ones if Wz2s is None else Wz2s
        return covm.cl_cov_ssc(ells, self.zs, self.ks, P, Wz1s, Wz2s,
                               hzs, chis, sb2)

    def get_pk_covariance(self, volume_gpc3, name="nfw", pk_tot=None,
                          dks=None):
        """Matter P(k) covariance per z: Gaussian + 1-halo trispectrum +
        super-sample terms (extension beyond the reference, whose cov.py
        covers only bandpower C_l Knox errors).

        Returns a dict with 'gauss', 't1h', 'ssc' (each (nz, nk, nk)) and
        their sum 'total'.  ``pk_tot`` overrides the spectrum used in the
        Gaussian term (e.g. to add shot noise); default is this model's
        1h+2h P(k) for ``name``.
        """
        from . import cov as covm
        V = volume_gpc3 * 1e9  # Mpc^3
        if pk_tot is None:
            pk_tot = self.get_power(name)
        uk = self.uk_profiles[name]
        gauss = covm.pk_cov_gaussian(self.ks, pk_tot, V, dks=dks)
        t1h = covm.trispectrum_1h(self.nzm, self.ms, self.rho_matter_z(0.0),
                                  uk) / V
        resp = covm.pk_response_ssc(self.ks, pk_tot)
        # dedicated low-k grid: the survey window peaks at k ~ 1/R
        # (~2e-3/Mpc for Gpc^3 volumes), below typical target ks grids
        ks_lin = jnp.geomspace(1e-4, 1.0, 512)
        sb2 = covm.sigma_b2_tophat(V, ks_lin, self.P_lin(ks_lin, self.zs))
        ssc = covm.pk_cov_ssc(resp, sb2)
        return {"gauss": gauss, "t1h": t1h, "ssc": ssc,
                "total": gauss + t1h + ssc}

    # ---- cluster lensing (hmvec.py:574-622; clusterlensing dep dropped) ----
    def sigma_1h_profiles(self, thetas, Ms, concs, sig_theta=None, delta=200,
                          rho="mean", rho_at_z=True):
        from .cluster_lensing import sigma_1h_profiles
        return sigma_1h_profiles(self.bg, self.zs, thetas, Ms, concs,
                                 sig_theta=sig_theta, delta=delta, rho=rho,
                                 rho_at_z=rho_at_z)

    def kappa_1h_profiles(self, thetas, Ms, concs, zsource, sig_theta=None,
                          delta=200, rho="mean", rho_at_z=True):
        from .cluster_lensing import kappa_1h_profiles
        return kappa_1h_profiles(self.bg, self.zs, thetas, Ms, concs,
                                 zsource, sig_theta=sig_theta, delta=delta,
                                 rho=rho, rho_at_z=rho_at_z)

    def kappa_2h_profiles(self, thetas, Ms, zsource, lmin=100, lmax=10000):
        from .cluster_lensing import kappa_2h_profiles
        import jax
        # per-z halo bias at the cluster masses (hmvec.py:612-614)
        bh_at_m = jax.vmap(lambda bh_row: jnp.interp(
            jnp.asarray(Ms).reshape(()), self.ms, bh_row))(self.bh)
        return kappa_2h_profiles(self.bg, self.zs, self.ks, self.Pzk,
                                 bh_at_m, thetas, zsource, lmin, lmax)
