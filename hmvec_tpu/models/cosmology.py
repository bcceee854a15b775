"""User-facing Cosmology class mirroring the reference API.

Thin stateful wrapper over the pure staged functions (background, transfer,
linear_power, limber).  Method names and signatures follow the reference
Cosmology (hmvec/cosmology.py:51-904) so existing hmvec users can switch;
the engine choice is preserved as config ('eh' analytic default here, or a
tabulated P(z,k) standing in for CAMB/CLASS -- reference cosmology.py:17-25).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..params import merge_params
from . import background as bgmod
from . import limber as limb
from . import linear_power as lpm
from .transfer import transfer_eh98

# Jitted entry points for the chunky eager class-API stages (compiled once
# per grid shape, reused across instances; the fused pipelines in
# hmvec_tpu.pipeline trace the un-jitted functions inside one program).
_eh_pzk_j = jax.jit(
    lambda bg, zs, ks, growth_mode="closed": lpm.EHEngine().pzk_grid(
        bg, zs, ks, growth_mode=growth_mode),
    static_argnames="growth_mode")
_eh_plin_j = jax.jit(
    lambda bg, zs, ks, accuracy, growth_mode="closed": lpm.EHEngine().plin(
        bg, zs, ks, accuracy=accuracy, growth_mode=growth_mode),
    static_argnames=("accuracy", "growth_mode"))



@functools.lru_cache(maxsize=16)
def _sigma2_R_jit(kmin, kmax, numks, taylor_switch):
    # the sigma^2 k-grid and its Simpson weights are host-side statics;
    # key the compiled fn on the grid parameters
    ks_s2 = lpm.sigma2_k_grid({"sigma2_kmin": kmin, "sigma2_kmax": kmax,
                               "sigma2_numks": numks})
    return jax.jit(lambda bg, R, zs, spzk: lpm.sigma2_R(
        bg, R, zs, spzk, ks_s2, taylor_switch))


def a2z(a):
    """Scale factor -> redshift (reference cosmology.py:865)."""
    return 1.0 / jnp.atleast_1d(jnp.asarray(a)) - 1.0


def get_eds_model(fb=0.15, H0=68.0, YHe=0.25):
    """Einstein-de Sitter params from baryon fraction + H0
    (reference cosmology.py:40-49)."""
    om = 1.0
    h0 = H0 / 100.0
    return {"omch2": (1 - fb) * om * h0**2, "ombh2": fb * om * h0**2,
            "H0": H0, "mnu": 0.0, "YHe": YHe}


class Cosmology:
    def __init__(self, params=None, halofit=None, engine="eh",
                 accuracy="medium", pk_table=None, cls_table=None,
                 growth="auto", engine_opts=None):
        self.accuracy = accuracy
        self.p = merge_params(params)
        # growth-factor mode: 'closed' = Heath/2F1 (LCDM-exact), 'ode' =
        # integrated growing mode for general (w0, wa) -- the analogue of
        # the reference's engine-exact growth (cosmology.py:288-294).
        # 'auto' picks by the concrete (w0, wa) at construction.
        self.growth_mode = (bgmod.growth_mode_for(self.p)
                            if growth == "auto" else growth)
        self.params = self.p
        self.engine_name = engine if isinstance(engine, str) else \
            getattr(engine, "name", "custom")
        self._engine_opts = engine_opts
        self.halofit = halofit
        # Precomputed CMB spectra (same host-table mechanism as pk_table):
        # a mapping with any of 'cls_lensed'/'cls_unlensed' ((nl, 4) TT EE
        # BB TE, muK^2, raw_cl, row index = ell) and 'cls_lens_potential'
        # ((nl,) CAMB deflection convention [L(L+1)]^2 C_phiphi / 2pi).
        # tools/gen_camb_table.py writes all three offline.
        self.cls_table = dict(cls_table) if cls_table is not None else None

        # theta100 parameterization: solve H0 for the requested acoustic
        # scale (reference: cosmomc_theta via CAMB, cosmology.py:140-147;
        # here the engine-free EH98/Hu-Sugiyama approximation)
        if params and "theta100" in params:
            from .distances_ext import solve_h0_from_theta100
            self.p["H0"] = solve_h0_from_theta100(self.p, params["theta100"])

        # engine AFTER theta100 (a 'boltz' engine solve must see the
        # resolved H0); As/sigma8 rescaling below needs no engine rebuild
        # because every engine serves amplitude from the traced As
        self.engine = lpm.make_engine(engine, pk_table, params=self.p,
                                      engine_opts=engine_opts)

        self.bg = bgmod.background(self.p)

        # sigma8 / S8 parameterization: the reference supports these only
        # through CLASS (cosmology.py:184-191); engine-free, P_lin is
        # exactly linear in As, so rescale As to hit the requested
        # amplitude.
        if params and ("sigma8" in params or "S8" in params):
            import numpy as _np
            h = self.p["H0"] / 100.0
            omm0 = float(self.bg.omm0)
            target = (params["sigma8"] if "sigma8" in params
                      else params["S8"] / _np.sqrt(omm0 / 0.3))
            ks_s2 = lpm.sigma2_k_grid(self.p)
            spzk = self.engine.plin(self.bg, jnp.asarray([0.0]), ks_s2,
                                    accuracy="medium",
                                    growth_mode=self.growth_mode)
            s2 = lpm.sigma2_R(self.bg, jnp.asarray([8.0 / h]),
                              jnp.asarray([0.0]), spzk, ks_s2,
                              self.p["Wkr_taylor_switch"])
            sigma8_now = float(jnp.sqrt(s2[0, 0]))
            self.p["As"] = self.p["As"] * (target / sigma8_now) ** 2
            self.bg = bgmod.background(self.p)
        self.h = float(self.p["H0"]) / 100.0
        self.omm0 = float(self.bg.omm0)
        self.omk0 = float(self.bg.omk0)
        self.oml0 = float(self.bg.oml0)
        self.ombh2 = float(self.bg.ombh2)
        self.as8 = float(self.p.get("as8", 1.0))
        self.YHe = float(self.p.get("Yp", 0.24))

    # ---- background ----
    def hubble_parameter(self, z):
        return bgmod.hubble_parameter(self.bg, z)

    def h_of_z(self, z):
        return bgmod.h_of_z(self.bg, z)

    def comoving_radial_distance(self, z):
        return bgmod.comoving_radial_distance(self.bg, z)

    def angular_diameter_distance(self, z1, z2=None):
        return bgmod.angular_diameter_distance(self.bg, z1, z2)

    def redshift_at_comoving_radial_distance(self, chi, zmax=1e4):
        return bgmod.redshift_at_comoving_radial_distance(self.bg, chi, zmax)

    def sigma_crit(self, zlens, zsource):
        return bgmod.sigma_crit(self.bg, zlens, zsource)

    def rho_critical_z(self, z):
        return bgmod.rho_critical_z(self.bg, z)

    def rho_matter_z(self, z):
        return bgmod.rho_matter_z(self.bg, z)

    def omz(self, z):
        return bgmod.omz(self.bg, z)

    # ---- growth ----
    def D_growth_approx(self, a):
        # the reference's D_growth_approx is the closed form by definition
        # (cosmology.py:297-314)
        return bgmod.growth_unnormalized(self.bg, a)

    def D_growth(self, a, type="anorm", exact=False):
        # exact=True forces the ODE growing mode (the analogue of the
        # reference's engine-exact D, cosmology.py:288-294); otherwise the
        # instance's growth_mode decides (ODE automatically under w0/wa).
        mode = "ode" if exact else self.growth_mode
        return bgmod.d_growth(self.bg, a, norm=type, mode=mode)

    def D_growth_exact_arbitrary_norm(self, a):
        """Unnormalized engine-exact growth (reference cosmology.py:288-294
        alias; here the ODE growing mode, D -> a in matter domination)."""
        return bgmod.growth_unnormalized(self.bg, a, mode="ode")

    def get_growth_rate_f(self, zs):
        return bgmod.growth_rate_f(self.bg, zs, mode=self.growth_mode)

    def bias_fnl(self, bg_bias, fnl, z, ks, deltac=1.42):
        """Scale-dependent fNL bias (reference: cosmology.py:132-136)."""
        beta = 2.0 * deltac * (bg_bias - 1.0)
        a = 1.0 / (1.0 + z)
        alpha = ((2.0 * jnp.asarray(ks) ** 2 * self.Tk(ks, "eisenhu_osc"))
                 / (3.0 * self.bg.omm0 * bgmod.h_of_z(self.bg, 0.0) ** 2)
                 * bgmod.d_growth(self.bg, a, norm="anorm",
                                  mode=self.growth_mode))
        return bg_bias + fnl * (beta / alpha)

    def alpha_fnl(self, zs, ks, deltac=None):
        """alpha(z, k) of the fNL bias relation db = 2 fnl deltac (b-1)/alpha
        on the (nz, nk) grid — the same quantity bias_fnl divides by
        (reference cosmology.py:132-136), vectorized over z for the
        halo-model 2-halo threading (power.power_2halo(fnl=...))."""
        del deltac
        zs = jnp.atleast_1d(jnp.asarray(zs))
        D = bgmod.d_growth(self.bg, 1.0 / (1.0 + zs), norm="anorm",
                           mode=self.growth_mode)
        return ((2.0 * jnp.asarray(ks) ** 2 * self.Tk(ks, "eisenhu_osc"))[None, :]
                / (3.0 * self.bg.omm0 * bgmod.h_of_z(self.bg, 0.0) ** 2)
                * D[:, None])

    # ---- linear power ----
    def Tk(self, ks, type="eisenhu_osc"):
        return transfer_eh98(self.bg, ks, type)

    def P_lin(self, ks, zs, knorm=1e-4, kmax=None):
        del knorm, kmax
        return self.engine.plin(self.bg, zs, ks, accuracy="medium",
                                growth_mode=self.growth_mode)

    def P_lin_slow(self, ks, zs, kmax=None):
        del kmax
        return self.engine.plin(self.bg, zs, ks, accuracy="high"
                                if self.engine.name == "tabulated" else "medium",
                                growth_mode=self.growth_mode)

    def P_lin_approx(self, ks, zs, type="eisenhu_osc"):
        return lpm.plin_approx(self.bg, zs, ks, type,
                               growth_mode=self.growth_mode)

    def P_mm_linear(self, zs, ks):
        """Linear matter power on (zs, ks).  The reference declares this
        (cosmology.py:104-105) but leaves it as a `pass` stub; here it is
        the linear grid eval."""
        return self._get_matter_power(zs, ks, nonlinear=False)

    def P_mm_nonlinear(self, ks, zs, halofit_version="mead"):
        """Nonlinear matter power on (zs, ks) (reference cosmology.py:107-108,
        a `pass` stub there; argument order preserved)."""
        old = self.halofit
        self.halofit = halofit_version
        try:
            return self._get_matter_power(zs, ks, nonlinear=True)
        finally:
            self.halofit = old

    def P_mm_1loop(self, zs, ks, n_q=512, n_x=256, n_q13=1024,
                   qmin=1e-4, qmax=1e2, ir_resum=False):
        """One-loop SPT matter power P_lin + P22 + P13 (models/spt.py)
        on (zs, ks) -- the perturbative nonlinear tier complementary to
        halofit/HMcode, valid at k <~ 0.2-0.3/Mpc.  EXTENSION: the
        reference has no perturbation theory.  The loop integrals are
        evaluated once at z = 0 and scaled by D(z)^4, exact within the
        same EdS-kernel approximation as F2/F3.

        ir_resum=True applies the NLO leading-wiggle IR resummation
        (spt.p1loop_ir: wiggles split against the EH98 zero-baryon
        template and damped by e^{-k^2 Sigma^2(z)}; Sigma^2 scales as
        D^2).  The z-scaling then evaluates the full resummed
        expression per z (the damping is not a D^4 overall factor)."""
        from . import spt
        from . import linear_power as lpm
        from .transfer import _eh_scales
        zs = np.atleast_1d(zs)
        ks = jnp.asarray(ks)
        ks_tab = np.geomspace(1e-5, 1e3, 1200)
        if not ir_resum:
            pk0 = self.P_lin(jnp.asarray(ks_tab), np.array([0.0]))[0]
            loops0 = (spt.p22(ks, ks_tab, pk0, n_q=n_q, n_x=n_x,
                              qmin=qmin, qmax=qmax)
                      + spt.p13(ks, ks_tab, pk0, n_q=n_q13,
                                qmin=qmin, qmax=qmax))
            Plin = self.P_lin(ks, zs)
            D = self.D_growth(1.0 / (1.0 + jnp.asarray(zs)))
            D0 = self.D_growth(jnp.asarray(1.0))
            return Plin + ((D / D0) ** 4)[:, None] * loops0[None, :]
        sc = _eh_scales(self.bg)
        ell_bao = sc["sh_d"] / sc["h"]     # jnp scalar: stays traceable
        tmpl = lpm.plin_approx(self.bg, np.array([0.0]),
                               jnp.asarray(ks_tab), "eisenhu",
                               growth_mode=self.growth_mode)[0]
        pk_z = self.P_lin(jnp.asarray(ks_tab), zs)        # (nz, nkt)
        rows = [spt.p1loop_ir(ks, ks_tab, pk_z[i], tmpl, ell_bao,
                              n_q=n_q, n_x=n_x, n_q13=n_q13,
                              qmin=qmin, qmax=qmax)
                for i in range(len(zs))]
        return jnp.stack(rows, axis=0)

    def get_rsd_multipoles(self, zs, ks, b=1.0, model="tns",
                           sigma_v=None, fog="gaussian", ells=(0, 2, 4),
                           n_mu=32, n_q=256, n_x=128, n_q13=512,
                           qmin=1e-4, qmax=1e2):
        """Redshift-space power multipoles P_ell(k, z) (EXTENSION --
        the reference has no redshift-space modeling).

        model: 'kaiser' (linear), 'scoccimarro' (nonlinear Kaiser
        bracket on the one-loop density/velocity spectra), or 'tns'
        (+ the A/B velocity-density coupling terms, the BOSS/DESI
        full-shape standard).  f(z) comes from the growth rate (true
        ODE growth under w0/wa); every loop ingredient is computed ONCE
        at z = 0 and carried to each z by the exact EdS powers of
        D(z)/D(0) (P_lin ~ D^2; P22/P13 and the A/B integrals, being
        bilinear in P, ~ D^4).  b: linear bias, scalar or (nz,);
        sigma_v: FoG damping scale in Mpc, scalar/(nz,)/None (None =
        the linear-theory choice f(z) D(z) sigma_v_lin(z=0)).
        Returns {ell: (nz, nk)}."""
        from . import spt, rsd, tns
        zs = np.atleast_1d(zs)
        ks = jnp.asarray(ks)
        nz = len(zs)
        a = 1.0 / (1.0 + jnp.asarray(zs))
        Dz = self.D_growth(a) / self.D_growth(jnp.asarray(1.0))
        fz = jnp.broadcast_to(self.get_growth_rate_f(zs), (nz,))
        bz = jnp.broadcast_to(jnp.asarray(b, dtype=jnp.float64), (nz,))
        ks_tab = np.geomspace(1e-5, 1e3, 1200)
        pk0 = self.P_lin(jnp.asarray(ks_tab), np.array([0.0]))[0]
        if sigma_v is None:
            sv = fz * Dz * rsd.sigma_v_lin(ks_tab, pk0)
        else:
            sv = jnp.broadcast_to(jnp.asarray(sigma_v, jnp.float64),
                                  (nz,))
        if model == "kaiser":
            Plin = self.P_lin(ks, zs)                      # (nz, nk)
            return rsd.rsd_multipoles(ks, Plin, bz, fz, sigma_v=sv,
                                      ells=ells, fog=fog, n_mu=n_mu)
        lnkt = jnp.log(jnp.asarray(ks_tab))
        lnpt = jnp.log(pk0)
        Plin0 = spt._pk_eval(lnkt, lnpt, ks)               # (nk,)
        pv0 = spt.pk_velocity_1loop(ks, ks_tab, pk0, n_q=n_q, n_x=n_x,
                                    n_q13=n_q13, qmin=qmin, qmax=qmax)
        loops0 = {ab: pv0[ab] - Plin0 for ab in ("dd", "dt", "tt")}
        D2 = Dz[:, None] ** 2
        D4 = Dz[:, None] ** 4
        pz = {ab: D2 * Plin0[None, :] + D4 * loops0[ab][None, :]
              for ab in ("dd", "dt", "tt")}
        if model == "scoccimarro":
            return rsd.scoccimarro_multipoles(
                ks, pz["dd"], pz["dt"], pz["tt"], bz, fz, sigma_v=sv,
                ells=ells, fog=fog, n_mu=n_mu)
        if model != "tns":
            raise ValueError(f"model {model!r}: expected 'kaiser', "
                             "'scoccimarro' or 'tns'")
        ab0 = tns.tns_ab_integrals(ks, ks_tab, pk0, n_q=n_q, n_x=n_x,
                                   qmin=qmin, qmax=qmax)
        rows = []
        for i in range(nz):
            abz = {"A": {k_: Dz[i] ** 4 * v for k_, v in
                         ab0["A"].items()},
                   "B": {k_: Dz[i] ** 4 * v for k_, v in
                         ab0["B"].items()}}
            rows.append(tns.tns_multipoles(
                ks, pz["dd"][i], pz["dt"][i], pz["tt"][i], bz[i], fz[i],
                abz, sigma_v=sv[i], ells=ells, fog=fog, n_mu=n_mu))
        return {ell: jnp.stack([r[ell] for r in rows], axis=0)
                for ell in ells}

    def get_pk_interpolator(self, zs, kmax, var="weyl", nonlinear=False,
                            return_z_k=False, k_per_logint=None,
                            log_interp=True, extrap_kmax=None):
        """P(z, k) evaluator with the reference's interface
        (cosmology.py:772-810): returns an object whose ``.P(zs, ks,
        grid=True)`` evaluates the requested spectrum.

        var: 'total' (matter), 'cb' (cold matter, EH engine linear
        only), or 'weyl' (Weyl-potential spectrum via the Poisson
        relation P_Weyl = [3/2 Om_m H0^2 (1+z) / c^2]^2 P_m / k^4 --
        same engine-free stand-in as cmb_lensing_limber, documented
        deviation from CAMB's Transfer_Weyl).  Deviations: evaluation
        is exact on the requested points rather than spline-interpolated
        from a CAMB table; the as8 amplitude knob is already applied (the
        reference's raw CAMB PK is not); k_per_logint / log_interp /
        extrap_kmax are accepted for signature parity and ignored.
        ``return_z_k`` also returns the (zs, ks) sampling like CAMB.
        """
        del k_per_logint, log_interp, extrap_kmax
        cosmo = self

        class _PK:
            def P(self, pzs, pks, grid=True):
                pzs = jnp.atleast_1d(jnp.asarray(pzs, dtype=jnp.float64))
                pks = jnp.atleast_1d(jnp.asarray(pks, dtype=jnp.float64))
                if var == "cb":
                    if nonlinear:
                        raise NotImplementedError(
                            "var='cb' nonlinear needs a cb table; use "
                            "var='total' or linear")
                    p = cosmo.engine.plin(cosmo.bg, pzs, pks,
                                          accuracy="medium",
                                          growth_mode=cosmo.growth_mode,
                                          component="cb")
                else:
                    p = cosmo._get_matter_power(pzs, pks,
                                                nonlinear=nonlinear)
                if var == "weyl":
                    from .distances_ext import CSPEED_KMS
                    h0i = cosmo.bg.H0 / CSPEED_KMS
                    pref = (1.5 * cosmo.bg.omm0 * h0i**2
                            * (1.0 + pzs))[:, None] ** 2
                    p = pref * p / pks[None, :] ** 4
                if not grid:
                    p = jnp.diagonal(p)
                return p

        pk = _PK()
        if return_z_k:
            zarr = np.atleast_1d(np.asarray(zs, dtype=np.float64))
            karr = np.geomspace(1e-4, float(kmax), 256)
            return pk, zarr, karr
        return pk

    def _get_matter_power(self, zs, ks, nonlinear=False):
        if nonlinear:
            if self.engine.name == "tabulated":
                return self.engine.pzk_grid(self.bg, zs, ks, nonlinear=True)
            # reference: halofit string is CAMB's halofit_version
            # (cosmology.py:174, default 'mead'); dispatch natively
            version = self.halofit
            if version in (None, True):
                version = self.p.get("default_halofit", "mead")
            if version in ("mead", "mead2016", "hmcode"):
                from .hmcode import hmcode_power
                return hmcode_power(self, zs, ks)
            if version == "mead2015":
                from .hmcode import hmcode_power
                return hmcode_power(self, zs, ks, version="2015")
            if version == "mead2020":
                from .hmcode import hmcode_power
                return hmcode_power(self, zs, ks, version="2020")
            if version == "mead2020_feedback":
                from .hmcode import hmcode_power
                return hmcode_power(self, zs, ks, version="2020_feedback")
            from .halofit import halofit_power
            if version in ("original", "smith", "smith03"):
                return halofit_power(self, zs, ks, version="original")
            if version in ("takahashi", "bird", "peacock", "casarini"):
                return halofit_power(self, zs, ks, version=version)
            raise ValueError(
                f"halofit version {version!r}: supported are 'mead' "
                "(HMcode-2016, default), 'mead2015', 'mead2020', "
                "'mead2020_feedback', 'takahashi', 'original', 'bird', "
                "'peacock', 'casarini' (the reference's "
                "bin/test_halofit.py sweep + CAMB>=1.3's defaults)")
        if self.engine.name == "eh":
            return _eh_pzk_j(self.bg, zs, ks, self.growth_mode)
        return self.engine.pzk_grid(self.bg, zs, ks, nonlinear=False,
                                    growth_mode=self.growth_mode)

    def get_sigma2_R(self, R, zs, kmin=None, kmax=None, numks=None):
        p = dict(self.p)
        if kmin is not None:
            p["sigma2_kmin"] = kmin
        if kmax is not None:
            p["sigma2_kmax"] = kmax
        if numks is not None:
            p["sigma2_numks"] = numks
        ks_s2 = lpm.sigma2_k_grid(p)
        if self.engine.name == "eh":
            spzk = _eh_plin_j(self.bg, zs, ks_s2, self.accuracy,
                              self.growth_mode)
        else:
            spzk = self.engine.plin(self.bg, zs, ks_s2,
                                    accuracy=self.accuracy,
                                    growth_mode=self.growth_mode)
        R = jnp.atleast_1d(jnp.asarray(R))
        f = _sigma2_R_jit(p["sigma2_kmin"], p["sigma2_kmax"],
                          p["sigma2_numks"], self.p["Wkr_taylor_switch"])
        return f(self.bg, R, zs, spzk)

    def get_sigma8(self, zs, kmin=1e-4, kmax=None, numks=1000):
        r = self.get_sigma2_R(8.0 / self.p["H0"] * 100.0, zs,
                              kmin=kmin, kmax=kmax, numks=numks)
        return jnp.sqrt(r[:, 0])

    # ---- Limber projections (delegate to the limber module) ----
    def lensing_window(self, ezs, zs, dndz=None):
        return limb.lensing_window(self.bg, ezs, zs, dndz)

    def C_kk(self, ells, zs, ks, Pmm, **kw):
        return limb.C_kk(self.bg, ells, zs, ks, Pmm, **kw)

    def C_kg(self, ells, zs, ks, Pgm, gzs, **kw):
        return limb.C_kg(self.bg, ells, zs, ks, Pgm, gzs, **kw)

    def C_gg(self, ells, zs, ks, Pgg, gzs, **kw):
        return limb.C_gg(self.bg, ells, zs, ks, Pgg, gzs, **kw)

    def C_gy(self, ells, zs, ks, Pgp, gzs, **kw):
        return limb.C_gy(self.bg, ells, zs, ks, Pgp, gzs, **kw)

    def C_ky(self, ells, zs, ks, Pym, **kw):
        return limb.C_ky(self.bg, ells, zs, ks, Pym, **kw)

    def C_yy(self, ells, zs, ks, Ppp, **kw):
        return limb.C_yy(self.bg, ells, zs, ks, Ppp, **kw)

    # ---- intrinsic alignments + magnification (EXTENSION; models/ia.py) --
    def C_II(self, ells, zs, ks, Pmm, gzs, dndz1, **kw):
        """NLA intrinsic-intrinsic spectrum (models/ia.py)."""
        from . import ia as iam
        kw.setdefault("growth_mode", self.growth_mode)
        return iam.C_II(self.bg, ells, zs, ks, Pmm, gzs, dndz1, **kw)

    def C_kI(self, ells, zs, ks, Pmm, gzs, sdndz, **kw):
        """NLA GI spectrum: lensing x intrinsic (models/ia.py)."""
        from . import ia as iam
        kw.setdefault("growth_mode", self.growth_mode)
        return iam.C_kI(self.bg, ells, zs, ks, Pmm, gzs, sdndz, **kw)

    def C_gI(self, ells, zs, ks, Pgm, gzs, gdndz, sdndz, **kw):
        """Lens density x source intrinsic alignment (models/ia.py)."""
        from . import ia as iam
        kw.setdefault("growth_mode", self.growth_mode)
        return iam.C_gI(self.bg, ells, zs, ks, Pgm, gzs, gdndz, sdndz, **kw)

    def shear_cls_with_ia(self, ells, zs, ks, Pmm, gzs, sdndz1, **kw):
        """{'GG','GI','II','total'} observed shear spectra (models/ia.py)."""
        from . import ia as iam
        kw.setdefault("growth_mode", self.growth_mode)
        return iam.shear_cls_with_ia(self.bg, ells, zs, ks, Pmm, gzs,
                                     sdndz1, **kw)

    def C_gg_mag(self, ells, zs, ks, Pgg, Pgm, Pmm, gzs, gdndz, s_mag, **kw):
        """Clustering with magnification bias (models/ia.py)."""
        from . import ia as iam
        return iam.C_gg_mag(self.bg, ells, zs, ks, Pgg, Pgm, Pmm, gzs,
                            gdndz, s_mag, **kw)

    def C_kg_mag(self, ells, zs, ks, Pgm, Pmm, gzs, gdndz, s_mag, **kw):
        """Lensing x galaxies with lens magnification (models/ia.py)."""
        from . import ia as iam
        return iam.C_kg_mag(self.bg, ells, zs, ks, Pgm, Pmm, gzs, gdndz,
                            s_mag, **kw)

    # ---- exact (non-Limber) linear-theory projections ----
    def C_gg_exact(self, ells, ks, pk0, gzs, gdndz, **kw):
        """Exact low-ell linear galaxy C_l (EXTENSION; models/nonlimber.py)."""
        from . import nonlimber as nlm
        kw.setdefault("growth_mode", self.growth_mode)
        return nlm.C_gg_exact(self.bg, ells, ks, pk0, gzs, gdndz, **kw)

    def C_kg_exact(self, ells, ks, pk0, gzs, gdndz, **kw):
        from . import nonlimber as nlm
        kw.setdefault("growth_mode", self.growth_mode)
        return nlm.C_kg_exact(self.bg, ells, ks, pk0, gzs, gdndz, **kw)

    def C_gg_hybrid(self, ells, ks, pk0, zs_nl, pzk_nl, gzs, gdndz, **kw):
        """Exact-low-ell + Limber-high-ell galaxy spectrum for a FULL
        nonlinear P_gg (models/nonlimber.C_gg_hybrid)."""
        from . import nonlimber as nlm
        return nlm.C_gg_hybrid(self.bg, ells, ks, pk0, zs_nl, pzk_nl,
                               gzs, gdndz, **kw)

    def C_kk_hybrid(self, ells, ks, pk0, zs_nl, pzk_nl, **kw):
        """Exact-low-ell + Limber-high-ell convergence spectrum for a
        FULL nonlinear P_mm (models/nonlimber.C_kk_hybrid)."""
        from . import nonlimber as nlm
        return nlm.C_kk_hybrid(self.bg, ells, ks, pk0, zs_nl, pzk_nl, **kw)

    def C_kk_exact(self, ells, ks, pk0, **kw):
        from . import nonlimber as nlm
        kw.setdefault("growth_mode", self.growth_mode)
        return nlm.C_kk_exact(self.bg, ells, ks, pk0, **kw)

    def get_Omega_nu(self):
        """Massive-neutrino density fraction (reference cosmology.py:384-389)."""
        return self.bg.omnu0

    # ---- conformal time / recombination / BAO (engine-free) ----
    def conformal_time(self, z):
        from .distances_ext import conformal_time, conformal_age
        import numpy as _np
        z = jnp.atleast_1d(jnp.asarray(z))
        out = jnp.where(z < 1e-5, conformal_age(self.bg),
                        conformal_time(self.bg, z))
        return out if out.size > 1 else out[0]

    def get_tau_star(self):
        from .distances_ext import tau_star
        return tau_star(self.bg)

    def z_of_tau(self, tau):
        from .distances_ext import z_of_tau
        return z_of_tau(self.bg, tau)

    def get_bao_rs_dV(self, zs):
        from .distances_ext import get_bao_rs_dV
        return get_bao_rs_dV(self.bg, zs)

    def cmb_lensing_limber(self, lmax, nonlinear=False):
        from .distances_ext import cmb_lensing_limber
        return cmb_lensing_limber(self, lmax, nonlinear=nonlinear)

    def get_cmb_cls(self, lmax=3000, lens_potential_accuracy=4,
                    nonlinear=True, approx=False, lens_method="resummed"):
        """Primary CMB power spectra (reference cosmology.py:67-81).

        Precision tier: a host-supplied table (ctor ``cls_table``;
        generate it offline with tools/gen_camb_table.py), the same
        mechanism by which ``pk_table`` stands in for CAMB's matter
        power.  Returns the CAMB-shaped dict {'total',
        'unlensed_scalar', 'lens_potential'} (muK^2, raw_cl, rows
        0..lmax), truncated or NaN-padded to lmax+1.

        Approximation tier (``approx=True``, used only when no table was
        supplied): the built-in reduced Boltzmann solver
        (models/boltzlite.py) computes unlensed scalar TT/EE/TE at
        few-percent accuracy through the damping tail; the lensing
        potential blends the solver's exact (non-Limber) LOS projection
        at L < 80 into the Limber path above L = 130 (``nonlinear``
        selects the nonlinear matter power there); and ``'total'`` lenses
        the two with the flat-sky correlation-function method resummed to
        all orders in the displacement variance (models/lensed_cf.py,
        ``lens_method='resummed'``, the default -- the resummation is
        what keeps the damping tail bounded where l^2 R is order unity),
        or the lowest-order convolution (models/lensed_cls.py,
        ``lens_method='first_order'``; the two agree to ~0.5% where
        lensing is weak, tests/test_lensed_cf.py).  The unlensed solve
        runs with +400 l of headroom so the lensing convolution support
        is complete at lmax.  The dict carries an ``'approx': True``
        marker.
        """
        del lens_potential_accuracy  # table is precomputed / no lensing BB
        if self.cls_table is None:
            if not approx:
                raise NotImplementedError(
                    "Primary CMB Cls need a Boltzmann product; pass "
                    "cls_table=... to the ctor (generate offline with "
                    "tools/gen_camb_table.py) for CAMB precision, or call "
                    "with approx=True for the built-in few-percent "
                    "boltzlite solver (models/boltzlite.py).")
            from . import boltzlite
            if lens_method == "resummed":
                from .lensed_cf import lens_cls_flat_sky_resummed
                lens_fn = lambda unl, clpp, lmax_out: np.asarray(
                    lens_cls_flat_sky_resummed(unl, clpp, lmax_out=lmax_out))
            elif lens_method == "first_order":
                from .lensed_cls import lens_cls_flat_sky as lens_fn
            else:
                raise ValueError(f"unknown lens_method {lens_method!r}")
            lpad = lmax + 400
            unl, clpp_exact = boltzlite.compute_cls(dict(self.p),
                                                    lmax=lpad,
                                                    lens_potential=True)
            _, clkk = self.cmb_lensing_limber(lpad, nonlinear=nonlinear)
            ells = np.arange(lpad + 1, dtype=np.float64)
            clpp = np.zeros(lpad + 1)
            clpp[2:] = (4.0 * np.asarray(clkk)
                        / (ells[2:] ** 2 * (ells[2:] + 1.0) ** 2))
            # low L: the exact (non-Limber) LOS projection from the
            # Boltzmann solve replaces Limber (which errs ~1/L^2 there);
            # linear blend over L in [80, 130], Limber-only above (where
            # it is sub-0.1% and carries the nonlinear matter power)
            wts = np.clip((ells - 80.0) / 50.0, 0.0, 1.0)
            clpp = wts * clpp + (1.0 - wts) * clpp_exact[:lpad + 1]
            total = lens_fn(unl, clpp, lmax_out=lmax)
            dd = np.zeros((lmax + 1, 3))
            dd[2:] = 0.0
            dd[2:, 0] = (clpp[2:lmax + 1] * (ells[2:lmax + 1]
                         * (ells[2:lmax + 1] + 1.0)) ** 2 / (2.0 * np.pi))
            return {"total": total, "unlensed_scalar": unl[:lmax + 1],
                    "lens_potential": dd, "approx": True}
        del nonlinear

        def cut(arr):
            arr = np.asarray(arr, dtype=np.float64)
            n = lmax + 1
            if arr.shape[0] >= n:
                return arr[:n]
            pad = [(0, n - arr.shape[0])] + [(0, 0)] * (arr.ndim - 1)
            return np.pad(arr, pad, constant_values=np.nan)

        out = {}
        if "cls_lensed" in self.cls_table:
            out["total"] = cut(self.cls_table["cls_lensed"])
        if "cls_unlensed" in self.cls_table:
            out["unlensed_scalar"] = cut(self.cls_table["cls_unlensed"])
        if "cls_lens_potential" in self.cls_table:
            out["lens_potential"] = cut(self.cls_table["cls_lens_potential"])
        if not out:
            raise ValueError(
                "cls_table has none of the recognized keys "
                "('cls_lensed', 'cls_unlensed', 'cls_lens_potential')")
        return out

    def cmb_lensing_kk_exact(self, lmax, lens_potential_accuracy=4):
        """Exact (non-Limber) C_kappakappa from a tabulated lensing
        potential (reference cosmology.py:660-691: CAMB deflection Cls
        [L(L+1)]^2 C_phiphi / 2pi, converted by * 2pi / 4)."""
        del lens_potential_accuracy
        if self.cls_table is None or "cls_lens_potential" not in (
                self.cls_table or {}):
            raise NotImplementedError(
                "Exact C_kk requires a tabulated lensing potential "
                "(cls_table['cls_lens_potential'], from "
                "tools/gen_camb_table.py); use cmb_lensing_limber "
                "otherwise.")
        cl = np.asarray(self.cls_table["cls_lens_potential"],
                        dtype=np.float64)
        if cl.ndim > 1:          # CAMB get_lens_potential_cls returns (nl,3)
            cl = cl[:, 0]
        if cl.size < lmax + 1:   # NaN-pad like get_cmb_cls, don't truncate
            cl = np.concatenate([cl, np.full(lmax + 1 - cl.size, np.nan)])
        cl = cl[:lmax + 1]
        ells = np.arange(cl.size)
        return ells, cl * 2.0 * np.pi / 4.0

    # ---- baryon combinators ----
    def total_matter_power_spectrum(self, Pnn, Pne, Pee):
        from .power import total_matter_power_spectrum
        return total_matter_power_spectrum(self.p["omch2"], self.p["ombh2"],
                                           Pnn, Pne, Pee)

    def total_matter_galaxy_power_spectrum(self, Pgn, Pge):
        from .power import total_matter_galaxy_power_spectrum
        return total_matter_galaxy_power_spectrum(self.p["omch2"],
                                                  self.p["ombh2"], Pgn, Pge)
