"""kSZ velocity-reconstruction forecasting (reference: hmvec/ksz.py).

Linear matter power at k < 0.1/Mpc drives the large-scale Pgv/Pvv/Pgg;
the halo model at k > 0.1/Mpc drives the small-scale Pge/Pee/Pgg.  The
reference's per-z python loops (ksz.py:198-233) are vectorized over z, and
its CLASS-only growth rate is replaced by the autodiff growth rate
(models/background.growth_rate_f).

The two CMB kSZ auto-spectrum paths (Ma&Fry squeezed limit and the Smith et
al B28 full P_q_perp) are implemented with vmapped grids instead of the
reference's triple python loops (ksz.py:471-658, :661-873); they also fix
the reference's bit-rotted `pksz.pars` attribute accesses (ksz.py:632,:847).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..params import default_params, merge_params
from ..ops.quadrature import trapz_traced
from . import background as bgmod
from .halo_model import HaloModel

defaults = {"min_mass": 1e6, "max_mass": 1e16, "num_mass": 1000}
constants = {
    "thompson_SI": 6.6524e-29,
    "meter_to_megaparsec": 3.241e-23,
    "G_SI": 6.674e-11,
    "mProton_SI": 1.673e-27,
    "H100_SI": 3.241e-18,
}


def Ngg(ngal_mpc3):
    """Galaxy shot noise (ksz.py:31-32)."""
    return 1.0 / ngal_mpc3


def get_survey_volume(zmin, zmax, fsky, params=None):
    """Overlap volume in Gpc^3 (ksz.py:35-39), engine-free."""
    from .cosmology import Cosmology
    c = Cosmology(params=params, accuracy="low")
    chimin = c.comoving_radial_distance(zmin)
    chimax = c.comoving_radial_distance(zmax)
    return float(fsky * (4.0 / 3.0) * np.pi * (chimax**3 - chimin**3) / 1e9)


def get_kmin(volume_gpc3):
    """Box fundamental mode (ksz.py:66-68)."""
    vol_mpc3 = volume_gpc3 * 1e9
    return np.pi / vol_mpc3 ** (1.0 / 3.0)


def chi_ion(Yp, NHe=0):
    """Ionization fraction factor (ksz.py:71-73)."""
    return (1.0 - Yp * (1.0 - NHe / 4.0)) / (1.0 - Yp / 2.0)


# reference-named alias (ksz.py:71)
chi = chi_ion


def ne0_shaw(ombh2, Yp, NHe=0, me=1.14, gasfrac=0.9):
    """Mean electron density today in 1/m^3 (Shaw et al, 1109.0553 Eq 3;
    reference ksz.py:75-84).  Constant chain folded host-side."""
    omgh2 = gasfrac * ombh2
    mu_e = 1.14
    fact = 3.0 * constants["H100_SI"] ** 2 / (
        constants["mProton_SI"] * 8.0 * np.pi * constants["G_SI"])
    return chi_ion(Yp, NHe) * omgh2 * fact / mu_e


def ksz_radial_function(z, ombh2, Yp, gasfrac=0.9, xe=1, tau=0, params=None):
    """K(z) = T_CMB sigma_T n_e0 x_e exp(-tau) (1+z)^2 (1810.13423 Eq 4;
    reference ksz.py:86-96).

    Trace-friendly in (ombh2, Yp): only the fixed physical constants are
    folded host-side (keeping device intermediates mid-range for the TPU's
    double-single f64)."""
    if params is None:
        params = default_params
    T_CMB_muk = params["T_CMB"]
    # host-folded constant part of ne0_shaw (everything but chi(Yp)*ombh2)
    ne0_const = (0.9 / 1.14) * 3.0 * constants["H100_SI"] ** 2 / (
        constants["mProton_SI"] * 8.0 * np.pi * constants["G_SI"])
    pref_const = (constants["thompson_SI"] / constants["meter_to_megaparsec"]
                  * ne0_const * (gasfrac / 0.9))
    ne0_param = chi_ion(Yp) * ombh2
    pref = T_CMB_muk * pref_const * ne0_param
    return pref * (1.0 + jnp.asarray(z)) ** 2 * xe * np.exp(-tau)


def _sanitize(x):
    """Zero out non-finite entries (reference ksz.py:98-100)."""
    return jnp.where(jnp.isfinite(x), x, 0.0)


def get_interpolated_cls(Cls, chistar, kss):
    """C_tot(l = chistar*k) by integer lookup; inf beyond lmax, zero below
    l=2 (reference ksz.py:422-431)."""
    Cls = jnp.asarray(Cls)
    ls = jnp.arange(Cls.shape[0])
    Cls = jnp.where(ls < 2, 0.0, Cls)
    ell = chistar * jnp.asarray(kss)
    idx = jnp.clip(ell.astype(jnp.int32), 0, Cls.shape[0] - 1)
    return jnp.where(ell <= Cls.shape[0] - 1, Cls[idx], jnp.inf)


def Nvv_core_integral(chi_star, Fstar, mu, kL, kSs, Cls, Pge, Pgg_tot,
                      Pgg_photo_tot=None, errs=False, robust_term=False,
                      photo=True):
    """Velocity reconstruction noise N_vv(mu, kL) (reference ksz.py:299-336).

    Pge/Pgg_tot are either (nkS,) or broadcastable (..., nkS); the kS
    integral is one weighted reduction.
    """
    if robust_term and photo:
        photo = False

    if errs:
        ret_Pge = Pge
        Pge = 1.0

    mu = jnp.asarray(mu)
    kL = jnp.asarray(kL)
    amu = mu[:, None] + 0.0 * kL[None, :]
    prefact = amu ** (-2.0) * 2.0 * jnp.pi * chi_star**2 / Fstar**2

    # double-where: mask the inf (beyond-lmax) Cls entries out of the
    # division itself, not just the result, so gradients stay finite
    Clkstot = get_interpolated_cls(Cls, chi_star, kSs)
    finite = jnp.isfinite(Clkstot) & (Clkstot > 0)
    Cl_safe = jnp.where(finite, Clkstot, 1.0)
    integrand = jnp.where(finite,
                          jnp.asarray(kSs) * Pge**2 / (Pgg_tot * Cl_safe),
                          0.0)
    integrand = _sanitize(integrand)
    if robust_term:
        assert Pgg_photo_tot is not None
        integrand = _sanitize(integrand * (Pgg_photo_tot / Pgg_tot))

    integral = trapz_traced(integrand, jnp.asarray(kSs), axis=-1)
    Nvv = prefact / integral
    if errs:
        return Nvv, ret_Pge
    return Nvv


def pge_err_core(pgv_int, kstar, chistar, volume_gpc3, kss, ks_bin_edges,
                 pggtot, Cls):
    """Bandpower errors on Pge (reference ksz.py:43-63)."""
    volume = volume_gpc3 * 1e9
    cltot = get_interpolated_cls(Cls, chistar, kss)
    integrand = _sanitize(jnp.asarray(kss) / (pggtot * cltot))
    kss = jnp.asarray(kss)
    # vectorized over bins: trapezoid segments masked per (bin, segment) --
    # edges may be traced, so one compile covers any binning
    edges = jnp.asarray(ks_bin_edges)
    sel = (kss[None, :] > edges[:-1, None]) & (kss[None, :] <= edges[1:, None])
    dx = jnp.diff(kss)
    pair = sel[:, 1:] & sel[:, :-1]
    seg = (integrand[1:] + integrand[:-1])[None, :] / 2.0 * dx[None, :] * pair
    ints = seg.sum(axis=-1)
    return (volume * kstar**2 / 12.0 / jnp.pi**3 / chistar**2
            * pgv_int * ints) ** (-0.5)


class kSZ(HaloModel):
    """kSZ forecasting pipeline (reference kSZ.__init__, ksz.py:103-235)."""

    def __init__(self, zs, volumes_gpc3, ngals_mpc3,
                 kL_max=0.1, num_kL_bins=100, kS_min=0.1, kS_max=10.0,
                 num_kS_bins=101, num_mu_bins=102, ms=None, params=None,
                 mass_function="sheth-torman", halofit=None, mdef="vir",
                 nfw_numeric=False, skip_nfw=False,
                 electron_profile_name="e", electron_profile_family="AGN",
                 skip_electron_profile=False,
                 electron_profile_param_override=None,
                 electron_profile_nxs=None, electron_profile_xmax=None,
                 skip_hod=False, hod_name="g", hod_corr="max",
                 hod_param_override=None, mthreshs_override=None,
                 verbose=False, b1=None, b2=None, sigz=None, engine="eh",
                 pk_table=None):
        del verbose
        if ms is None:
            ms = np.geomspace(defaults["min_mass"], defaults["max_mass"],
                              defaults["num_mass"])
        zs = np.atleast_1d(np.asarray(zs, dtype=np.float64))
        volumes_gpc3 = np.atleast_1d(np.asarray(volumes_gpc3, dtype=np.float64))
        ngals_mpc3 = np.atleast_1d(np.asarray(ngals_mpc3, dtype=np.float64))
        assert zs.size == volumes_gpc3.size == ngals_mpc3.size

        ks = np.geomspace(kS_min, kS_max, num_kS_bins)
        self.mu = jnp.asarray(np.linspace(-1.0, 1.0, num_mu_bins))
        super().__init__(zs, ks, ms=ms, params=params,
                         mass_function=mass_function, halofit=halofit,
                         mdef=mdef, nfw_numeric=nfw_numeric,
                         skip_nfw=skip_nfw, engine=engine, pk_table=pk_table)
        self.kS = self.ks
        if not skip_electron_profile:
            self.add_battaglia_profile(
                name=electron_profile_name, family=electron_profile_family,
                param_override=electron_profile_param_override,
                nxs=electron_profile_nxs, xmax=electron_profile_xmax)
        if not skip_hod:
            self.add_hod(hod_name, mthresh=mthreshs_override,
                         ngal=None if mthreshs_override is not None else ngals_mpc3,
                         corr=hod_corr, satellite_profile_name="nfw",
                         central_profile_name=None,
                         param_override=hod_param_override)

        self.zs_np = zs
        self.sigz = sigz
        self.sigma_z_func = lambda z: sigz * (1.0 + np.asarray(z))
        self.Hphotozs = self.h_of_z(jnp.asarray(zs))

        # long-wavelength grids (common k_min across z, ksz.py:155-176)
        self.kLs = jnp.asarray(np.geomspace(get_kmin(np.max(volumes_gpc3)),
                                            kL_max, num_kL_bins))
        self.krs = self.mu[:, None] * self.kLs[None, :]
        self.Vs = volumes_gpc3
        self.ngals_mpc3 = ngals_mpc3

        # small-scale halo-model spectra
        if not skip_hod:
            sPgg = self.get_power(hod_name, name2=hod_name, b1=b1, b2=b1)
            sPge = self.get_power(hod_name, name2=electron_profile_name, b1=b1)
            if sigz is not None:
                W = self.Wphoto_all()            # (nz, nmu, nkL)
                self.sPggs = sPgg[:, None, None, :] * W[..., None] ** 2
                self.sPges = sPge[:, None, None, :] * W[..., None]
            else:
                self.sPggs = sPgg
                self.sPges = sPge

        # linear P(kL, z) and growth rate
        p = self.P_lin_slow(self.kLs, jnp.asarray(zs))       # (nz, nkL)
        growth = self.get_growth_rate_f(jnp.asarray(zs))     # (nz,)
        a = 1.0 / (1.0 + jnp.asarray(zs))
        H = self.h_of_z(jnp.asarray(zs))

        self.Pmms = jnp.broadcast_to(p[:, None, :],
                                     (zs.size, self.mu.size, self.kLs.size))
        self.fs = growth
        self.adotf = growth * a * H
        self.d2vs = (growth * a * H)[:, None] / self.kLs[None, :]  # (nz,nkL)
        self.kstars = ksz_radial_function(jnp.asarray(zs), self.ombh2,
                                          self.YHe, params=self.p)
        self.chistars = self.comoving_radial_distance(jnp.asarray(zs))
        if not skip_hod:
            self.bgs = self.hods[hod_name]["bg"]

            # velocity-reconstruction integral per z (ksz.py:215-222)
            nggs = Ngg(jnp.asarray(ngals_mpc3))
            flPgg = self.Pmms[:, 0, :] * self.bgs[:, None] ** 2 + nggs[:, None]
            flPgv = self.Pmms[:, 0, :] * self.bgs[:, None] * self.d2vs
            integrand = _sanitize(self.kLs[None, :] ** 2 * flPgv**2 / flPgg)
            self.vrec = trapz_traced(integrand, self.kLs, axis=-1)

            # small-scale totals (ksz.py:224-233)
            if sigz is not None:
                self.sPggtot = self.sPggs + nggs[:, None, None, None]
            else:
                self.sPggtot = self.sPggs + nggs[:, None]
            self.sPge = self.sPges

    # ---- long-wavelength spectra (ksz.py:246-277) ----
    def Wphoto(self, zindex):
        """Photo-z damping W(mu, kL) = exp(-sigz^2 kr^2 / 2 H^2)
        (ksz.py:283-287)."""
        z = self.zs_np[zindex]
        H = self.Hphotozs[zindex]
        return jnp.exp(-self.sigma_z_func(z) ** 2 * self.krs**2 / 2.0 / H**2)

    def Wphoto_all(self):
        sig = jnp.asarray(self.sigma_z_func(self.zs_np))     # (nz,)
        return jnp.exp(-(sig[:, None, None] ** 2) * self.krs[None] ** 2
                       / 2.0 / self.Hphotozs[:, None, None] ** 2)

    def lPvv(self, zindex, bv1=1, bv2=1):
        """(faH/kL)^2 Pmm(kL) as (nmu, nkL) (ksz.py:246-257)."""
        return (self.d2vs[zindex][None, :] ** 2 * self.Pmms[zindex]
                * bv1 * bv2)

    def lPgg(self, zindex, bg1, bg2):
        Pgg = self.Pmms[zindex] * bg1 * bg2
        if self.sigz is not None:
            Pgg = Pgg[..., None] * self.Wphoto(zindex)[..., None] ** 2
        return Pgg

    def lPgv(self, zindex, bg, bv=1):
        Pgv = self.Pmms[zindex] * bg * bv * self.d2vs[zindex][None, :]
        if self.sigz is not None:
            Pgv = Pgv[..., None] * self.Wphoto(zindex)[..., None]
        return Pgv

    def ksz_radial_function(self, zindex, gasfrac=0.9, xe=1, tau=0,
                            params=None):
        return ksz_radial_function(self.zs_np[zindex], self.ombh2, self.YHe,
                                   gasfrac=gasfrac, xe=xe, tau=tau,
                                   params=params or self.p)

    def Nvv(self, zindex, Cls):
        """N_vv(mu, kL) for one z bin (ksz.py:290-296)."""
        return Nvv_core_integral(self.chistars[zindex], self.kstars[zindex],
                                 self.mu, self.kLs, self.kS, Cls,
                                 self.sPge[zindex], self.sPggtot[zindex])

    def Pge_err(self, zindex, ks_bin_edges, Cls):
        """Pge bandpower errors (ksz.py:237-244)."""
        pggtot = self.sPggtot[zindex]
        if self.sigz is not None:
            pggtot = pggtot[0, 0]
        return pge_err_core(self.vrec[zindex], self.kstars[zindex],
                            self.chistars[zindex], self.Vs[zindex], self.kS,
                            ks_bin_edges, pggtot, Cls)


def Nvv(z, vol_gpc3, ngals_mpc3, Cl_total, sigz=None, kL_max=0.1,
        num_kL_bins=100, kS_min=0.1, kS_max=10.0, num_kS_bins=101,
        num_mu_bins=102, params=None):
    """Convenience wrapper (reference ksz.py:876-932).  Returns
    (mus, kLs, N_vv)."""
    hksz = kSZ([z], [vol_gpc3], [ngals_mpc3], kL_max=kL_max,
               num_kL_bins=num_kL_bins, kS_min=kS_min, kS_max=kS_max,
               num_kS_bins=num_kS_bins, num_mu_bins=num_mu_bins,
               sigz=sigz, params=params)
    return hksz.mu, hksz.kLs, hksz.Nvv(0, Cl_total)


def get_ksz_snr(volume_gpc3, z, ngal_mpc3, Cls, bg=None, params=None,
                kL_max=0.1, num_kL_bins=100, kS_min=0.1, kS_max=10.0,
                num_kS_bins=101, num_mu_bins=102, ms=None,
                mass_function="sheth-torman", mdef="vir", nfw_numeric=False,
                electron_profile_family="AGN", electron_profile_nxs=None,
                electron_profile_xmax=None, sigz=None):
    """Total kSZ velocity SNR (reference ksz.py:435-468)."""
    fksz = kSZ([z], [volume_gpc3], [ngal_mpc3], kL_max=kL_max,
               num_kL_bins=num_kL_bins, kS_min=kS_min, kS_max=kS_max,
               num_kS_bins=num_kS_bins, num_mu_bins=num_mu_bins, ms=ms,
               params=params, mass_function=mass_function, mdef=mdef,
               nfw_numeric=nfw_numeric,
               electron_profile_family=electron_profile_family,
               electron_profile_nxs=electron_profile_nxs,
               electron_profile_xmax=electron_profile_xmax, sigz=sigz)
    V = volume_gpc3 * 1e9
    ngg = Ngg(ngal_mpc3)
    nvv = fksz.Nvv(0, Cls)
    if bg is None:
        bg = fksz.bgs[0]
    lPgg = fksz.lPgg(0, bg1=bg, bg2=bg)
    lPgv = fksz.lPgv(0, bg=bg)
    if sigz is not None:
        lPgg = lPgg[..., 0]
        lPgv = lPgv[..., 0]
    ltPgg = lPgg + ngg
    kls = fksz.kLs
    integrand = _sanitize(kls[None, :] ** 2 * lPgv**2 / ltPgg / nvv)
    result = trapz_traced(integrand, kls, axis=-1)
    snr2 = trapz_traced(result, fksz.mu) / (2.0 * jnp.pi) ** 2
    return jnp.sqrt(V * snr2), fksz


def get_ksz_template_signal_snapshot(ells, volume_gpc3, z, ngal_mpc3, bg,
                                     fparams=None, params=None, **ksz_kwargs):
    """C_ell^(That T): kSZ template x CMB cross (reference ksz.py:340-419)."""
    fksz = kSZ([z], [volume_gpc3], [ngal_mpc3], params=fparams,
               electron_profile_param_override=fparams, **ksz_kwargs)
    pksz = (kSZ([z], [volume_gpc3], [ngal_mpc3], params=params,
                electron_profile_param_override=params, **ksz_kwargs)
            if params is not None else fksz)

    ngg = Ngg(ngal_mpc3)
    fsPgg = fksz.sPggs[0] + ngg
    fsPge = fksz.sPges[0]
    psPge = pksz.sPges[0] if params is not None else fsPge

    chistar = pksz.comoving_radial_distance(z)
    ratio = _sanitize(fsPge * psPge / fsPgg)
    Pks = jnp.interp(jnp.asarray(ells) / chistar, fksz.kS, ratio,
                     left=0.0, right=0.0)

    fF = fksz.ksz_radial_function(0)
    pF = pksz.ksz_radial_function(0) if params is not None else fF
    V = volume_gpc3 * 1e9
    pref = fF * pF * V ** (1.0 / 3.0) / 6.0 / jnp.pi**2 / chistar**2

    flPgg = fksz.lPgg(0, bg1=bg, bg2=bg)[0, :] + ngg
    flPgv = fksz.lPgv(0, bg=bg)[0, :]
    plPgv = pksz.lPgv(0, bg=bg)[0, :] if params is not None else flPgv
    kls = fksz.kLs
    integrand = _sanitize(kls**2 * flPgv * plPgv / flPgg)
    vrec = trapz_traced(integrand, kls)
    return pref * Pks * vrec, fksz, pksz


def get_ksz_auto_squeezed(ells, volume_gpc3, zs, ngals_mpc3, bgs,
                          params=None, k_max=100.0, num_k_bins=200,
                          num_mu_bins=102, ms=None,
                          mass_function="sheth-torman", mdef="vir",
                          nfw_numeric=False, electron_profile_family="AGN",
                          electron_profile_nxs=None,
                          electron_profile_xmax=None, pksz_in=None,
                          template=False, ngals_mpc3_for_v=None):
    """CMB kSZ auto power, Ma & Fry squeezed limit (reference
    ksz.py:661-873), vectorized over (ell, chi) instead of python loops.

    Returns (pksz, cl, spec_dict); cl in uK^2.
    """
    spec_dict = {}
    zs = np.sort(np.atleast_1d(np.asarray(zs, dtype=np.float64)))
    volumes = volume_gpc3 * np.ones_like(zs)
    if ngals_mpc3_for_v is None:
        ngals_mpc3_for_v = ngals_mpc3
    p = merge_params(params)
    p["hod_bisection_search_min_log10mthresh"] = 1

    if pksz_in is not None:
        pksz = pksz_in
    else:
        pksz = kSZ(zs, volumes, np.asarray(ngals_mpc3) * np.ones_like(zs),
                   kL_max=k_max, num_kL_bins=num_k_bins,
                   kS_min=get_kmin(volume_gpc3), kS_max=k_max,
                   num_kS_bins=num_k_bins, num_mu_bins=num_mu_bins, ms=ms,
                   params=p, mass_function=mass_function, mdef=mdef,
                   nfw_numeric=nfw_numeric,
                   electron_profile_family=electron_profile_family,
                   electron_profile_nxs=electron_profile_nxs,
                   electron_profile_xmax=electron_profile_xmax,
                   skip_hod=not template, b1=bgs, b2=bgs)

    ks = pksz.kS
    spec_dict["ks"] = ks
    kls = pksz.kLs
    nz = zs.size

    if not template:
        sPee = pksz.get_power("e", name2="e")                # (nz, nk)
        lPvv = jnp.stack([pksz.lPvv(zi)[0, :] for zi in range(nz)])
        spec_dict["sPee"] = sPee
        spec_dict["lPvv"] = lPvv
        vint = trapz_traced(_sanitize(kls[None, :] ** 2 * lPvv), kls, axis=-1)
        Pqr = sPee * vint[:, None] / (6.0 * jnp.pi**2)       # (nz, nk)
    else:
        ngals = np.atleast_1d(np.asarray(ngals_mpc3)) * np.ones_like(zs)
        ngals_v = np.atleast_1d(np.asarray(ngals_mpc3_for_v)) * np.ones_like(zs)
        sPgg_e = pksz.sPggs + (1.0 / jnp.asarray(ngals))[:, None]
        sPgg_v = pksz.sPggs + (1.0 / jnp.asarray(ngals_v))[:, None]
        sPge = pksz.sPges
        lPgv = jnp.stack([pksz.lPgv(zi, bg=bgs[zi])[0, :] for zi in range(nz)])
        lPgg = jnp.stack([pksz.lPgg(zi, bgs[zi], bgs[zi])[0, :]
                          for zi in range(nz)]) + (1.0 / jnp.asarray(ngals_v))[:, None]
        spec_dict.update(sPgg=sPgg_e, sPge=sPge, lPgv=lPgv, lPgg=lPgg)
        # reference integrates Pgv^2/sPgg_v on the kL grid (ksz.py:806-810):
        # sPgg_v is defined on the kS grid == kL grid here (same num_k_bins)
        vint = trapz_traced(_sanitize(kls[None, :] ** 2 * lPgv**2 / sPgg_v),
                            kls, axis=-1)
        Pqr = _sanitize(sPge**2 / sPgg_e) * vint[:, None] / (6.0 * jnp.pi**2)

    # Limber-like integral over chi for each ell (ksz.py:828-861), vmapped
    ells = jnp.asarray(np.atleast_1d(ells), dtype=jnp.float64)
    chi_max = pksz.comoving_radial_distance(zs[-1])
    ne0 = ne0_shaw(float(pksz.ombh2), float(pksz.YHe))
    kfact = (constants["thompson_SI"] * ne0
             / constants["meter_to_megaparsec"]) ** 2
    tcmb_uk = float(pksz.p["T_CMB"])  # already in uK

    lks = jnp.log(ks)
    zs_j = jnp.asarray(zs)

    def one_ell(ell):
        chi_min = ell / 30.0
        chi_int = jnp.geomspace(chi_min, chi_max, 100)
        k_int = ell / chi_int
        z_int = bgmod.redshift_at_comoving_radial_distance(pksz.bg, chi_int)
        # bilinear interp of Pqr at (z_int, k_int)
        iz = jnp.clip(jnp.searchsorted(zs_j, z_int) - 1, 0, nz - 2) if nz > 1 else jnp.zeros(chi_int.shape, jnp.int32)
        if nz > 1:
            tz = jnp.clip((z_int - zs_j[iz]) / (zs_j[iz + 1] - zs_j[iz]), 0.0, 1.0)
            P_lo = Pqr[iz]
            P_hi = Pqr[iz + 1]
            Pz = P_lo * (1 - tz)[:, None] + P_hi * tz[:, None]
        else:
            Pz = jnp.broadcast_to(Pqr[0][None, :], (chi_int.size, ks.size))
        lke = jnp.log(k_int)
        ik = jnp.clip(jnp.searchsorted(lks, lke) - 1, 0, ks.size - 2)
        tk = (lke - lks[ik]) / (lks[ik + 1] - lks[ik])
        rows = jnp.arange(chi_int.size)
        pv = Pz[rows, ik] * (1 - tk) + Pz[rows, ik + 1] * tk
        pv = jnp.where((k_int < ks[0]) | (k_int > ks[-1]), 0.0, pv)
        integrand = pv / chi_int**2 * (1.0 + z_int) ** 4
        integrand = integrand * kfact * tcmb_uk**2
        return trapz_traced(integrand, chi_int)

    cl = jax.vmap(one_ell)(ells)
    return pksz, cl, spec_dict


def get_ksz_auto_signal_mafry(ells, volume_gpc3, zs, ngal_mpc3, bg,
                              params=None, k_max=100.0, num_k_bins=200,
                              num_mu_bins=102, ms=None,
                              mass_function="sheth-torman", mdef="vir",
                              nfw_numeric=False,
                              electron_profile_family="AGN",
                              electron_profile_nxs=None,
                              electron_profile_xmax=None, pksz_in=None):
    """CMB kSZ auto power via the full Smith et al (B28) P_q_perp double
    integral (reference ksz.py:471-658), with the (z, k, k', mu') mesh
    evaluated as one vmapped grid instead of a triple python loop.

    Returns (pksz, cl); cl in uK^2.
    """
    zs = np.sort(np.atleast_1d(np.asarray(zs, dtype=np.float64)))
    volumes = volume_gpc3 * np.ones_like(zs)
    ngals = ngal_mpc3 * np.ones_like(zs)

    if pksz_in is not None:
        pksz = pksz_in
    else:
        pksz = kSZ(zs, volumes, ngals, kL_max=k_max, num_kL_bins=num_k_bins,
                   kS_min=get_kmin(volume_gpc3), kS_max=k_max,
                   num_kS_bins=num_k_bins, num_mu_bins=num_mu_bins, ms=ms,
                   params=params, mass_function=mass_function, mdef=mdef,
                   nfw_numeric=nfw_numeric,
                   electron_profile_family=electron_profile_family,
                   electron_profile_nxs=electron_profile_nxs,
                   electron_profile_xmax=electron_profile_xmax,
                   skip_hod=True)

    ks = pksz.kS                      # (nk,)
    mus = pksz.mu                     # (nmu,)
    nz = zs.size
    sPee = pksz.get_power("e", name2="e")       # (nz, nk)
    Pmm = pksz.Pmms[:, 0, :]                    # (nz, nkL) with kL grid == ks
    adotf = pksz.adotf                          # (nz,)

    lks = jnp.log(ks)

    def interp_k(table_row, kq):
        """log-k linear interp of a (nk,) table at kq, 0 outside."""
        lkq = jnp.log(jnp.maximum(kq, 1e-300))
        ik = jnp.clip(jnp.searchsorted(lks, lkq) - 1, 0, ks.size - 2)
        t = (lkq - lks[ik]) / (lks[ik + 1] - lks[ik])
        v = table_row[ik] * (1 - t) + table_row[ik + 1] * t
        return jnp.where((kq < ks[0]) | (kq > ks[-1]), 0.0, v)

    kp = ks[:, None]                  # k' mesh (nk, 1)
    mu_m = mus[None, :]               # (1, nmu)

    def pqperp_one(z_i):
        pee_row, pmm_row, adotf_i = z_i

        def one_k(k):
            frac = (k * (k - 2.0 * kp * mu_m) * (1.0 - mu_m**2)
                    / (kp**2 * (kp**2 + k**2 - 2.0 * k * kp * mu_m)))
            kmkp = jnp.sqrt(kp**2 + k**2 - 2.0 * k * kp * mu_m)
            igr = kp**2 * frac * interp_k(pmm_row, kp + 0.0 * mu_m) \
                * interp_k(pee_row, kmkp)
            igr = jnp.where(jnp.isfinite(igr), igr, 0.0)
            inner = trapz_traced(jnp.moveaxis(igr, 0, -1), ks, axis=-1)
            outer = trapz_traced(inner, mus)
            return adotf_i**2 * (2.0 * jnp.pi) ** (-2) * outer

        return jax.vmap(one_k)(ks)

    Pqperp = jax.vmap(pqperp_one)((sPee, Pmm, adotf))   # (nz, nk)

    # C_ell integral (ksz.py:614-647)
    ells = jnp.asarray(np.atleast_1d(ells), dtype=jnp.float64)
    chi_max = pksz.comoving_radial_distance(zs[-1])
    ne0 = ne0_shaw(float(pksz.ombh2), float(pksz.YHe))
    kfact = (constants["thompson_SI"] * ne0
             / constants["meter_to_megaparsec"]) ** 2
    tcmb_uk = float(pksz.p["T_CMB"])
    zs_j = jnp.asarray(zs)

    def one_ell(ell):
        chi_min = ell / 30.0
        chi_int = jnp.geomspace(chi_min, chi_max, 100)
        k_int = ell / chi_int
        z_int = bgmod.redshift_at_comoving_radial_distance(pksz.bg, chi_int)
        if nz > 1:
            iz = jnp.clip(jnp.searchsorted(zs_j, z_int) - 1, 0, nz - 2)
            tz = jnp.clip((z_int - zs_j[iz]) / (zs_j[iz + 1] - zs_j[iz]), 0.0, 1.0)
            Pz = Pqperp[iz] * (1 - tz)[:, None] + Pqperp[iz + 1] * tz[:, None]
        else:
            Pz = jnp.broadcast_to(Pqperp[0][None, :], (chi_int.size, ks.size))
        lke = jnp.log(k_int)
        ik = jnp.clip(jnp.searchsorted(lks, lke) - 1, 0, ks.size - 2)
        t = (lke - lks[ik]) / (lks[ik + 1] - lks[ik])
        rows = jnp.arange(chi_int.size)
        pv = Pz[rows, ik] * (1 - t) + Pz[rows, ik + 1] * t
        pv = jnp.where((k_int < ks[0]) | (k_int > ks[-1]), 0.0, pv)
        integrand = pv / (chi_int**2 / (1.0 + z_int) ** 4)
        integrand = 0.5 * integrand * kfact * tcmb_uk**2
        return trapz_traced(integrand, chi_int)

    cl = jax.vmap(one_ell)(ells)
    return pksz, cl


def _survey_bins(zs, dndz, zedges, fsky, Ngals, params):
    """Host-side bin geometry: volumes, number densities, centers.

    Bin volumes use this framework's own background (the reference
    hardcodes astropy WMAP9 here, ksz.py:952 -- an inconsistency with the
    rest of its pipeline that we fix by using one cosmology throughout).
    """
    from .cosmology import Cosmology
    c = Cosmology(params=params, accuracy="low")
    zs = np.asarray(zs)
    dndz = np.asarray(dndz)
    tdndz = np.trapezoid(dndz, zs)
    vols_gpc3, ngals_mpc3, zcents = [], [], []
    for zmin, zmax in zip(zedges[:-1], zedges[1:]):
        zcent = (zmax + zmin) / 2.0
        chimin = float(c.comoving_radial_distance(zmin))
        chimax = float(c.comoving_radial_distance(zmax))
        vol = fsky * (4.0 / 3.0) * np.pi * (chimax**3 - chimin**3) / 1e9
        sel = np.logical_and(zs > zmin, zs <= zmax)
        fracz = np.trapezoid(dndz[sel], zs[sel]) / tdndz
        vols_gpc3.append(vol)
        ngals_mpc3.append(Ngals * fracz / (vol * 1e9))
        zcents.append(zcent)
    return vols_gpc3, ngals_mpc3, zcents


def get_ksz_snr_survey(zs, dndz, zedges, Cls, fsky, Ngals, bs=None,
                       sigz=None, params=None, **ksz_kwargs):
    """Total kSZ SNR from survey specs (reference ksz.py:936-988).

    Without photo-z damping this dispatches to the fused survey pipeline
    (pipeline.make_ksz_survey_fn): all bins run as ONE vmapped XLA program
    with traced bin parameters, instead of rebuilding the full halo-model
    pipeline per bin as the reference does.  With ``sigz`` it falls back
    to the per-bin class path (the photo-z-damped grids are bin-shaped).
    Extra kwargs take the class-API names (ms, num_kS_bins,
    electron_profile_nxs, ...) and are forwarded to either path.
    """
    nbins = len(zedges) - 1
    if bs is not None and len(bs) != nbins:
        raise ValueError("bs must have one bias per bin")
    vols_gpc3, ngals_mpc3, zcents = _survey_bins(zs, dndz, zedges, fsky,
                                                 Ngals, params)

    use_fused = sigz is None
    fused_kw = None
    if use_fused:
        import inspect
        from ..pipeline import make_ksz_survey_fn
        from ..params import merge_params
        p = merge_params(params)
        fused_kw = dict(ksz_kwargs)
        fused_kw["nxs"] = fused_kw.pop(
            "electron_profile_nxs",
            p["electron_density_profile_integral_numxs"])
        fused_kw["xmax"] = fused_kw.pop(
            "electron_profile_xmax",
            p["electron_density_profile_integral_xmax"])
        if "electron_profile_family" in fused_kw:
            fused_kw["family"] = fused_kw.pop("electron_profile_family")
        # class-API-only options (e.g. nfw_numeric) exist only on the
        # per-bin path; fall back rather than TypeError-ing
        accepted = set(inspect.signature(make_ksz_survey_fn).parameters)
        use_fused = not (set(fused_kw) - accepted)

    if use_fused:
        fn = make_ksz_survey_fn(nbins, **fused_kw)
        tot, snrs, bgals = fn(params, np.asarray(zcents),
                              np.asarray(vols_gpc3), np.asarray(ngals_mpc3),
                              np.asarray(Cls, dtype=np.float64),
                              bs=None if bs is None else np.asarray(bs))
        snrs = np.asarray(snrs)
        return (vols_gpc3, ngals_mpc3, zcents,
                [float(b) for b in np.asarray(bgals)], snrs, float(tot))

    snrs, bgs = [], []
    for i in range(nbins):
        snr, fksz = get_ksz_snr(vols_gpc3[i], zcents[i], ngals_mpc3[i], Cls,
                                bs[i] if bs is not None else None,
                                params=params, sigz=sigz, **ksz_kwargs)
        bgs.append(float(fksz.bgs[0]))
        snrs.append(float(snr))
    snrs = np.asarray(snrs)
    return vols_gpc3, ngals_mpc3, zcents, bgs, snrs, float(
        np.sqrt(np.sum(snrs**2)))
