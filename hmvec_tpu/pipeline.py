"""Fused end-to-end pipelines: params -> spectra, in one jit.

The class API (models.halo_model.HaloModel) is convenient for interactive
use; this module is the performance/differentiation surface: grids are
static (weights precomputed host-side), cosmological parameters are traced,
and the whole staged flow -- background -> linear power -> sigma^2 -> mass
function -> profiles -> P(k,z) [-> Limber C_ell] -- compiles to a single
XLA program.  jax.grad/jacfwd through these functions is the Fisher
flowdown of reference hmvec.py:50-64.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .params import merge_params
from .models import background as bgmod
from .models import linear_power as lpm
from .models import mass_function as mfm
from .models import profiles as prof
from .models import power as pwr
from .models import limber as limb


def _stages(p, zs, ks, ms, mass_function, mdef, accuracy, engine):
    """Shared staged computation: background through mass function + NFW."""
    bg = bgmod.background(p)
    zsj = jnp.asarray(zs)
    ksj = jnp.asarray(ks)
    msj = jnp.asarray(ms)

    # C1: linear power on the target grid
    if accuracy == "low":
        pzk = lpm.plin_approx(bg, zsj, ksj)
    else:
        pzk = engine.pzk_grid(bg, zsj, ksj)

    # C2: sigma^2 -> mass function
    ks_s2 = lpm.sigma2_k_grid(p)
    spzk = engine.plin(bg, zsj, ks_s2, accuracy=accuracy)
    rho_m0 = bgmod.rho_matter_z(bg, 0.0)
    R = mfm.R_from_M(msj, rho_m0, delta=1.0)
    sigma2 = lpm.sigma2_R(bg, R, zsj, spzk, ks_s2, p["Wkr_taylor_switch"])
    nzm, bh = mfm.mass_function_grid(sigma2, zsj, msj, rho_m0,
                                     mass_function, p)

    # C3: NFW profile
    omz = bgmod.omz(bg, zsj)
    rhocritz = bgmod.rho_critical_z(bg, zsj)
    rhomz = bgmod.rho_matter_z(bg, zsj)
    cs = prof.concentration_duffy(msj, zsj, mdef, p, p["H0"] / 100.0)
    rvirs = prof.rvir_grid(msj, zsj, mdef, rhocritz, rhomz, omz)
    rss = rvirs / cs
    uk = prof.nfw_uk_analytic(ksj, zsj, cs, rss)
    return bg, pzk, nzm, bh, rho_m0, uk


def make_pmm_fn(zs, ks, ms, mass_function: str = "sheth-torman",
                mdef: str = "vir", accuracy: str = "medium",
                engine=None, jit: bool = True):
    """Build params -> Pmm(1h+2h) on a static (zs, ks, ms) grid.

    The returned function takes a dict of cosmological parameter overrides
    (traced leaves allowed) and returns the (nz, nk) total matter power --
    the BASELINE config-1 workload (bin/simple_test.py semantics).
    """
    zs = np.asarray(zs)
    ks = np.asarray(ks)
    ms = np.asarray(ms)
    defaults = merge_params()
    engine = engine or lpm.EHEngine()

    def pmm(overrides=None):
        p = {**defaults, **(overrides or {})}
        _, pzk, nzm, bh, rho_m0, uk = _stages(
            p, zs, ks, ms, mass_function, mdef, accuracy, engine)
        tr = pwr.MatterTracer(uk=uk)
        return pwr.power_total(tr, tr, nzm, bh, ms, ks, pzk, rho_m0,
                               p["kstar_damping"])

    return jax.jit(pmm) if jit else pmm


def make_lensing_cls_fn(zs, ks, ms, ells, zsource: float = 1100.0,
                        mass_function: str = "sheth-torman",
                        mdef: str = "vir", accuracy: str = "medium",
                        engine=None, jit: bool = True):
    """Build params -> (C_kk, Pmm): halo-model lensing convergence spectrum
    (BASELINE config 4 semantics, reference cosmology.py:563-568)."""
    zs = np.asarray(zs)
    ks = np.asarray(ks)
    ms = np.asarray(ms)
    ells = np.asarray(ells)
    defaults = merge_params()
    engine = engine or lpm.EHEngine()

    def cls_fn(overrides=None):
        p = {**defaults, **(overrides or {})}
        bg, pzk, nzm, bh, rho_m0, uk = _stages(
            p, zs, ks, ms, mass_function, mdef, accuracy, engine)
        tr = pwr.MatterTracer(uk=uk)
        pmm = pwr.power_total(tr, tr, nzm, bh, ms, ks, pzk, rho_m0,
                              p["kstar_damping"])
        ckk = limb.C_kk(bg, jnp.asarray(ells), jnp.asarray(zs),
                        jnp.asarray(ks), pmm, lzs1=zsource, lzs2=zsource)
        return ckk, pmm

    return jax.jit(cls_fn) if jit else cls_fn


def make_electron_fn(zs, ks, ms, family: str = "AGN", nxs: int = None,
                     xmax: int = None, mass_function: str = "sheth-torman",
                     mdef: str = "vir", accuracy: str = "medium",
                     engine=None, jit: bool = True):
    """params -> (Pee, Pme): Battaglia electron spectra, one XLA program
    (BASELINE config 2: numeric profile transform + cross spectra)."""
    from .params import battaglia_defaults
    from .models import profiles as prof
    from .models.mass_conversion import mdelta_from_mdelta
    from .ops.sine_transform import generic_profile_fft

    zs = np.asarray(zs)
    ks = np.asarray(ks)
    ms = np.asarray(ms)
    defaults = merge_params()
    engine = engine or lpm.EHEngine()
    fit = dict(battaglia_defaults[family])

    def fn(overrides=None):
        p = {**defaults, **(overrides or {})}
        bg, pzk, nzm, bh, rho_m0, uk_nfw = _stages(
            p, zs, ks, ms, mass_function, mdef, accuracy, engine)
        if nxs is None:
            nxs_l = p["electron_density_profile_integral_numxs"]
        else:
            nxs_l = nxs
        xmax_l = p["electron_density_profile_integral_xmax"] if xmax is None else xmax

        zsj = jnp.asarray(zs)
        msj = jnp.asarray(ms)
        rhocritz = bgmod.rho_critical_z(bg, zsj)
        omz = bgmod.omz(bg, zsj)
        rhomz = bgmod.rho_matter_z(bg, zsj)
        cs = prof.concentration_duffy(msj, zsj, mdef, p, p["H0"] / 100.0)
        rvirs = prof.rvir_grid(msj, zsj, mdef, rhocritz, rhomz, omz)
        if mdef == "vir":
            dr1 = rhocritz * mfm.deltav_bryan_norman(omz)
        else:
            dr1 = rhomz * 200.0
        m200 = mdelta_from_mdelta(msj, cs, dr1, 200.0 * rhocritz)
        r200 = mfm.R_from_M(m200, rhocritz[:, None], delta=200.0)
        omb = p["ombh2"] / (p["H0"] / 100.0) ** 2
        omm = bg.omm0

        def rhofunc(xsamp):
            return prof.rho_gas_x(xsamp[None, None, :], m200[..., None],
                                  zsj[:, None, None], omb, omm,
                                  rhocritz[:, None, None],
                                  p["battaglia_gas_gamma"], fit)

        rgs = r200 / 2.0
        _, uk_e = generic_profile_fft(rhofunc, rvirs / rgs, rgs, zs, ks,
                                      xmax_l, nxs_l)
        te = pwr.MatterTracer(uk=uk_e)
        tn = pwr.MatterTracer(uk=uk_nfw)
        pee = pwr.power_total(te, te, nzm, bh, ms, ks, pzk, rho_m0,
                              p["kstar_damping"])
        pme = pwr.power_total(tn, te, nzm, bh, ms, ks, pzk, rho_m0,
                              p["kstar_damping"])
        return pee, pme

    return jax.jit(fn) if jit else fn


def make_hod_fn(zs, ks, ms, ngal, mass_function: str = "sheth-torman",
                mdef: str = "vir", accuracy: str = "medium", engine=None,
                jit: bool = True):
    """params -> (Pgg, Pgm): HOD galaxy spectra incl. the iterative
    ngal->mthresh solve, one XLA program (BASELINE config 3)."""
    from .models.hod import build_hod
    from .models import profiles as prof

    zs = np.asarray(zs)
    ks = np.asarray(ks)
    ms = np.asarray(ms)
    ngal = np.asarray(ngal)
    defaults = merge_params()
    engine = engine or lpm.EHEngine()

    def fn(overrides=None):
        p = {**defaults, **(overrides or {})}
        bg, pzk, nzm, bh, rho_m0, uk = _stages(
            p, zs, ks, ms, mass_function, mdef, accuracy, engine)
        hp = {k: p[k] for k in p if k.startswith("hod_")}
        grid = build_hod(zs, ms, nzm, bh, hp, ngal=jnp.asarray(ngal))
        tg = pwr.HODTracer(Nc=grid.Nc, Ns=grid.Ns, NsNsm1=grid.NsNsm1,
                           NcNs=grid.NcNs, ngal=grid.ngal, bg=grid.bg,
                           us=uk, uc=None)
        tn = pwr.MatterTracer(uk=uk)
        pgg = pwr.power_total(tg, tg, nzm, bh, ms, ks, pzk, rho_m0,
                              p["kstar_damping"])
        pgm = pwr.power_total(tg, tn, nzm, bh, ms, ks, pzk, rho_m0,
                              p["kstar_damping"])
        return pgg, pgm

    return jax.jit(fn) if jit else fn


def fisher_jacobian(fn, params0: dict, param_names):
    """d output / d theta for the named parameters -- the Fisher use case
    (reference design note hmvec.py:50-64) via forward-mode autodiff."""
    theta0 = jnp.asarray([params0[k] for k in param_names])

    def wrapped(theta):
        overrides = dict(params0)
        for i, name in enumerate(param_names):
            overrides[name] = theta[i]
        return fn(overrides)

    return jax.jacfwd(wrapped)(theta0)
