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


def _growth_mode_from(overrides, setting: str) -> str:
    """Resolve the growth-factor mode at trace time.

    'auto': no w0/wa override -> the LCDM-exact closed form; a concrete
    non-LCDM value -> the integrated growing mode
    (background.growth_table); a TRACED w0/wa -> 'ode' as well, because a
    traced value may be swept or differentiated (a Fisher derivative in
    w0/wa at the LCDM fiducial still needs the ODE -- the closed form's
    dD/dw0 is identically zero).  Pass 'closed'/'ode' to force; 'closed'
    is the right explicit choice when tracing w0/wa pinned at exactly
    (-1, 0) without differentiating them (e.g. the LCDM bench)."""
    if setting != "auto":
        return setting
    o = overrides or {}
    for key, fid in (("w0", -1.0), ("wa", 0.0)):
        if key in o:
            v = o[key]
            if isinstance(v, jax.core.Tracer):
                return "ode"
            if float(np.asarray(v)) != fid:
                return "ode"
    return "closed"


def _stages(p, zs, ks, ms, mass_function, mdef, accuracy, engine,
            fast_nfw: bool = False, growth_mode: str = "closed",
            uk_subsample=None, profile: str = "uk"):
    """Shared staged computation: background through mass function + NFW.

    fast_nfw: replace the f64 Si/Ci analytic NFW stage (the largest single
    on-chip cost of the flagship config) with the f32 Pallas kernel
    (ops/pallas_kernels.nfw_uk_fast, ~1e-6-class absolute on u; needs
    x64 for its double-single splits -- falls back to f64 otherwise).

    uk_subsample: (ksplit, every) -- serving-tier option: evaluate u(k)
    on a k-grid thinned by ``every`` below ``ksplit`` (where x = k r_s
    (1+z) << 1 for every halo and u is glass-smooth) and fill in by
    static-tap Catmull-Rom in ln k.  (0.2, 4) drops 41% of the NFW
    kernel work at 3.9e-6 on Pmm vs the twin; do NOT thin above
    ~0.3/Mpc -- u oscillates there for the largest high-z halos and
    aliases (measured 1e-3-class)."""
    bg = bgmod.background(p)
    zsj = jnp.asarray(zs)
    ksj = jnp.asarray(ks)
    msj = jnp.asarray(ms)

    # serving/fast tier: run the per-k EH transcendental chain in f32
    # (native VPU) instead of emulated f64 -- the measured C1 cost at
    # B=128 was 4.7 ms/cosmology dominated by this chain (DEVNOTES
    # round-4 attribution); ~1e-6-class on P, twin-gated
    f32_eh = (fast_nfw is True and jax.default_backend() != "cpu"
              and jax.config.jax_enable_x64
              and getattr(engine, "supports_fast_f32", False))

    # C1: linear power on the target grid
    if accuracy == "low":
        pzk = lpm.plin_approx(bg, zsj, ksj, growth_mode=growth_mode,
                              fast_f32=f32_eh)
    else:
        pzk = engine.pzk_grid(bg, zsj, ksj, growth_mode=growth_mode,
                              **({"fast_f32": True} if f32_eh else {}))

    # C2: sigma^2 -> mass function
    ks_s2 = lpm.sigma2_k_grid(p)
    spzk = engine.plin(bg, zsj, ks_s2, accuracy=accuracy,
                       growth_mode=growth_mode,
                       **({"fast_f32": True} if f32_eh else {}))
    rho_m0 = bgmod.rho_matter_z(bg, 0.0)
    R = mfm.R_from_M(msj, rho_m0, delta=1.0)
    # fast tier: double-single f32 MXU sigma^2 contraction (the emulated
    # f64 dot is ~21 GMAC/s and its batched form materializes a huge
    # expanded temp -- an HBM OOM at B >= 128); 'exact' keeps f64
    # without x64 the double-single split in _mixed32_matmul degrades
    # silently to plain f32 (lo parts vanish), so gate on it like the
    # fast-NFW condition below (ADVICE r4)
    s2_mm = "mixed32" if (fast_nfw is True
                          and jax.default_backend() != "cpu"
                          and jax.config.jax_enable_x64) else "f64"
    sigma2 = lpm.sigma2_R(bg, R, zsj, spzk, ks_s2, p["Wkr_taylor_switch"],
                          matmul=s2_mm)
    nzm, bh = mfm.mass_function_grid(sigma2, zsj, msj, rho_m0,
                                     mass_function, p)

    # C3: NFW profile.  fast_nfw: False = emulated-f64 XLA Si/Ci;
    # True = the v2 f32 Pallas kernel (~1e-6 on u); "exact" = the v3
    # double-single Pallas kernel (~1e-7 on u at Pallas speed -- the
    # f64-exact-build fast path, VERDICT round-2 item 3).
    omz = bgmod.omz(bg, zsj)
    rhocritz = bgmod.rho_critical_z(bg, zsj)
    rhomz = bgmod.rho_matter_z(bg, zsj)
    cs = prof.concentration_duffy(msj, zsj, mdef, p, p["H0"] / 100.0)
    rvirs = prof.rvir_grid(msj, zsj, mdef, rhocritz, rhomz, omz)
    rss = rvirs / cs
    if profile == "inputs":
        # fused-contraction serving path: the caller feeds (cs, rss)
        # straight into the Pallas contraction kernel -- no u(k) cube
        return bg, pzk, nzm, bh, rho_m0, (cs, rss)

    kq = ksj
    if uk_subsample is not None:
        from .utils.weights import catmull_taps_nonuniform
        ksplit, every = uk_subsample
        ks_np = np.asarray(ks)
        ilow = np.where(ks_np < ksplit)[0]
        sub = np.unique(np.concatenate([ilow[::every], ilow[-1:],
                                        np.where(ks_np >= ksplit)[0]]))
        tap_i, tap_w = catmull_taps_nonuniform(np.log(ks_np[sub]),
                                               np.log(ks_np))
        kq = jnp.asarray(ks_np[sub])
    if (fast_nfw and jax.default_backend() != "cpu"
            and jax.config.jax_enable_x64):
        if fast_nfw == "exact":
            from .ops.pallas_kernels import nfw_uk_fast_ds
            uk = nfw_uk_fast_ds(kq, zsj, cs, rss)
        else:
            from .ops.pallas_kernels import nfw_uk_fast
            uk = nfw_uk_fast(kq, zsj, cs, rss)
    else:
        uk = prof.nfw_uk_analytic(kq, zsj, cs, rss)
    if uk_subsample is not None:
        uk = sum(uk[..., jnp.asarray(tap_i[j])] * tap_w[j]
                 for j in range(4))
    return bg, pzk, nzm, bh, rho_m0, uk


def make_pmm_fn(zs, ks, ms, mass_function: str = "sheth-torman",
                mdef: str = "vir", accuracy: str = "medium",
                engine=None, jit: bool = True, fast: bool = False,
                growth: str = "auto", static_params: dict | None = None,
                uk_subsample=None, fused_serving: bool = False):
    """Build params -> Pmm(1h+2h) on a static (zs, ks, ms) grid.

    The returned function takes a dict of cosmological parameter overrides
    (traced leaves allowed) and returns the (nz, nk) total matter power --
    the BASELINE config-1 workload (bin/simple_test.py semantics).

    fast: production mode -- the Si/Ci NFW stage runs the f32 Pallas
    kernel (measured 1.2e-6 relative on Pmm vs the f64 twin, 8x inside
    the 1e-5 parity gate; fast=False is the 2e-8 all-f64 build).
    No-op on CPU or without x64.

    static_params: build-time (non-traced) default overrides -- e.g.
    {'sigma2_numks': 1250} for the batch-serving tier (the sigma^2
    integrand is smooth enough that 1250 Simpson points already sit at
    1.6e-8 vs the 10000-point twin; the k-grid must be static because it
    shapes the compiled program).
    """
    zs = np.asarray(zs)
    ks = np.asarray(ks)
    ms = np.asarray(ms)
    defaults = merge_params(static_params)
    engine = engine or lpm.EHEngine()

    if fused_serving:
        return _make_pmm_fused_fn(zs, ks, ms, mass_function, mdef,
                                  accuracy, engine, jit, growth, defaults,
                                  uk_subsample)

    def pmm(overrides=None):
        p = {**defaults, **(overrides or {})}
        _, pzk, nzm, bh, rho_m0, uk = _stages(
            p, zs, ks, ms, mass_function, mdef, accuracy, engine,
            fast_nfw=fast, growth_mode=_growth_mode_from(overrides, growth),
            uk_subsample=uk_subsample)
        tr = pwr.MatterTracer(uk=uk)
        return pwr.power_total(tr, tr, nzm, bh, ms, ks, pzk, rho_m0,
                               p["kstar_damping"],
                               fast_assembly=fast is True)

    return jax.jit(pmm) if jit else pmm


# test hook: run the fused contraction kernel in Pallas interpret mode
# (CPU twin-gating of the whole fused pipeline; see test_fast_sampling)
_FUSED_INTERPRET = False


def _make_pmm_fused_fn(zs, ks, ms, mass_function, mdef, accuracy, engine,
                       jit, growth, defaults, uk_subsample):
    """Fused-contraction serving tier (round 5): u(k) and its two mass
    integrals computed in ONE Pallas kernel pass,

        S1(z,k) = int dm n(m) (m/rho)^2 u^2      (1-halo)
        S2(z,k) = int dm n(m) b(m) (m/rho) u     (2-halo leg)

    accumulated over m-tiles in VMEM, so the (B, z, m, k) cube never
    round-trips HBM -- the measured ~2.9 ms/cosmology assembly cost of
    the vmapped serving path (DEVNOTES round-5 attribution).  The
    consistency completion (u -> 1 limit) is the same integrals with
    u = 1, i.e. plain sums -- no kernel needed.  Pmm parity vs the f64
    twin is gated in tests/test_fast_sampling.py.  Requires TPU + x64
    (same condition as the fast tier)."""
    from .utils.weights import trapz_weights, catmull_taps_nonuniform
    from .ops.pallas_kernels import nfw_contract_pallas

    w_m = np.asarray(trapz_weights(np.asarray(ms)))
    kq = np.asarray(ks)
    taps = None
    if uk_subsample is not None:
        ksplit, every = uk_subsample
        ks_np = np.asarray(ks)
        ilow = np.where(ks_np < ksplit)[0]
        sub = np.unique(np.concatenate([ilow[::every], ilow[-1:],
                                        np.where(ks_np >= ksplit)[0]]))
        taps = catmull_taps_nonuniform(np.log(ks_np[sub]), np.log(ks_np))
        kq = ks_np[sub]

    def pmm(overrides=None):
        p = {**defaults, **(overrides or {})}
        bg, pzk, nzm, bh, rho_m0, (cs, rss) = _stages(
            p, zs, ks, ms, mass_function, mdef, accuracy, engine,
            fast_nfw=True, growth_mode=_growth_mode_from(overrides, growth),
            profile="inputs")
        mfac = jnp.asarray(ms)[None, :] / rho_m0
        a_zm = w_m[None, :] * nzm * mfac**2
        b_zm = w_m[None, :] * nzm * bh * mfac
        c_z = jnp.sum(b_zm, axis=1)           # u -> 1 consistency
        scales = rss * (1.0 + jnp.asarray(zs)[:, None])
        s1, s2 = nfw_contract_pallas(kq, scales, cs, a_zm, b_zm,
                                     interpret=_FUSED_INTERPRET)
        if taps is not None:
            tap_i, tap_w = taps
            s1 = sum(s1[..., jnp.asarray(tap_i[j])] * tap_w[j]
                     for j in range(4))
            s2 = sum(s2[..., jnp.asarray(tap_i[j])] * tap_w[j]
                     for j in range(4))
        s1 = s1.astype(jnp.float64)
        s2 = s2.astype(jnp.float64)
        damping = 1.0 - jnp.exp(-((jnp.asarray(ks)
                                   / p["kstar_damping"]) ** 2))
        e = s2 + 1.0 - c_z[:, None]
        return s1 * damping[None, :] + pzk * e**2

    return jax.jit(pmm) if jit else pmm


def make_lensing_cls_fn(zs, ks, ms, ells, zsource: float = 1100.0,
                        mass_function: str = "sheth-torman",
                        mdef: str = "vir", accuracy: str = "medium",
                        engine=None, jit: bool = True, fast: bool = False,
                        growth: str = "auto"):
    """Build params -> (C_kk, Pmm): halo-model lensing convergence spectrum
    (BASELINE config 4 semantics, reference cosmology.py:563-568).

    fast: f32 Pallas Si/Ci NFW stage (see make_pmm_fn); no-op on CPU."""
    zs = np.asarray(zs)
    ks = np.asarray(ks)
    ms = np.asarray(ms)
    ells = np.asarray(ells)
    defaults = merge_params()
    engine = engine or lpm.EHEngine()

    def cls_fn(overrides=None):
        p = {**defaults, **(overrides or {})}
        bg, pzk, nzm, bh, rho_m0, uk = _stages(
            p, zs, ks, ms, mass_function, mdef, accuracy, engine,
            fast_nfw=fast, growth_mode=_growth_mode_from(overrides, growth))
        tr = pwr.MatterTracer(uk=uk)
        pmm = pwr.power_total(tr, tr, nzm, bh, ms, ks, pzk, rho_m0,
                              p["kstar_damping"],
                              fast_assembly=fast is True)
        ckk = limb.C_kk(bg, jnp.asarray(ells), jnp.asarray(zs),
                        jnp.asarray(ks), pmm, lzs1=zsource, lzs2=zsource)
        return ckk, pmm

    return jax.jit(cls_fn) if jit else cls_fn


def make_electron_fn(zs, ks, ms, family: str = "AGN", nxs: int = None,
                     xmax: int = None, mass_function: str = "sheth-torman",
                     mdef: str = "vir", accuracy: str = "medium",
                     engine=None, jit: bool = True, fast: bool = False,
                     growth: str = "auto"):
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
            p, zs, ks, ms, mass_function, mdef, accuracy, engine,
            fast_nfw=fast, growth_mode=_growth_mode_from(overrides, growth))
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
        fa = fast is True
        pee = pwr.power_total(te, te, nzm, bh, ms, ks, pzk, rho_m0,
                              p["kstar_damping"], fast_assembly=fa)
        pme = pwr.power_total(tn, te, nzm, bh, ms, ks, pzk, rho_m0,
                              p["kstar_damping"], fast_assembly=fa)
        return pee, pme

    return jax.jit(fn) if jit else fn


def make_hod_fn(zs, ks, ms, ngal, mass_function: str = "sheth-torman",
                mdef: str = "vir", accuracy: str = "medium", engine=None,
                jit: bool = True, fast: bool = False,
                growth: str = "auto"):
    """params -> (Pgg, Pgm): HOD galaxy spectra incl. the iterative
    ngal->mthresh solve, one XLA program (BASELINE config 3).

    fast: f32 Pallas Si/Ci NFW stage (difference-form Si/Ci + DS phases:
    Pgg/Pgm ~1e-6 relative, inside the 1e-5 twin-parity gate)."""
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
            p, zs, ks, ms, mass_function, mdef, accuracy, engine,
            fast_nfw=fast, growth_mode=_growth_mode_from(overrides, growth))
        hp = {k: p[k] for k in p if k.startswith("hod_")}
        grid = build_hod(zs, ms, nzm, bh, hp, ngal=jnp.asarray(ngal))
        tg = pwr.HODTracer(Nc=grid.Nc, Ns=grid.Ns, NsNsm1=grid.NsNsm1,
                           NcNs=grid.NcNs, ngal=grid.ngal, bg=grid.bg,
                           us=uk, uc=None)
        tn = pwr.MatterTracer(uk=uk)
        fa = fast is True
        pgg = pwr.power_total(tg, tg, nzm, bh, ms, ks, pzk, rho_m0,
                              p["kstar_damping"], fast_assembly=fa)
        pgm = pwr.power_total(tg, tn, nzm, bh, ms, ks, pzk, rho_m0,
                              p["kstar_damping"], fast_assembly=fa)
        return pgg, pgm

    return jax.jit(fn) if jit else fn


def make_ksz_snr_fn(z: float, volume_gpc3: float, ngal_mpc3: float,
                    kL_max: float = 0.1, num_kL_bins: int = 100,
                    kS_min: float = 0.1, kS_max: float = 10.0,
                    num_kS_bins: int = 101, num_mu_bins: int = 102,
                    ms=None, family: str = "AGN", nxs: int = 4096,
                    xmax: float = 20.0, mass_function: str = "sheth-torman",
                    mdef: str = "vir", accuracy: str = "medium",
                    engine=None, jit: bool = True, growth: str = "auto"):
    """The full kSZ forecasting pipeline as ONE XLA program:
    params, Cls -> (snr, Nvv(mu,kL), vrec).

    Fuses what the class API (models.ksz.kSZ, ~hundreds of eagerly
    dispatched ops) does for a single redshift bin: halo model + electron
    profile + HOD (ngal solve) + small-scale Pgg/Pge + velocity weights +
    N_vv + SNR (reference ksz.py:103-235, :299-336, :435-468).
    Differentiable in the cosmological parameters -- jax.grad of the SNR.
    """
    from .params import battaglia_defaults
    from .models import profiles as prof
    from .models.mass_conversion import mdelta_from_mdelta
    from .models.hod import build_hod
    from .ops.sine_transform import generic_profile_fft
    from .models.ksz import (Ngg, get_kmin, ksz_radial_function,
                             Nvv_core_integral, _sanitize)
    from .ops.quadrature import trapz_traced

    if ms is None:
        ms = np.geomspace(1e6, 1e16, 1000)
    ms = np.asarray(ms)
    zs = np.atleast_1d(np.asarray(z, dtype=np.float64))
    ks = np.geomspace(kS_min, kS_max, num_kS_bins)
    mu = np.linspace(-1.0, 1.0, num_mu_bins)
    kLs = np.geomspace(get_kmin(volume_gpc3), kL_max, num_kL_bins)
    defaults = merge_params()
    engine = engine or lpm.EHEngine()
    fit = dict(battaglia_defaults[family])
    ngal = np.atleast_1d(np.asarray(ngal_mpc3))

    def fn(overrides, Cls):
        p = {**defaults, **(overrides or {})}
        gm = _growth_mode_from(overrides, growth)
        bg, pzk, nzm, bh, rho_m0, uk = _stages(
            p, zs, ks, ms, mass_function, mdef, accuracy, engine,
            growth_mode=gm)
        zsj = jnp.asarray(zs)
        msj = jnp.asarray(ms)
        ksj = jnp.asarray(ks)

        # electron profile (as in make_electron_fn)
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

        def rhofunc(xsamp):
            return prof.rho_gas_x(xsamp[None, None, :], m200[..., None],
                                  zsj[:, None, None], omb, bg.omm0,
                                  rhocritz[:, None, None],
                                  p["battaglia_gas_gamma"], fit)

        rgs = r200 / 2.0
        _, uk_e = generic_profile_fft(rhofunc, rvirs / rgs, rgs, zs, ks,
                                      xmax, nxs)

        # HOD with the ngal solve
        hp = {k: p[k] for k in p if k.startswith("hod_")}
        grid = build_hod(zs, ms, nzm, bh, hp, ngal=jnp.asarray(ngal))
        tg = pwr.HODTracer(Nc=grid.Nc, Ns=grid.Ns, NsNsm1=grid.NsNsm1,
                           NcNs=grid.NcNs, ngal=grid.ngal, bg=grid.bg,
                           us=uk, uc=None)
        te = pwr.MatterTracer(uk=uk_e)
        sPgg = pwr.power_total(tg, tg, nzm, bh, ms, ks, pzk, rho_m0,
                               p["kstar_damping"])
        sPge = pwr.power_total(tg, te, nzm, bh, ms, ks, pzk, rho_m0,
                               p["kstar_damping"])

        # large-scale velocity spectra
        kLs_j = jnp.asarray(kLs)
        plin_L = engine.plin(bg, zsj, kLs_j, accuracy=accuracy,
                             growth_mode=gm)
        f = bgmod.growth_rate_f(bg, zsj, mode=gm)
        a = 1.0 / (1.0 + zsj)
        H = bgmod.h_of_z(bg, zsj)
        d2vs = (f * a * H)[:, None] / kLs_j[None, :]
        bgal = grid.bg
        ngg = Ngg(jnp.asarray(ngal))
        flPgg = plin_L * bgal[:, None] ** 2 + ngg[:, None]
        flPgv = plin_L * bgal[:, None] * d2vs
        vrec = trapz_traced(_sanitize(kLs_j[None, :] ** 2 * flPgv**2
                                      / flPgg), kLs_j, axis=-1)

        chistar = bgmod.comoving_radial_distance(bg, zsj)[0]
        Fstar = ksz_radial_function(zsj, p["ombh2"],
                                    p.get("Yp", 0.24), params=p)[0]
        nvv = Nvv_core_integral(chistar, Fstar, jnp.asarray(mu), kLs_j,
                                ksj, jnp.asarray(Cls), sPge[0],
                                sPgg[0] + ngg[0])

        # SNR (ksz.py:435-468)
        lPgg = plin_L[0][None, :] * bgal[0] ** 2 + 0.0 * jnp.asarray(mu)[:, None]
        lPgv = (plin_L[0] * bgal[0] * d2vs[0])[None, :] + 0.0 * jnp.asarray(mu)[:, None]
        ltPgg = lPgg + ngg[0]
        integrand = _sanitize(kLs_j[None, :] ** 2 * lPgv**2 / ltPgg / nvv)
        result = trapz_traced(integrand, kLs_j, axis=-1)
        snr2 = trapz_traced(result, jnp.asarray(mu)) / (2.0 * jnp.pi) ** 2
        snr = jnp.sqrt(volume_gpc3 * 1e9 * snr2)
        return snr, nvv, vrec

    return jax.jit(fn) if jit else fn


def make_ksz_survey_fn(num_bins: int,
                       kL_max: float = 0.1, num_kL_bins: int = 100,
                       kS_min: float = 0.1, kS_max: float = 10.0,
                       num_kS_bins: int = 101, num_mu_bins: int = 102,
                       ms=None, family: str = "AGN", nxs: int = 2048,
                       xmax: float = 20.0,
                       mass_function: str = "sheth-torman",
                       mdef: str = "vir", accuracy: str = "medium",
                       engine=None, jit: bool = True, growth: str = "auto"):
    """Survey-level kSZ forecast as ONE vmapped XLA program.

    Returns fn(overrides, zcents (B,), vols_gpc3 (B,), ngals (B,), Cls) ->
    (total_snr, per_bin_snr).  The bin parameters are traced, so one
    compile covers any survey binning with ``num_bins`` bins -- the
    reference's get_ksz_snr_survey (ksz.py:936-988) rebuilds the entire
    pipeline per bin instead.
    """
    from .params import battaglia_defaults
    from .models import profiles as prof
    from .models.mass_conversion import mdelta_from_mdelta
    from .models.hod import build_hod
    from .ops.sine_transform import generic_profile_fft
    from .models.ksz import Ngg, ksz_radial_function, Nvv_core_integral, \
        _sanitize
    from .ops.quadrature import trapz_traced

    if ms is None:
        ms = np.geomspace(1e6, 1e16, 1000)
    ms = np.asarray(ms)
    ks = np.geomspace(kS_min, kS_max, num_kS_bins)
    mu = np.linspace(-1.0, 1.0, num_mu_bins)
    defaults = merge_params()
    engine = engine or lpm.EHEngine()
    fit = dict(battaglia_defaults[family])

    def one_bin(p, bg, z, vol_gpc3, ngal, Cls, b_ov, gm="closed"):
        zs1 = jnp.reshape(z, (1,))
        msj = jnp.asarray(ms)
        ksj = jnp.asarray(ks)

        pzk = engine.plin(bg, zs1, ksj,
                          accuracy="low" if accuracy == "low" else "medium",
                          growth_mode=gm)
        ks_s2 = lpm.sigma2_k_grid(p)
        spzk = engine.plin(bg, zs1, ks_s2, accuracy=accuracy,
                           growth_mode=gm)
        rho_m0 = bgmod.rho_matter_z(bg, 0.0)
        R = mfm.R_from_M(msj, rho_m0, delta=1.0)
        sigma2 = lpm.sigma2_R(bg, R, zs1, spzk, ks_s2,
                              p["Wkr_taylor_switch"])
        nzm, bh = mfm.mass_function_grid(sigma2, zs1, msj, rho_m0,
                                         mass_function, p)
        omz = bgmod.omz(bg, zs1)
        rhocritz = bgmod.rho_critical_z(bg, zs1)
        rhomz = bgmod.rho_matter_z(bg, zs1)
        cs = prof.concentration_duffy(msj, zs1, mdef, p, p["H0"] / 100.0)
        rvirs = prof.rvir_grid(msj, zs1, mdef, rhocritz, rhomz, omz)
        rss = rvirs / cs
        uk = prof.nfw_uk_analytic(ksj, zs1, cs, rss)
        if mdef == "vir":
            dr1 = rhocritz * mfm.deltav_bryan_norman(omz)
        else:
            dr1 = rhomz * 200.0
        m200 = mdelta_from_mdelta(msj, cs, dr1, 200.0 * rhocritz)
        r200 = mfm.R_from_M(m200, rhocritz[:, None], delta=200.0)
        omb = p["ombh2"] / (p["H0"] / 100.0) ** 2

        def rhofunc(xsamp):
            return prof.rho_gas_x(xsamp[None, None, :], m200[..., None],
                                  zs1[:, None, None], omb, bg.omm0,
                                  rhocritz[:, None, None],
                                  p["battaglia_gas_gamma"], fit)

        rgs = r200 / 2.0
        _, uk_e = generic_profile_fft(rhofunc, rvirs / rgs, rgs, zs1, ksj,
                                      xmax, nxs)

        hp = {k: p[k] for k in p if k.startswith("hod_")}
        grid = build_hod(zs1, ms, nzm, bh, hp,
                         ngal=jnp.reshape(ngal, (1,)))
        tg = pwr.HODTracer(Nc=grid.Nc, Ns=grid.Ns, NsNsm1=grid.NsNsm1,
                           NcNs=grid.NcNs, ngal=grid.ngal, bg=grid.bg,
                           us=uk, uc=None)
        te = pwr.MatterTracer(uk=uk_e)
        sPgg = pwr.power_total(tg, tg, nzm, bh, ms, ks, pzk, rho_m0,
                               p["kstar_damping"])
        sPge = pwr.power_total(tg, te, nzm, bh, ms, ks, pzk, rho_m0,
                               p["kstar_damping"])

        # long-wavelength grid from the bin volume (traced geomspace)
        kmin = jnp.pi / (vol_gpc3 * 1e9) ** (1.0 / 3.0)
        kLs = jnp.exp(jnp.linspace(jnp.log(kmin), np.log(kL_max),
                                   num_kL_bins))
        plin_L = engine.plin(bg, zs1, kLs,
                             accuracy="low" if accuracy == "low" else "medium",
                             growth_mode=gm)
        f = bgmod.growth_rate_f(bg, zs1, mode=gm)
        a = 1.0 / (1.0 + zs1)
        H = bgmod.h_of_z(bg, zs1)
        d2vs = (f * a * H)[:, None] / kLs[None, :]
        bgal = grid.bg
        ngg = Ngg(ngal)

        chistar = bgmod.comoving_radial_distance(bg, zs1)[0]
        Fstar = ksz_radial_function(zs1, p["ombh2"], p.get("Yp", 0.24),
                                    params=p)[0]
        nvv = Nvv_core_integral(chistar, Fstar, jnp.asarray(mu), kLs, ksj,
                                Cls, sPge[0], sPgg[0] + ngg)

        # optional per-bin bias override for the long-wavelength side
        # (the reference's get_ksz_snr `bg` argument, ksz.py:443-449);
        # sentinel <= 0 means "use the HOD-derived bias"
        b_eff = jnp.where(b_ov > 0.0, b_ov, bgal[0])
        lPgg = plin_L[0][None, :] * b_eff**2 + 0.0 * jnp.asarray(mu)[:, None]
        lPgv = (plin_L[0] * b_eff * d2vs[0])[None, :] \
            + 0.0 * jnp.asarray(mu)[:, None]
        integrand = _sanitize(kLs[None, :] ** 2 * lPgv**2 / (lPgg + ngg)
                              / nvv)
        result = trapz_traced(integrand, kLs, axis=-1)
        snr2 = trapz_traced(result, jnp.asarray(mu)) / (2.0 * jnp.pi) ** 2
        return jnp.sqrt(vol_gpc3 * 1e9 * snr2), bgal[0]

    def fn(overrides, zcents, vols_gpc3, ngals, Cls, bs=None):
        p = {**defaults, **(overrides or {})}
        bg = bgmod.background(p)
        zcents = jnp.asarray(zcents)
        if bs is None:
            bs_arr = jnp.full(zcents.shape, -1.0)
        else:
            bs_arr = jnp.asarray(bs)
        gm = _growth_mode_from(overrides, growth)
        snrs, bgals = jax.vmap(
            lambda z, v, n, b: one_bin(p, bg, z, v, n, jnp.asarray(Cls),
                                       b, gm))(
            zcents, jnp.asarray(vols_gpc3), jnp.asarray(ngals), bs_arr)
        return jnp.sqrt(jnp.sum(snrs**2)), snrs, bgals

    del num_bins  # shape comes from the inputs; kept for API clarity
    return jax.jit(fn) if jit else fn


def make_batched_fn(fn, param_names, base: dict | None = None,
                    jit: bool = True, out_dtype=None):
    """Batch any pipeline function over cosmological parameter SETS.

    The serving/inference surface the reference has no analogue for:
    MCMC chains, emulator training sets, and grid scans evaluate the same
    static-grid pipeline at many cosmologies -- vmap turns that into ONE
    XLA program whose elementwise stages fuse across the batch and whose
    reductions stay MXU-shaped, amortizing both compile and (on the
    tunneled TPU) the fixed ~29 ms RPC cost over the whole batch.

    fn: a make_*_fn(..., jit=False) product (overrides dict -> pytree)
    param_names: parameter keys varied across the batch
    base: fixed overrides applied to every batch element
    out_dtype: optional output cast (e.g. jnp.float32 for serving:
        halves the device->host transfer -- the dominant per-cosmology
        cost on a bandwidth-limited link -- at ~6e-8 relative cast
        noise, far inside the 1e-5 twin gate)

    Returns batched(theta) with theta (B, len(param_names)) -- or a dict
    of (B,) leaves -- evaluating all B cosmologies in one program.
    """
    names = tuple(param_names)
    base = dict(base or {})

    def one(theta_row):
        ov = dict(base)
        for i, k in enumerate(names):
            ov[k] = theta_row[i]
        out = fn(ov)
        if out_dtype is not None:
            out = jax.tree_util.tree_map(
                lambda x: x.astype(out_dtype), out)
        return out

    def batched(theta):
        if isinstance(theta, dict):
            theta = jnp.stack([jnp.asarray(theta[k], dtype=jnp.float64)
                               for k in names], axis=-1)
        else:
            theta = jnp.asarray(theta)
        return jax.vmap(one)(theta)

    return jax.jit(batched) if jit else batched


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
