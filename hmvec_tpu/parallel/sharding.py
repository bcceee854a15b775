"""Grid (mass-axis) parallelism over a TPU mesh.

The reference is single-process numpy with no parallelism of any kind; the
natural TPU scaling axis for this workload is the mass integral: every
spectrum is an (z,m,k) integrand reduced over m (hmvec/hmvec.py:526,533).
We shard the m axis over the mesh with shard_map; each device evaluates its
slice of the profile grid (the Si/Ci-heavy part) and its partial mass
integrals, and a single psum over the 'm' axis closes each spectrum on ICI.

The small (z,m) stages (sigma^2, n(z,m), bias -- a few x 10^3 elements) are
computed replicated: cheaper than communicating them, and it keeps the
neighbor-dependent dln sigma/dln m stencil local.

Differentiable end-to-end: jax.grad flows through shard_map/psum, giving a
multi-chip Fisher step.

Beyond the mass axis: batch cosmologies (data-parallel serving), kSZ
survey bins, and the Boltzmann-lite solver shard too -- the hierarchy
integration over k modes and the Bessel projection over l nodes are both
embarrassingly parallel (sharded_solve_perturbations /
sharded_cls_from_sources), scaling the engine-free CMB Cls tier across
the mesh with zero collectives.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..params import merge_params
from ..utils.weights import trapz_weights
from ..models import background as bgmod
from ..models import linear_power as lpm
from ..models import mass_function as mfm
from ..models import profiles as prof
from ..models import limber as limb
from ..pipeline import _growth_mode_from


def make_mesh(n_devices: int | None = None, axis_name: str = "m") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis_name,))


def make_sharded_pmm_fn(zs, ks, ms, mesh: Mesh, axis_name: str = "m",
                        mass_function: str = "sheth-torman",
                        mdef: str = "vir", accuracy: str = "medium",
                        engine=None):
    """params -> Pmm(1h+2h) with the mass axis sharded over ``mesh``.

    len(ms) must be divisible by the mesh size.
    """
    zs = np.asarray(zs)
    ks = np.asarray(ks)
    ms = np.asarray(ms)
    nd = mesh.devices.size
    assert ms.size % nd == 0, "mesh size must divide len(ms)"
    defaults = merge_params()
    engine = engine or lpm.EHEngine()
    w_m = trapz_weights(ms)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis_name), P(axis_name), P(None, axis_name),
                  P(None, axis_name), P(None, axis_name), P(None, axis_name),
                  P(None)),
        out_specs=P(None, None, None))
    def _sharded_power(ms_l, w_l, nzm_l, bh_l, cs_l, rss_l, ksj):
        # local profile grid: the Si/Ci-heavy (z, m_local, k) stage
        uk_l = prof.nfw_uk_analytic(ksj, zs, cs_l, rss_l)
        # matter term without the 1/rho_m0 normalization (applied after psum)
        term_l = ms_l[None, :, None] * uk_l
        # 1-halo partial integral
        p1_part = jnp.einsum("zmk,m->zk", nzm_l[..., None] * term_l**2, w_l)
        # 2-halo leg: integral and low-k (u->1) consistency
        wnb = nzm_l[..., None] * bh_l[..., None]
        i_part = jnp.einsum("zmk,m->zk", wnb * term_l, w_l)
        c_part = jnp.einsum("zm,m->z", nzm_l * bh_l * ms_l[None, :], w_l)
        c_part = jnp.broadcast_to(c_part[:, None], i_part.shape)
        # one psum over ICI closes all three reductions
        return jax.lax.psum(jnp.stack([p1_part, i_part, c_part]), axis_name)

    def pmm(overrides=None):
        p = {**defaults, **(overrides or {})}
        bg = bgmod.background(p)
        zsj = jnp.asarray(zs)
        ksj = jnp.asarray(ks)
        msj = jnp.asarray(ms)
        gm = _growth_mode_from(overrides, "auto")
        if accuracy == "low":
            pzk = lpm.plin_approx(bg, zsj, ksj, growth_mode=gm)
        else:
            pzk = engine.pzk_grid(bg, zsj, ksj, growth_mode=gm)
        ks_s2 = lpm.sigma2_k_grid(p)
        spzk = engine.plin(bg, zsj, ks_s2, accuracy=accuracy,
                           growth_mode=gm)
        rho_m0 = bgmod.rho_matter_z(bg, 0.0)
        R = mfm.R_from_M(msj, rho_m0, delta=1.0)
        sigma2 = lpm.sigma2_R(bg, R, zsj, spzk, ks_s2, p["Wkr_taylor_switch"])
        nzm, bh = mfm.mass_function_grid(sigma2, zsj, msj, rho_m0,
                                         mass_function, p)
        omz = bgmod.omz(bg, zsj)
        rhocritz = bgmod.rho_critical_z(bg, zsj)
        rhomz = bgmod.rho_matter_z(bg, zsj)
        cs = prof.concentration_duffy(msj, zsj, mdef, p, p["H0"] / 100.0)
        rvirs = prof.rvir_grid(msj, zsj, mdef, rhocritz, rhomz, omz)
        rss = rvirs / cs

        stacked = _sharded_power(msj, jnp.asarray(w_m), nzm, bh, cs, rss, ksj)
        p1, i2, c2 = stacked[0], stacked[1], stacked[2]
        p1 = p1 / rho_m0**2
        i2 = i2 / rho_m0
        c2 = c2 / rho_m0
        damping = 1.0 - jnp.exp(-((ksj / p["kstar_damping"]) ** 2))
        p1h = p1 * damping[None, :]
        p2h = pzk * (i2 + 1.0 - c2) ** 2
        return p1h + p2h

    return pmm


def make_sharded_galaxy_electron_fn(zs, ks, ms, ngal, mesh: Mesh,
                                    axis_name: str = "m",
                                    family: str = "AGN", nxs: int = 1024,
                                    xmax: float = 20.0,
                                    mass_function: str = "sheth-torman",
                                    mdef: str = "vir",
                                    accuracy: str = "medium", engine=None):
    """params -> (Pgg, Pge, Pee) with the mass axis sharded over ``mesh``.

    The full kSZ small-scale workload: per shard, each device evaluates its
    slice of the NFW Si/Ci grid AND the Battaglia electron profile
    (sampling + sine-DFT + resample), forms partial 1h/2h mass integrals,
    and one psum closes all spectra.  Small (z,m) stages (mass function,
    HOD occupancies, mass conversion) are computed replicated.
    """
    from ..params import battaglia_defaults
    from ..models import profiles as prof
    from ..models.mass_conversion import mdelta_from_mdelta
    from ..models.hod import build_hod
    from ..ops.sine_transform import sine_dft, resample_uniform_source

    zs = np.asarray(zs)
    ks = np.asarray(ks)
    ms = np.asarray(ms)
    ngal = np.asarray(ngal)
    nd = mesh.devices.size
    assert ms.size % nd == 0, "mesh size must divide len(ms)"
    defaults = merge_params()
    engine = engine or lpm.EHEngine()
    fit = dict(battaglia_defaults[family])
    w_m = trapz_weights(ms)
    xs_np = np.linspace(0.0, xmax, nxs + 1)[1:]
    step = (xs_np[-1] - xs_np[0]) / nxs
    dkt = 2.0 * np.pi / (nxs * step)

    spec_zm = P(None, axis_name)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis_name), P(axis_name), spec_zm, spec_zm, spec_zm,
                  spec_zm, spec_zm, spec_zm, spec_zm, spec_zm, spec_zm,
                  spec_zm, P(None), P(None), P(None), P()),
        out_specs=P(None, None, None))
    def _sharded(ms_l, w_l, nzm_l, bh_l, cs_l, rss_l, m200_l, r200_l,
                 Nc_l, Ns_l, NsNsm1_l, NcNs_l, rhocritz, zsj, ksj, omm):
        # NFW satellite profile for the local masses
        uk_l = prof.nfw_uk_analytic(ksj, zs, cs_l, rss_l)
        # electron profile for the local masses: sample + DFT + resample
        p = defaults
        omb = p["ombh2"] / (p["H0"] / 100.0) ** 2
        rho = prof.rho_gas_x(jnp.asarray(xs_np)[None, None, :],
                             m200_l[..., None], zsj[:, None, None],
                             omb, omm, rhocritz[:, None, None],
                             p["battaglia_gas_gamma"], fit)
        rgs_l = r200_l / 2.0
        cgs_l = rss_l * cs_l / rgs_l  # rvir / rgs
        theta = (jnp.asarray(xs_np)[None, None, :]
                 <= cgs_l[..., None]).astype(rho.dtype)
        integ = rho * theta
        xsj = jnp.asarray(xs_np)
        dxs = jnp.diff(xsj)
        profm = integ * xsj[None, None, :] ** 2
        mnorm = ((profm[..., 1:] + profm[..., :-1]) * dxs / 2.0).sum(-1)
        ukt = sine_dft(integ * xsj[None, None, :], step)
        kts = jnp.arange(ukt.shape[-1], dtype=rho.dtype) * dkt
        uke_l = ukt / jnp.where(kts == 0, 1.0, kts)[None, None, :] \
            / mnorm[..., None]
        scales = rgs_l * (1.0 + zsj)[:, None]
        uke_l = resample_uniform_source(uke_l, dkt, scales, ksj)

        # tracer terms; the 1/ngal and 1/rho_m0 norms are applied after the
        # psum (they are z-only factors)
        term_g = Nc_l[..., None] + uk_l * Ns_l[..., None]   # uc = 1
        term_e = ms_l[None, :, None] * uke_l
        # HOD 1h square (hmvec.py:477-479 with uc=1):
        sq_gg = 2.0 * uk_l * NcNs_l[..., None] + NsNsm1_l[..., None] * uk_l**2

        nzw = nzm_l[..., None]
        wnb = nzw * bh_l[..., None]

        def red(x):
            return (x * w_l[None, :, None]).sum(axis=-2)

        parts = jnp.stack([
            red(nzw * sq_gg),                              # gg 1h
            red(nzw * term_g * term_e),                    # ge 1h
            red(nzw * term_e**2),                          # ee 1h
            red(wnb * term_g),                             # g 2h leg
            red(wnb * term_e),                             # e 2h leg
            red(wnb * (ms_l[None, :, None] + 0.0 * uke_l)),  # e leg, u->1
            red(wnb * ((Nc_l + Ns_l)[..., None] + 0.0 * uk_l)),  # g leg, u->1
        ])
        return jax.lax.psum(parts, axis_name)

    def spectra(overrides=None):
        p = {**defaults, **(overrides or {})}
        bg = bgmod.background(p)
        zsj = jnp.asarray(zs)
        ksj = jnp.asarray(ks)
        msj = jnp.asarray(ms)
        gm = _growth_mode_from(overrides, "auto")
        if accuracy == "low":
            pzk = lpm.plin_approx(bg, zsj, ksj, growth_mode=gm)
        else:
            pzk = engine.pzk_grid(bg, zsj, ksj, growth_mode=gm)
        ks_s2 = lpm.sigma2_k_grid(p)
        spzk = engine.plin(bg, zsj, ks_s2, accuracy=accuracy,
                           growth_mode=gm)
        rho_m0 = bgmod.rho_matter_z(bg, 0.0)
        R = mfm.R_from_M(msj, rho_m0, delta=1.0)
        sigma2 = lpm.sigma2_R(bg, R, zsj, spzk, ks_s2, p["Wkr_taylor_switch"])
        nzm, bh = mfm.mass_function_grid(sigma2, zsj, msj, rho_m0,
                                         mass_function, p)
        omz = bgmod.omz(bg, zsj)
        rhocritz = bgmod.rho_critical_z(bg, zsj)
        rhomz = bgmod.rho_matter_z(bg, zsj)
        cs = prof.concentration_duffy(msj, zsj, mdef, p, p["H0"] / 100.0)
        rvirs = prof.rvir_grid(msj, zsj, mdef, rhocritz, rhomz, omz)
        rss = rvirs / cs
        if mdef == "vir":
            dr1 = rhocritz * mfm.deltav_bryan_norman(omz)
        else:
            dr1 = rhomz * 200.0
        m200 = mdelta_from_mdelta(msj, cs, dr1, 200.0 * rhocritz)
        r200 = mfm.R_from_M(m200, rhocritz[:, None], delta=200.0)

        hp = {k: p[k] for k in p if k.startswith("hod_")}
        grid = build_hod(zs, ms, nzm, bh, hp, ngal=jnp.asarray(ngal))

        parts = _sharded(msj, jnp.asarray(w_m), nzm, bh, cs, rss, m200,
                         r200, grid.Nc, grid.Ns, grid.NsNsm1, grid.NcNs,
                         rhocritz, zsj, ksj, bg.omm0)
        (gg1, ge1, ee1, gleg, eleg, eleg0, gleg0) = parts
        ng = grid.ngal[:, None]
        damping = 1.0 - jnp.exp(-((ksj / p["kstar_damping"]) ** 2))

        p1_gg = gg1 / ng**2 * damping[None, :]
        p1_ge = ge1 / ng / rho_m0 * damping[None, :]
        p1_ee = ee1 / rho_m0**2 * damping[None, :]

        ig = gleg / ng
        ie = eleg / rho_m0
        cg = gleg0 / ng
        ce = eleg0 / rho_m0
        bgal = grid.bg[:, None]
        fac_g = ig + bgal - cg
        fac_e = ie + 1.0 - ce
        p2_gg = pzk * fac_g * fac_g
        p2_ge = pzk * fac_g * fac_e
        p2_ee = pzk * fac_e * fac_e
        return p1_gg + p2_gg, p1_ge + p2_ge, p1_ee + p2_ee

    return spectra


def make_fisher_step_fn(zs, ks, ms, ells, mesh: Mesh,
                        param_names=("omch2", "As"), lr: float = 1e-3,
                        **kw):
    """One 'training step' for the forecasting workload: a gradient-descent
    update of cosmological parameters against a synthetic C_kk data vector,
    with the mass axis sharded over the mesh.

    Parameters are optimized in fiducial-relative units (theta = value /
    fiducial) so a single learning rate is meaningful across parameters
    spanning 10 decades (As ~ 2e-9 vs H0 ~ 67).

    Returns (step, model): step(theta_rel, data) -> (theta_rel_next, loss),
    model(theta_rel) -> C_kk.
    """
    pmm_fn = make_sharded_pmm_fn(zs, ks, ms, mesh, **kw)
    defaults = merge_params()
    fiducial = jnp.asarray([defaults[name] for name in param_names])

    def model(theta_rel):
        theta = fiducial * theta_rel
        overrides = {name: theta[i] for i, name in enumerate(param_names)}
        pmm = pmm_fn(overrides)
        p = {**defaults, **overrides}
        bg = bgmod.background(p)
        ckk = limb.C_kk(bg, jnp.asarray(ells), jnp.asarray(zs),
                        jnp.asarray(ks), pmm, lzs1=1100.0, lzs2=1100.0)
        return ckk

    def loss_fn(theta_rel, data):
        resid = (model(theta_rel) - data) / (jnp.abs(data) + 1e-30)
        return jnp.mean(resid**2)

    @jax.jit
    def step(theta_rel, data):
        loss, grad = jax.value_and_grad(loss_fn)(theta_rel, data)
        return theta_rel - lr * grad, loss

    return step, model


def make_sharded_batched_fn(fn, param_names, mesh: Mesh,
                            axis_name: str = "m", base: dict | None = None):
    """Data-parallel serving: a batch of cosmologies sharded over the mesh.

    Complements pipeline.make_batched_fn (one device, vmap): here the
    batch axis is split across devices with shard_map -- each chip runs
    the full pipeline for its share of the parameter sets, with no
    cross-device communication at all (embarrassingly parallel; the
    all_gather of the stacked outputs is the only collective, inserted by
    the out_specs).  The mesh size must divide B.

    fn: a make_*_fn(..., jit=False) product; param_names: keys of the
    batched parameters; returns batched(theta: (B, P)) -> stacked outputs.
    """
    names = tuple(param_names)
    base = dict(base or {})
    nd = mesh.devices.size

    def one(theta_row):
        ov = dict(base)
        for i, k in enumerate(names):
            ov[k] = theta_row[i]
        return fn(ov)

    @functools.partial(shard_map, mesh=mesh,
                       in_specs=P(axis_name, None),
                       out_specs=P(axis_name))
    def _local(theta_l):
        return jax.vmap(one)(theta_l)

    def batched(theta):
        theta = jnp.asarray(theta)
        assert theta.shape[0] % nd == 0, \
            (f"mesh size {nd} must divide the batch "
             f"(got batch {theta.shape[0]})")
        return _local(theta)

    return batched


def make_sharded_ksz_survey_fn(num_bins: int, mesh: Mesh,
                               axis_name: str = "m", **survey_kwargs):
    """Survey kSZ forecast with the BIN axis sharded over the mesh.

    Each device runs the complete per-bin halo-model pipeline (electron
    transform, HOD ngal solve, Pgg/Pge, Nvv, SNR) for its share of the
    redshift bins; a single psum closes the total SNR^2 over ICI.  The
    mesh size must divide num_bins.  Same call signature as
    pipeline.make_ksz_survey_fn, including per-bin ``bs`` galaxy-bias
    overrides (sharded along the bin axis like the other bin inputs).
    """
    from ..pipeline import make_ksz_survey_fn

    nd = mesh.devices.size
    assert num_bins % nd == 0, "mesh size must divide num_bins"
    inner = make_ksz_survey_fn(num_bins // nd, jit=False, **survey_kwargs)

    def fn(overrides, zcents, vols_gpc3, ngals, Cls, bs=None):
        zcents = jnp.asarray(zcents, dtype=jnp.float64)
        vols = jnp.asarray(vols_gpc3, dtype=jnp.float64)
        ngs = jnp.asarray(ngals, dtype=jnp.float64)
        Clsj = jnp.asarray(Cls, dtype=jnp.float64)
        # sentinel <= 0 = "use the HOD-derived bias" (pipeline.one_bin)
        bs_arr = (jnp.full(zcents.shape, -1.0) if bs is None
                  else jnp.asarray(bs, dtype=jnp.float64))

        # check_vma off: the HOD bisection carry starts replicated and
        # becomes device-varying inside the loop, which the varying-axis
        # checker rejects; the 8-device equivalence test pins correctness
        @functools.partial(shard_map, mesh=mesh,
                           in_specs=(P(axis_name), P(axis_name),
                                     P(axis_name), P(None), P(axis_name)),
                           out_specs=(P(), P(axis_name), P(axis_name)),
                           check_vma=False)
        def _local(zc_l, v_l, n_l, cls_r, bs_l):
            _, snrs_l, bg_l = inner(overrides, zc_l, v_l, n_l, cls_r,
                                    bs=bs_l)
            tot2 = jax.lax.psum(jnp.sum(snrs_l**2), axis_name)
            return tot2, snrs_l, bg_l

        tot2, snrs, bgals = _local(zcents, vols, ngs, Clsj, bs_arr)
        return jnp.sqrt(tot2), snrs, bgals

    return fn


def sharded_solve_perturbations(ctx, ks, mesh: Mesh, axis_name: str = "k",
                                **solve_kwargs):
    """k-sharded Boltzmann-lite hierarchy solve over the device mesh.

    The perturbation integration (models/boltzlite.solve_perturbations)
    is embarrassingly parallel in k: each device integrates its slice of
    the k grid through the full RK4 ln-a schedule, the superhorizon
    zeta calibration runs replicated (one extra mode), and the stitched
    PerturbSolution is identical to the unsharded one (same programs,
    same order of operations per mode -- equivalence is exact, tested in
    tests/test_sharded_full.py).  ks is padded with its last element to
    a mesh-divisible size and trimmed after.

    solve_kwargs: the solver's static grid counts (n_a, n_b_outer, ...).
    """
    from ..models import boltzlite as bl

    ks = np.asarray(ks, dtype=np.float64)
    nd = mesh.devices.size
    nk = ks.size
    pad = (-nk) % nd
    ks_pad = np.concatenate([ks, np.full((pad,), ks[-1])])

    # inherit solve_perturbations' own defaults so the grids can never
    # drift apart between the sharded and unsharded paths
    import inspect
    sig = inspect.signature(bl.solve_perturbations.__wrapped__)
    kw = {name: par.default for name, par in sig.parameters.items()
          if par.default is not inspect.Parameter.empty}
    kw.update(solve_kwargs)

    @functools.partial(shard_map, mesh=mesh,
                       in_specs=(P(), P(axis_name)),
                       out_specs=(P(), P(axis_name)))
    def _local(ctx_r, ks_l):
        return bl._solve_ks(ctx_r, ks_l, **kw)

    @jax.jit
    def run(ctx_r, ks_j):
        xs, states = _local(ctx_r, ks_j)
        zeta = bl._zeta_unit(ctx_r, **kw)
        return xs, states, zeta

    xs, states, zeta = run(ctx, jnp.asarray(ks_pad))
    return bl.PerturbSolution(ks=jnp.asarray(ks), xs=xs,
                              states=states[:nk], zeta_unit=zeta)


def sharded_cls_from_sources(src, bg, ls, ks_fine, mesh: Mesh,
                             axis_name: str = "k",
                             lmax_late: float = 60.0):
    """l-sharded Bessel projection of LOS sources to C_l.

    The per-l projection integrals are independent: the host-side prep
    (fine-k source interpolation, Bessel table) mirrors
    models/boltzlite.cls_from_sources, then the (nl, nu) table rows are
    padded to a mesh-divisible size and sharded so each device runs its
    slice of the shared _project_l_rows kernel.  Output matches the
    unsharded path exactly (same per-l program; tested in
    tests/test_sharded_full.py).
    """
    from ..models import boltzlite as bl

    ls = np.asarray(ls)
    nd = mesh.devices.size
    nl = ls.size
    pad = (-nl) % nd
    ls_pad = np.concatenate([ls, np.repeat(ls[-1:], pad)])

    ks_fine = jnp.asarray(ks_fine)
    s_t_f = bl._catmull_rom_k(src.s_t, src.ks, ks_fine)   # (nkf, nx)
    s_e_f = bl._catmull_rom_k(src.s_e, src.ks, ks_fine)
    pp = bl._prep_projection(src, ls_pad, ks_fine)
    tab, ls_arr, pref_e_all = pp["tab"], pp["ls_arr"], pp["pref_e"]
    u_i0, u_w, u_safe2, late = (pp["u_i0"], pp["u_w"], pp["u_safe2"],
                                pp["late"])
    st_wx = s_t_f * pp["wx"][None, :]
    se_wx = s_e_f * pp["wx"][None, :]

    @functools.partial(shard_map, mesh=mesh,
                       in_specs=(P(axis_name), P(axis_name), P(axis_name),
                                 P(), P(), P(), P(), P(), P()),
                       out_specs=(P(axis_name), P(axis_name)))
    def _local(tab_l, ls_l, pref_l, st_r, se_r, i0_r, w_r, us2_r, late_r):
        return bl._project_l_rows(tab_l, ls_l, pref_l, st_r, se_r,
                                  i0_r, w_r, us2_r, late_r, lmax_late)

    th_l, e_l = jax.jit(_local)(tab, ls_arr, pref_e_all, st_wx, se_wx,
                                u_i0, u_w, u_safe2, late)
    th_l, e_l = th_l[:nl], e_l[:nl]

    pzeta = (bg.As * (ks_fine / bg.pivot_scalar) ** (bg.ns - 1.0)
             / src.zeta_unit**2)
    wk = bl._trapz_w(jnp.log(ks_fine))
    t0_muk = bg.T_cmb_k * 1e6
    norm = 4.0 * jnp.pi * t0_muk**2
    ctt = norm * jnp.einsum("k,lk->l", pzeta * wk, th_l**2)
    cee = norm * jnp.einsum("k,lk->l", pzeta * wk, e_l**2)
    cte = norm * jnp.einsum("k,lk->l", pzeta * wk, th_l * e_l)
    return {"ls": jnp.asarray(ls), "tt": ctt, "ee": cee, "te": cte}


def make_sharded_matter_bispectrum_fn(zs, ks, ms, k1, k2, k3, mesh: Mesh,
                                      axis_name: str = "m",
                                      mass_function: str = "sheth-torman",
                                      mdef: str = "vir",
                                      accuracy: str = "medium",
                                      engine=None, include_b2=False):
    """params -> B_mmm^{1h+2h+3h}(z, q) with the mass axis sharded.

    The halo-model bispectrum (models/bispectrum.py, extension beyond the
    reference) carries the heaviest mass reductions in the framework: a
    triple-product 1-halo integral plus three pair and three b1 legs (and
    optionally three quadratic-bias legs) per configuration.  Each device
    evaluates its mass-slice of the NFW grid, interpolates it to the
    three leg wavenumber sets, and forms all partial integrals; ONE psum
    over ICI closes every reduction.  The k-interpolation commutes
    exactly with the (linear) mass integral, so this equals
    ``bispectrum_total(MatterTracer x3)`` up to float reassociation
    (equivalence-tested on the virtual CPU mesh,
    tests/test_sharded_full.py).

    ``k1/k2/k3``: static leg wavenumbers (scalar, (nq,), or (nz, nq) per
    leg -- triangle closure fixes the F2 angles, models/bispectrum.py).
    ``include_b2``: add the Sheth-Tormen peak-background-split
    quadratic-bias 3-halo term.
    """
    from ..models import bispectrum as bis

    zs = np.asarray(zs)
    ks = np.asarray(ks)
    ms = np.asarray(ms)
    nd = mesh.devices.size
    assert ms.size % nd == 0, "mesh size must divide len(ms)"
    defaults = merge_params()
    engine = engine or lpm.EHEngine()
    w_m = trapz_weights(ms)
    kqs_np = [np.asarray(bis._normalize_kq(jnp.asarray(k), zs.size))
              for k in (k1, k2, k3)]
    assert len({kq.shape for kq in kqs_np}) == 1, \
        "the three legs must share one configuration shape"

    spec_zm = P(None, axis_name)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis_name), P(axis_name), spec_zm, spec_zm, spec_zm,
                  spec_zm, spec_zm, P(None), P(None, None), P(None, None),
                  P(None, None)),
        out_specs=P(None, None, None))
    def _sharded(ms_l, w_l, nzm_l, bh_l, b2_l, cs_l, rss_l, ksj,
                 kq1, kq2, kq3):
        uk_l = prof.nfw_uk_analytic(ksj, zs, cs_l, rss_l)
        # matter term WITHOUT the 1/rho_m0 norm (z-independent; applied
        # after the psum) -- linear k-interp commutes with the m scaling
        term_l = ms_l[None, :, None] * uk_l
        tq = [bis._interp_zmk(ksj, term_l, kq) for kq in (kq1, kq2, kq3)]
        nzw = nzm_l[..., None]
        wnb = nzw * bh_l[..., None]

        def red(x):
            return (x * w_l[None, :, None]).sum(axis=-2)

        # u->1 consistency of the b1 legs (k-independent for matter)
        c = (nzm_l * bh_l * ms_l[None, :] * w_l[None, :]).sum(-1)
        rows = [red(nzw * tq[0] * tq[1] * tq[2]),      # B1h
                red(wnb * tq[1] * tq[2]),              # I2 for P(k1) leg
                red(wnb * tq[2] * tq[0]),              # I2 for P(k2) leg
                red(wnb * tq[0] * tq[1]),              # I2 for P(k3) leg
                red(wnb * tq[0]),                      # I1 integrals
                red(wnb * tq[1]),
                red(wnb * tq[2]),
                jnp.broadcast_to(c[:, None],
                                 (tq[0].shape[0], tq[0].shape[2]))]
        if include_b2:
            w2 = nzw * b2_l[..., None]
            rows += [red(w2 * tq[0]), red(w2 * tq[1]), red(w2 * tq[2])]
        return jax.lax.psum(jnp.stack(rows), axis_name)

    def bispec(overrides=None):
        p = {**defaults, **(overrides or {})}
        bg = bgmod.background(p)
        zsj = jnp.asarray(zs)
        ksj = jnp.asarray(ks)
        msj = jnp.asarray(ms)
        gm = _growth_mode_from(overrides, "auto")
        if accuracy == "low":
            pzk = lpm.plin_approx(bg, zsj, ksj, growth_mode=gm)
        else:
            pzk = engine.pzk_grid(bg, zsj, ksj, growth_mode=gm)
        ks_s2 = lpm.sigma2_k_grid(p)
        spzk = engine.plin(bg, zsj, ks_s2, accuracy=accuracy,
                           growth_mode=gm)
        rho_m0 = bgmod.rho_matter_z(bg, 0.0)
        R = mfm.R_from_M(msj, rho_m0, delta=1.0)
        sigma2 = lpm.sigma2_R(bg, R, zsj, spzk, ks_s2, p["Wkr_taylor_switch"])
        nzm, bh = mfm.mass_function_grid(sigma2, zsj, msj, rho_m0,
                                         mass_function, p)
        omz = bgmod.omz(bg, zsj)
        rhocritz = bgmod.rho_critical_z(bg, zsj)
        rhomz = bgmod.rho_matter_z(bg, zsj)
        cs = prof.concentration_duffy(msj, zsj, mdef, p, p["H0"] / 100.0)
        rvirs = prof.rvir_grid(msj, zsj, mdef, rhocritz, rhomz, omz)
        rss = rvirs / cs
        b2 = (bis.b2_sheth_torman(sigma2, p) if include_b2
              else jnp.zeros_like(nzm))

        kqs = [jnp.asarray(kq) for kq in kqs_np]
        parts = _sharded(msj, jnp.asarray(w_m), nzm, bh, b2, cs, rss,
                         ksj, *kqs)
        rho = rho_m0
        b1h = parts[0] / rho**3
        for kq in kqs:
            b1h = b1h * (1.0 - jnp.exp(-((kq / p["kstar_damping"]) ** 2)))
        I2 = [parts[1 + i] / rho**2 for i in range(3)]
        cc = parts[7] / rho
        I1 = [parts[4 + i] / rho + 1.0 - cc for i in range(3)]
        Pq = [bis._interp_zk(ksj, pzk, kq) for kq in kqs]
        b2h = sum(Pq[i] * I1[i] * I2[i] for i in range(3))
        b3h = I1[0] * I1[1] * I1[2] * bis.tree_bispectrum(
            Pq[0], Pq[1], Pq[2], kqs[0], kqs[1], kqs[2])
        if include_b2:
            for ll in range(3):
                i, j = (ll + 1) % 3, (ll + 2) % 3
                Ib2 = parts[8 + ll] / rho
                b3h = b3h + I1[i] * I1[j] * Ib2 * Pq[i] * Pq[j]
        return b1h + b2h + b3h

    return bispec
