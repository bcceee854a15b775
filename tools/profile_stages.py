"""Stage-level TPU latency attribution for BASELINE configs 2 and 3.

Times jitted PREFIXES of the electron/HOD pipelines (each returning a tiny
scalar so the fetch is constant-cost) and prints the per-stage deltas.
All timings are end-to-end host fetches (the axon tunnel does not
synchronize on block_until_ready, DEVNOTES.md) so each line includes the
~29 ms fixed RPC cost; deltas between lines cancel it.

Run: python tools/profile_stages.py [--cpu]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _timeit(fn, *args, iters=7):
    import jax
    jax.tree_util.tree_map(np.asarray, fn(*args))  # compile+warm
    jax.tree_util.tree_map(np.asarray, fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.tree_util.tree_map(np.asarray, fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/hmvec_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from hmvec_tpu.params import merge_params, battaglia_defaults
    from hmvec_tpu.pipeline import _stages
    from hmvec_tpu.models import background as bgmod
    from hmvec_tpu.models import linear_power as lpm
    from hmvec_tpu.models import mass_function as mfm
    from hmvec_tpu.models import profiles as prof
    from hmvec_tpu.models import power as pwr
    from hmvec_tpu.models.mass_conversion import mdelta_from_mdelta
    from hmvec_tpu.models.hod import build_hod
    from hmvec_tpu.ops.sine_transform import (sine_dft,
                                              resample_uniform_source)

    zs = np.linspace(0.1, 3.0, 20)
    ms = np.geomspace(2e10, 1e17, 200)
    ks = np.geomspace(1e-4, 100, 1001)
    nxs, xmax = 4096, 20
    defaults = merge_params()
    engine = lpm.EHEngine()
    fit = dict(battaglia_defaults["AGN"])
    overrides = {k: jnp.asarray(v) for k, v in {
        "omch2": 0.1198, "As": 2.2e-9}.items()}

    xs_np = np.linspace(0.0, xmax, nxs + 1)[1:]
    step = (xs_np[-1] - xs_np[0]) / nxs
    dkt = 2.0 * np.pi / (nxs * step)

    def upto(stage):
        def fn(ov):
            p = {**defaults, **ov}
            bg, pzk, nzm, bh, rho_m0, uk_nfw = _stages(
                p, zs, ks, ms, "sheth-torman", "vir", "medium", engine)
            if stage == "stages":
                return uk_nfw.sum() + pzk.sum() + nzm.sum()
            zsj = jnp.asarray(zs)
            msj = jnp.asarray(ms)
            rhocritz = bgmod.rho_critical_z(bg, zsj)
            omz = bgmod.omz(bg, zsj)
            rhomz = bgmod.rho_matter_z(bg, zsj)
            cs = prof.concentration_duffy(msj, zsj, "vir", p,
                                          p["H0"] / 100.0)
            rvirs = prof.rvir_grid(msj, zsj, "vir", rhocritz, rhomz, omz)
            dr1 = rhocritz * mfm.deltav_bryan_norman(omz)
            m200 = mdelta_from_mdelta(msj, cs, dr1, 200.0 * rhocritz)
            r200 = mfm.R_from_M(m200, rhocritz[:, None], delta=200.0)
            if stage == "massconv":
                return uk_nfw.sum() + m200.sum() + r200.sum()
            omb = p["ombh2"] / (p["H0"] / 100.0) ** 2
            xs = jnp.asarray(xs_np)
            rho = prof.rho_gas_x(xs[None, None, :], m200[..., None],
                                 zsj[:, None, None], omb, bg.omm0,
                                 rhocritz[:, None, None],
                                 p["battaglia_gas_gamma"], fit)
            rgs = r200 / 2.0
            cgs = rvirs / rgs
            theta = (xs[None, None, :] <= cgs[..., None]).astype(rho.dtype)
            integrand = theta * rho
            if stage == "sample":
                return uk_nfw.sum() + integrand.sum()
            dx = jnp.diff(xs)
            profm = integrand * xs[None, None, :] ** 2
            mnorm = ((profm[..., 1:] + profm[..., :-1]) * dx / 2.0).sum(-1)
            ukt = sine_dft(integrand * xs[None, None, :], step)
            if stage == "dft":
                return uk_nfw.sum() + ukt.sum() + mnorm.sum()
            kts = jnp.arange(ukt.shape[-1], dtype=rho.dtype) * dkt
            uk = ukt / jnp.where(kts == 0, 1.0, kts)[None, None, :] \
                / mnorm[..., None]
            scales = rgs * (1.0 + zsj)[:, None]
            uk_e = resample_uniform_source(uk, dkt, scales,
                                           jnp.asarray(ks))
            if stage == "resample":
                return uk_nfw.sum() + uk_e.sum()
            te = pwr.MatterTracer(uk=uk_e)
            tn = pwr.MatterTracer(uk=uk_nfw)
            pee = pwr.power_total(te, te, nzm, bh, ms, ks, pzk, rho_m0,
                                  p["kstar_damping"])
            pme = pwr.power_total(tn, te, nzm, bh, ms, ks, pzk, rho_m0,
                                  p["kstar_damping"])
            return pee.sum() + pme.sum()
        return jax.jit(fn)

    print("== config 2 (electron) prefix timings ==")
    prev = 0.0
    for stage in ["stages", "massconv", "sample", "dft", "resample",
                  "full"]:
        t = _timeit(upto(stage), overrides)
        print(f"  upto {stage:9s}: {t:7.1f} ms  (delta {t - prev:+7.1f})")
        prev = t

    # config 3
    ngal = np.full(zs.size, 1e-4)

    def hod_upto(stage):
        def fn(ov):
            p = {**defaults, **ov}
            bg, pzk, nzm, bh, rho_m0, uk = _stages(
                p, zs, ks, ms, "sheth-torman", "vir", "medium", engine)
            if stage == "stages":
                return uk.sum() + pzk.sum() + nzm.sum()
            hp = {k: p[k] for k in p if k.startswith("hod_")}
            grid = build_hod(zs, ms, nzm, bh, hp, ngal=jnp.asarray(ngal))
            if stage == "hod":
                return uk.sum() + grid.Nc.sum() + grid.Ns.sum() \
                    + grid.ngal.sum()
            tg = pwr.HODTracer(Nc=grid.Nc, Ns=grid.Ns, NsNsm1=grid.NsNsm1,
                               NcNs=grid.NcNs, ngal=grid.ngal, bg=grid.bg,
                               us=uk, uc=None)
            tn = pwr.MatterTracer(uk=uk)
            pgg = pwr.power_total(tg, tg, nzm, bh, ms, ks, pzk, rho_m0,
                                  p["kstar_damping"])
            pgm = pwr.power_total(tg, tn, nzm, bh, ms, ks, pzk, rho_m0,
                                  p["kstar_damping"])
            return pgg.sum() + pgm.sum()
        return jax.jit(fn)

    print("== config 3 (HOD) prefix timings ==")
    prev = 0.0
    for stage in ["stages", "hod", "full"]:
        t = _timeit(hod_upto(stage), overrides)
        print(f"  upto {stage:9s}: {t:7.1f} ms  (delta {t - prev:+7.1f})")
        prev = t

    if "--roofline" in sys.argv:
        roofline()


# TPU v5e (v5 lite) public peaks: 197 TFLOP/s bf16 MXU, 819 GB/s HBM.
# True-f32 (Precision.HIGHEST) matmuls run 3 MXU passes, so the
# achievable f32 ceiling is ~197/3 ~ 66 TFLOP/s.
_V5E_BF16_PEAK = 197e12
_V5E_F32_PEAK = 197e12 / 3.0
_V5E_HBM_GBS = 819.0


def roofline():
    """Hardware-anchored attribution of the three dominant kernels
    (VERDICT round-2 weak #7: latencies were only ever quoted vs the twin
    and the RPC floor, never vs peak).  Isolated jitted stages on the
    config-2 shapes; timings are host-fetch e2e minus a measured null-RPC
    baseline."""
    import jax
    import jax.numpy as jnp
    from hmvec_tpu.ops.sine_transform import (_sine_dft_mixed32_scaled,
                                              resample_uniform_source)
    from hmvec_tpu.ops.pallas_kernels import nfw_uk_fast
    from hmvec_tpu.models import profiles as prof

    B, N = 4000, 4096
    nk_t = N // 2 + 1
    nz, nm, nk = 20, 200, 1001
    step = 20.0 / N
    dkt = 2.0 * np.pi / (N * step)
    rng = np.random.default_rng(0)

    # null RPC baseline: fetch a tiny computed scalar
    null = jax.jit(lambda x: (x * 2.0).sum())
    t_rpc = _timeit(null, jnp.ones(8))
    print(f"== roofline (v5e: {_V5E_BF16_PEAK/1e12:.0f} TF/s bf16, "
          f"{_V5E_F32_PEAK/1e12:.0f} TF/s f32-HIGHEST, "
          f"{_V5E_HBM_GBS:.0f} GB/s HBM); null RPC {t_rpc:.1f} ms ==")

    # 1) mixed32 sine DFT (the MXU stage): 2 f32 matmuls of B x N x nk_t
    y = jnp.asarray(rng.random((B, N)), jnp.float32)
    f_dft = jax.jit(lambda v: _sine_dft_mixed32_scaled(v, step).sum())
    t = _timeit(f_dft, y) - t_rpc            # ms
    flops = 2 * 2 * B * N * nk_t             # 2 matmuls, 2 flops/MAC
    gfs = flops / (t * 1e6)                  # GF/s
    print(f"  mixed32 DFT  : {t:7.1f} ms  {gfs:8.1f} GF/s "
          f"({gfs / (_V5E_F32_PEAK / 1e9) * 100:5.1f}% of f32 peak)")

    # 2) Pallas pair-selection resample on the (B, nk_t) -> (B, nk) grid
    u = jnp.asarray(rng.random((B, nk_t)))
    scales = jnp.asarray(rng.uniform(0.1, 2.0, (B,)))
    ksq = jnp.asarray(np.geomspace(1e-4, 100, nk))
    f_res = jax.jit(lambda v: resample_uniform_source(
        v, dkt, scales, ksq, method="pallas").sum())
    t = _timeit(f_res, u) - t_rpc
    bytes_moved = B * nk_t * 8 + B * nk * 8
    gbs = bytes_moved / (t * 1e6)
    print(f"  pallas resample: {t:5.1f} ms  {gbs:8.1f} GB/s "
          f"({gbs / _V5E_HBM_GBS * 100:5.1f}% of HBM peak; "
          f"selection-bound, {t*1e6/(B*nk):0.2f} ns/out-elt)")

    # 3) NFW Si/Ci: Pallas DS kernel and the f64 XLA path, ns/element
    zs_ = np.linspace(0.1, 3.0, nz)
    cs = jnp.asarray(rng.uniform(2.0, 20.0, (nz, nm)))
    rss = jnp.asarray(rng.uniform(0.01, 1.0, (nz, nm)))
    ksj = jnp.asarray(np.geomspace(1e-4, 100, nk))
    f_p = jax.jit(lambda c, r: nfw_uk_fast(ksj, zs_, c, r).sum())
    t = _timeit(f_p, cs, rss) - t_rpc
    nel = nz * nm * nk
    print(f"  pallas DS sici : {t:5.1f} ms  {t*1e6/nel:0.2f} ns/elt "
          f"({nel/(t*1e6):0.2f} Gelt/s)")
    f_64 = jax.jit(lambda c, r: prof.nfw_uk_analytic(ksj, zs_, c, r).sum())
    t = _timeit(f_64, cs, rss) - t_rpc
    print(f"  f64 XLA sici   : {t:5.1f} ms  {t*1e6/nel:0.2f} ns/elt")


if __name__ == "__main__":
    main()
