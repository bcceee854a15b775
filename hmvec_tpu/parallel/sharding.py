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
    assert ms.size % nd == 0, "len(ms) must divide the mesh size"
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
        if accuracy == "low":
            pzk = lpm.plin_approx(bg, zsj, ksj)
        else:
            pzk = engine.pzk_grid(bg, zsj, ksj)
        ks_s2 = lpm.sigma2_k_grid(p)
        spzk = engine.plin(bg, zsj, ks_s2, accuracy=accuracy)
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
