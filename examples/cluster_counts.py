"""SZ cluster-count forecast through a lognormal Y-M relation.

Expected detections for a Planck-like full-sky SZ survey and the Fisher
information the counts carry on the scaling relation, via autodiff through
the whole (mass function -> completeness -> counts) chain.
"""

import numpy as np
import jax
import jax.numpy as jnp

from hmvec_tpu.models.halo_model import HaloModel
from hmvec_tpu.models import cluster_counts as cc
from hmvec_tpu.models import background as bgmod

zs = np.linspace(0.05, 1.2, 24)
ms = np.geomspace(5e13, 5e15, 80)
ks = np.geomspace(1e-3, 10.0, 64)

# tinker_delta="auto": Tinker-2010 parameters at the z-dependent virial
# overdensity Delta_v(z)/Omega_m(z) (the reference clamps Delta=200)
hm = HaloModel(zs, ks, ms=ms, mass_function="tinker", tinker_delta="auto")

SC = dict(lnYstar=np.log(2.4e-4), alpha=1.79, beta=2.0 / 3.0,
          Mpivot=6e14, sigma_lnY=0.25)
q, sigN, fsky = 6.0, 1.5e-4, 0.65

dndz, N = hm.cluster_counts_obs(q, sigN, fsky=fsky, **SC)
print(f"detected clusters (q>{q}): N = {float(N):.0f}")
print("dN/dz peak at z =", float(zs[int(np.argmax(np.asarray(dndz)))]))

# SNR-binned counts for a likelihood grid
q_edges = np.array([6.0, 7.0, 9.0, 12.0, np.inf])
grid = hm.cluster_counts_q_bins(q_edges, sigN, fsky=fsky,
                                z_edges=np.array([0.05, 0.3, 0.6, 1.2]),
                                **SC)
print("N per (z-bin, q-bin):")
print(np.asarray(grid).round(1))

# Fisher on the scaling relation from Poisson counts:
# F_ab = sum_bins dN/dtheta_a dN/dtheta_b / N
zgrid, msg, nzm = np.asarray(hm.zs), np.asarray(hm.ms), hm.nzm
chis = hm.comoving_radial_distance(hm.zs)
hzs = hm.h_of_z(hm.zs)
ez = bgmod.e_of_z(hm.bg, hm.zs)


def counts(theta):
    sc = dict(SC, alpha=theta[0], sigma_lnY=theta[1],
              lnYstar=theta[2])
    return cc.counts_q_bins(zgrid, msg, nzm, chis, hzs, ez, q_edges, sigN,
                            fsky=fsky, z_edges=np.array([0.05, 0.3, 0.6, 1.2]),
                            **sc).ravel()

theta0 = jnp.array([SC["alpha"], SC["sigma_lnY"], SC["lnYstar"]])
J = jax.jacfwd(counts)(theta0)                    # (nbins, 3)
Nb = counts(theta0)
F = (J.T * (1.0 / jnp.clip(Nb, 1e-12))) @ J
cov = jnp.linalg.inv(F)
names = ["alpha", "sigma_lnY", "lnYstar"]
for i, n in enumerate(names):
    print(f"sigma({n}) = {float(jnp.sqrt(cov[i, i])):.4f}")
