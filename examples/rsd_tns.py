"""Redshift-space galaxy power multipoles: Kaiser -> Scoccimarro -> TNS.

The reference has no redshift-space modeling; this demonstrates the
EXTENSION ladder on one grid: the linear Kaiser multipoles, the
nonlinear Kaiser bracket on the one-loop density/velocity-divergence
spectra (Scoccimarro 2004), and the full TNS model with the A/B
velocity-density coupling terms (the BOSS/DESI full-shape standard,
sympy-derived kernels -- see tools/gen_tns_kernels.py), plus the
HOD-driven galaxy-level wrapper and a growth-rate Fisher derivative
that no reference analogue exists for.
"""

import numpy as np
import jax
import jax.numpy as jnp

import hmvec_tpu as hm


def main():
    zs = np.array([0.5, 1.0])
    ks = np.geomspace(0.02, 0.25, 24)

    cos = hm.Cosmology(accuracy="low")
    fz = np.asarray(cos.get_growth_rate_f(zs))
    print("growth rate f(z):", np.round(fz, 3))

    kw = dict(n_q=128, n_x=64, n_q13=256)
    for model in ("kaiser", "scoccimarro", "tns"):
        mp = cos.get_rsd_multipoles(zs, ks, b=2.0, model=model, **kw)
        p0 = float(np.interp(0.1, ks, np.asarray(mp[0])[0]))
        p2 = float(np.interp(0.1, ks, np.asarray(mp[2])[0]))
        print(f"{model:12s} z=0.5 k=0.1: P0={p0:9.1f}  P2={p2:9.1f}")

    # galaxy-level: bias from the HOD mass integral
    h = hm.HaloModel(zs, ks, ms=np.geomspace(1e10, 1e16, 60))
    h.add_hod("g", ngal=np.array([1e-4, 1e-4]))
    mp = h.get_galaxy_rsd_multipoles("g", model="tns", **kw)
    print("HOD b_g(z):", np.round(np.asarray(h.hods["g"]["bg"]), 2),
          " quadrupole/monopole at k=0.1, z=0.5:",
          round(float(np.interp(0.1, ks, np.asarray(mp[2])[0]))
                / float(np.interp(0.1, ks, np.asarray(mp[0])[0])), 3))

    # the RSD Fisher derivative: d P_ell / d f at fixed shape --
    # all mu/f dependence of the TNS terms is analytic, so this
    # gradient re-uses the loop integrals
    from hmvec_tpu.models import tns as tnsm, spt as sptm
    ks_tab = np.geomspace(1e-5, 1e3, 1200)
    pk0 = np.asarray(cos.P_lin(jnp.asarray(ks_tab), np.array([0.0])))[0]
    pv = sptm.pk_velocity_1loop(ks, ks_tab, pk0, n_q=128, n_x=64,
                                n_q13=256)
    ab = tnsm.tns_ab_integrals(ks, ks_tab, pk0, n_q=128, n_x=64)

    def p0_of_f(f):
        mp = tnsm.tns_multipoles(ks, pv["dd"], pv["dt"], pv["tt"],
                                 2.0, f, ab, sigma_v=4.0)
        return mp[0]

    dP0_df = jax.jacfwd(p0_of_f)(jnp.asarray(0.7))
    print("d ln P0 / d ln f at k=0.1:",
          round(0.7 * float(np.interp(0.1, ks, np.asarray(dP0_df)))
                / float(np.interp(0.1, ks, np.asarray(p0_of_f(0.7)))),
                3))

    # full-shape Fisher over (f, alpha_par, alpha_perp): AP-distorted
    # TNS multipoles + Gaussian multipole covariance, derivatives by
    # jacfwd through the whole observable
    from hmvec_tpu.models import rsd_obs
    nbar, V = 3e-4, 1.0e9            # 1 (Gpc)^3, BOSS-like density

    def datavector(theta):
        f_, apar, aperp = theta
        fn = lambda kp, mp_: rsd_obs.tns_pk_mu_points(   # noqa: E731
            kp, mp_, ks, pv["dd"], pv["dt"], pv["tt"], 2.0, f_, ab,
            sigma_v=4.0)
        mpd = rsd_obs.ap_multipoles(ks, fn, apar, aperp)
        return jnp.concatenate([mpd[ell] for ell in (0, 2, 4)])

    theta0 = jnp.array([0.7, 1.0, 1.0])
    fn0 = lambda kp, mp_: rsd_obs.tns_pk_mu_points(      # noqa: E731
        kp, mp_, ks, pv["dd"], pv["dt"], pv["tt"], 2.0, 0.7, ab,
        sigma_v=4.0)
    cov = np.asarray(rsd_obs.multipole_covariance(ks, fn0, nbar, V))
    J = np.asarray(jax.jacfwd(datavector)(theta0))       # (3*nk, 3)
    nk = len(ks)
    F = np.zeros((3, 3))
    for i in range(nk):
        Ci = cov[:, :, i]
        Ji = J[i::nk, :]             # rows (P0,P2,P4) at this k
        F += Ji.T @ np.linalg.solve(Ci, Ji)
    sig = np.sqrt(np.diag(np.linalg.inv(F)))
    print("Fisher 1-sigma (f, a_par, a_perp) for 1 Gpc^3:",
          np.round(sig, 4))


if __name__ == "__main__":
    main()
