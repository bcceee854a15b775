"""Round-3 extension tour: RSD multipoles, configuration-space
statistics, cluster counts, P(k) covariance, and the CIB halo model.

None of these exist in the reference (simonsobs/hmvec) -- they are the
standard survey-analysis companions to its halo-model spectra, built on
this package's FFTLog, mass-function, and generic tracer machinery.
"""

import numpy as np

import hmvec_tpu as hm


def main():
    zs = np.array([0.3, 0.8, 1.5])
    ks = np.geomspace(1e-3, 20.0, 128)
    ms = np.geomspace(1e10, 1e16, 128)
    hcos = hm.HaloModel(zs, ks, ms=ms)

    # --- RSD: Kaiser multipoles of the linear power at z = 0.8 ---
    f = float(hcos.get_growth_rate_f(np.array([0.8]))[0])
    b = 2.0
    ks_log = np.geomspace(1e-4, 1e2, 1024)
    pk = np.asarray(hcos.P_lin(ks_log, np.array([0.8])))[0]
    pls = hm.rsd_multipoles(ks_log, pk, b, f)
    fac = hm.kaiser_multipole_factors(b, f)
    i = np.argmin(np.abs(ks_log - 0.1))
    print("P0/P2/P4 at k=0.1 (b=2, f=%.3f):" % f,
          [np.round(float(np.asarray(pls[l])[i]), 1) for l in (0, 2, 4)],
          " Kaiser factors:", {l: round(float(fac[l]), 3) for l in fac})

    # --- correlation multipoles + BAO peak ---
    ss, xis = hm.correlation_multipoles(ks_log, pls)
    ss = np.asarray(ss)
    sel = (ss > 110) & (ss < 190)  # ~147 Mpc in this package's no-h units
    s2xi = ss[sel] ** 2 * np.asarray(xis[0])[sel]
    print("BAO peak in s^2 xi_0(s): s = %.1f Mpc" % ss[sel][np.argmax(s2xi)])

    # --- mean pairwise velocity (kSZ forecasting ingredient) ---
    aH = float(hcos.hubble_parameter(0.8)) / (1.0 + 0.8)
    rs, v12 = hm.mean_pairwise_velocity(ks_log, pk, f, aH)
    rs = np.asarray(rs)
    i20 = np.argmin(np.abs(rs - 20.0))
    print("v12(20 Mpc, z=0.8) = %.1f km/s" % float(np.asarray(v12)[i20]))

    # --- cluster counts ---
    dndz, ntot = hcos.cluster_counts(3e14, fsky=0.4)
    print("clusters above 3e14 Msun (fsky=0.4): dN/dz =",
          np.round(np.asarray(dndz), 0), " N_total = %.0f" % float(ntot))

    # --- P(k) covariance: Gaussian vs non-Gaussian terms ---
    cov = hcos.get_pk_covariance(volume_gpc3=2.0)
    kk = np.argmin(np.abs(ks - 0.5))
    g = float(np.asarray(cov["gauss"])[0, kk, kk])
    ng = float(np.asarray(cov["t1h"] + cov["ssc"])[0, kk, kk])
    print("cov diag at k=0.5, z=0.3: NG/G = %.2f" % (ng / g))

    # --- CIB halo model: auto/cross spectra at Planck HFI bands ---
    hcos.add_cib_tracer("cib545", 545.0)
    hcos.add_cib_tracer("cib217", 217.0)
    ells = np.geomspace(100, 3000, 16)
    c55 = np.asarray(hcos.get_cib_cls(ells, "cib545"))
    c25 = np.asarray(hcos.get_cib_cls(ells, "cib545", "cib217"))
    c22 = np.asarray(hcos.get_cib_cls(ells, "cib217"))
    rho = c25 / np.sqrt(c55 * c22)
    print("CIB 217x545 decorrelation rho(ell):",
          np.round(rho[[0, 8, -1]], 3), "(ell =",
          np.round(ells[[0, 8, -1]], 0), ")")
    # CIB x tSZ cross through the same tracer machinery
    hcos.add_battaglia_pres_profile("y")
    cyc = np.asarray(hcos.get_power("cib545", "y"))
    print("CIB x y power finite:", bool(np.all(np.isfinite(cyc))))

    # --- halo exclusion: 2-halo suppression at quasi-linear k ---
    p2h = np.asarray(hcos.get_power_2halo("nfw"))
    p2x = np.asarray(hcos.get_power_2halo("nfw", exclusion="auto"))
    kq = np.argmin(np.abs(ks - 0.5))
    print("halo exclusion at k=0.5 (auto radius %.2f Mpc): P2h x %.4f"
          % (float(np.asarray(hcos.exclusion_radius())[0]),
             p2x[0, kq] / p2h[0, kq]))

    # --- lognormal concentration scatter: 1-halo tail boost ---
    hcos.add_nfw_profile("nfw_sc", conc_scatter=0.35)
    psc = np.asarray(hcos.get_power("nfw_sc"))
    p00 = np.asarray(hcos.get_power("nfw"))
    print("conc scatter sigma_lnc=0.35: P(k=%.0f) x %.3f"
          % (ks[-1], psc[0, -1] / p00[0, -1]))

    # --- HI / 21 cm intensity mapping (models/hi.py) ---
    hcos.add_hi_tracer("hi")
    om_hi = np.asarray(hcos.get_omega_hi("hi"))
    b_hi = np.asarray(hcos.get_hi_bias("hi"))
    p21 = np.asarray(hcos.get_p21("hi"))
    i02 = np.argmin(np.abs(ks - 0.2))
    print("HI: Omega_HI(z=%.1f) = %.2e, b_HI = %.2f, "
          "P21(k=0.2) = %.3f mK^2 Mpc^3"
          % (hcos.zs[0], om_hi[0], b_hi[0], p21[0, i02]))


if __name__ == "__main__":
    main()
