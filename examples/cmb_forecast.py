"""Self-contained CMB-survey forecasting: no external Boltzmann products.

The reference's kSZ forecasting layer requires the caller to supply a
total CMB TT spectrum from an external code (reference ksz.py:290-336),
and it has no lensing-reconstruction noise model.  Here the whole chain
is in-package:

  boltzlite lensed TT/EE  ->  + Knox instrument noise (beam-deconvolved)
    ->  kSZ velocity-reconstruction SNR  (models/ksz.py)
    ->  quadratic-estimator N0 (TT/EB -> minimum variance)
    ->  iterative EB delensing (Smith-2012 fixed point)
    ->  per-L S/N on the halo-model C_kk  (Limber pipeline)

Runs on CPU (a few minutes: the Boltzmann solve dominates).
"""

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

import hmvec_tpu as hm  # noqa: E402
from hmvec_tpu.models.cosmology import Cosmology  # noqa: E402


def main():
    lmax = 3000
    beam, noise_t = 1.4, 6.0                      # SO-like arcmin / muK-arcmin

    cosmo = Cosmology()
    cls = cosmo.get_cmb_cls(lmax=lmax, approx=True)
    cl_tt = np.asarray(cls["total"][:, 0])        # lensed TT, muK^2 raw Cl
    cl_ee = np.asarray(cls["total"][:, 1])

    tot_tt = np.asarray(hm.total_cl_tt(cl_tt, noise_t, beam))
    nl_p = np.asarray(hm.white_noise_nl(np.arange(lmax + 1),
                                        noise_t * np.sqrt(2.0), beam))
    tot_ee = cl_ee + nl_p

    # --- kSZ velocity-reconstruction SNR with the in-package total TT ---
    snr, _ = hm.get_ksz_snr(1.0, 0.55, 1e-4, tot_tt,
                            num_kL_bins=20, num_kS_bins=31,
                            num_mu_bins=32)
    snr = float(snr)
    print(f"kSZ velocity SNR (V=1 Gpc^3, z=0.55, nbar=1e-4): {snr:.1f}")

    # --- lensing reconstruction noise: TT + EB -> minimum variance ---
    # the EB denominator carries the LENSING B-power (it dominates the
    # instrument BB at this depth), built from the halo-model C_kk
    Ls = np.unique(np.geomspace(20, 2000, 40).astype(int)).astype(float)
    L_int = np.arange(lmax + 1, dtype=float)
    ells_kk, clkk_kk = cosmo.cmb_lensing_limber(lmax, nonlinear=True)
    clkk_int = np.interp(L_int, np.asarray(ells_kk), np.asarray(clkk_kk))
    clpp = np.zeros(lmax + 1)
    clpp[2:] = 4.0 * clkk_int[2:] / (L_int[2:] * (L_int[2:] + 1.0)) ** 2
    tot_bb = hm.lensed_bb_from_ee(cl_ee, clpp, lmax_out=lmax) + nl_p

    n0_tt = hm.n0_flat_sky(Ls, "TT", cl_tt, tot_tt, lmin=30, lmax=lmax)
    n0_eb = hm.n0_flat_sky(Ls, "EB", cl_ee, tot_ee, cl_total2=tot_bb,
                           lmin=30, lmax=lmax)

    # --- iterative EB delensing (CMB-S4-style internal delensing) ---
    n0_eb_it = hm.n0_eb_iterative(Ls, cl_ee, tot_ee, clpp, nl_p,
                                  lmin=30, lmax=lmax)
    j = np.searchsorted(Ls, 500)
    r = float(np.asarray(n0_eb)[j] / np.asarray(n0_eb_it)[j])
    print(f"EB delensing at L~500: N0 improves x{r:.2f}")

    n0_mv = np.asarray(hm.n0_kappa_from_phi(
        Ls, hm.n0_minimum_variance([n0_tt, n0_eb_it])))

    # --- exact five-estimator MV (TT/TE/EE/EB/TB + cross-covariances) ---
    cl_te = np.asarray(cls["total"][:, 3])
    grads = {"TT": cl_tt, "EE": cl_ee, "TE": cl_te}
    tots = {"TT": tot_tt, "EE": tot_ee, "BB": tot_bb, "TE": cl_te}
    n0_mv5 = np.asarray(hm.n0_kappa_from_phi(
        Ls, hm.n0_mv_flat_sky(Ls, grads, tots, lmin=30, lmax=lmax)))
    i = np.searchsorted(Ls, 100)
    print(f"five-estimator exact MV at L~100: N0 = {n0_mv5[i]:.3e} "
          f"(x{np.asarray(hm.n0_kappa_from_phi(Ls, n0_tt))[i] / n0_mv5[i]:.2f} "
          f"better than TT alone)")

    # --- halo-model C_kk and per-L S/N ---
    clkk_L = np.interp(Ls, np.asarray(ells_kk), np.asarray(clkk_kk))
    fsky = 0.4
    # Knox per-log-bin S/N with the reconstruction noise
    dL = np.gradient(Ls)
    var = 2.0 * (clkk_L + n0_mv) ** 2 / ((2 * Ls + 1) * dL * fsky)
    sn_kk = np.sqrt(np.sum(clkk_L**2 / var))
    print(f"C_kk detection S/N (fsky={fsky}, MV TT+EB): {sn_kk:.0f}")
    i = np.searchsorted(Ls, 100)
    print(f"at L~100: C_kk={clkk_L[i]:.3e}, N0_MV={n0_mv[i]:.3e} "
          f"(ratio {clkk_L[i] / n0_mv[i]:.2f})")


if __name__ == "__main__":
    main()
