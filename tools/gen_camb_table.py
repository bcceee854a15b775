"""Generate a CAMB P(z,k) + CMB Cls table for hmvec_tpu.

Run this OFFLINE on a machine with CAMB installed (this TPU environment has
none); ship the resulting .npz next to your analysis and load it with:

    import numpy as np
    import hmvec_tpu as hm
    t = np.load("camb_table.npz")
    hcos = hm.HaloModel(zs, ks, ms=ms, engine="camb",
                        pk_table=(t["zs"], t["ks"], t["plin"]),
                        cls_table={k: t[k] for k in
                                   ("cls_lensed", "cls_unlensed",
                                    "cls_lens_potential") if k in t})

This reproduces the reference's 'high'/'medium' accuracy tiers
(hmvec/cosmology.py:353-382) with real Boltzmann normalization, plus
get_cmb_cls / cmb_lensing_kk_exact (cosmology.py:67-81,:660-691), while
the TPU pipeline stays engine-free at runtime.
"""

import numpy as np


def main(out="camb_table.npz", zmax=6.0, nz=64, kmax=2100.0, nk=1200,
         lmax=10000, lens_potential_accuracy=4, **cosmo):
    import camb  # offline dependency

    pars = camb.set_params(
        H0=cosmo.get("H0", 67.3), ombh2=cosmo.get("ombh2", 0.02225),
        omch2=cosmo.get("omch2", 0.1198), ns=cosmo.get("ns", 0.9645),
        As=cosmo.get("As", 2.2e-9), mnu=cosmo.get("mnu", 0.0),
        tau=cosmo.get("tau", 0.06))
    pars.WantTransfer = True
    zs = np.linspace(0.0, zmax, nz)
    ks = np.geomspace(1e-5, kmax, nk)
    PK = camb.get_matter_power_interpolator(
        pars, nonlinear=False, hubble_units=False, k_hunit=False,
        kmax=kmax, var1="delta_tot", var2="delta_tot", zmax=zmax)
    PKnl = camb.get_matter_power_interpolator(
        pars, nonlinear=True, hubble_units=False, k_hunit=False,
        kmax=kmax, var1="delta_tot", var2="delta_tot", zmax=zmax)
    plin = PK.P(zs, ks, grid=True)
    pnl = PKnl.P(zs, ks, grid=True)

    # CMB spectra (reference get_cmb_cls semantics: raw_cl, muK units,
    # cosmology.py:67-81; lens potential in CAMB deflection convention)
    pars.set_for_lmax(lmax + 500,
                      lens_potential_accuracy=lens_potential_accuracy)
    results = camb.get_results(pars)
    powers = results.get_cmb_power_spectra(pars, CMB_unit="muK",
                                           raw_cl=True)
    cls_lensed = powers["total"][:lmax + 1]
    cls_unlensed = powers["unlensed_scalar"][:lmax + 1]
    cls_lens_potential = results.get_lens_potential_cls(lmax=lmax)

    np.savez_compressed(out, zs=zs, ks=ks, plin=plin, pnl=pnl,
                        cls_lensed=cls_lensed, cls_unlensed=cls_unlensed,
                        cls_lens_potential=cls_lens_potential)
    print("wrote", out, plin.shape, cls_lensed.shape)


if __name__ == "__main__":
    main()
