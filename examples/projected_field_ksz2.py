"""Projected-field kSZ^2 x galaxy forecast (models/projfield.py).

The estimator that has actually DETECTED the kSZ effect in
cross-correlation: filter the CMB map, square it, cross-correlate with a
galaxy sample.  The whole chain is in-package:

  halo model (electron 'e' + HOD 'g')  ->  B_eeg bispectrum legs
    + linear-theory <v^2>(z) and the kSZ radial kernel
    ->  projected hybrid bispectrum b_TTg(l1, l2, l3)
    ->  C_l^{T_f^2 x g}  (one fused filter-convolution quadrature)
  + the lensing contamination term from the same filter and an in-repo
    C^TT/C^{phi g} model (the dominant real-data bias).

Runs on CPU in ~2 minutes.
"""

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from hmvec_tpu.models.halo_model import HaloModel  # noqa: E402
from hmvec_tpu.models import projfield as pf  # noqa: E402
from hmvec_tpu.models import limber as limb  # noqa: E402
from hmvec_tpu.models.lensing_noise import white_noise_nl  # noqa: E402


def main():
    zs = np.linspace(0.2, 1.0, 5)
    ks = np.geomspace(1e-3, 60.0, 128)
    ms = np.geomspace(2e10, 1e16, 96)
    hm = HaloModel(zs, ks, ms=ms)
    hm.add_battaglia_profile("e", family="AGN")
    hm.add_hod("g", ngal=np.full(zs.size, 1e-4))

    # a Wiener-ish filter f = b_l / (C_l^TT,total): use a smooth
    # Planck-like TT + SO-like noise for the denominator
    fgrid = np.arange(2.0, 8001.0)
    cl_tt = 2.0 * np.pi * 2500.0 / (fgrid * (fgrid + 1.0) ** 2) \
        * np.exp(-((fgrid / 3500.0) ** 2))
    nl = np.asarray(white_noise_nl(fgrid, 6.0, beam_fwhm_arcmin=1.4))
    fvals = np.exp(-0.5 * (fgrid * 1.4 * np.pi / 10800.0 / 2.355) ** 2) \
        / (cl_tt + nl)

    dndz = np.exp(-0.5 * ((zs - 0.6) / 0.25) ** 2)
    ells = np.array([100.0, 200.0, 400.0, 700.0, 1100.0, 1600.0])

    cl_ksz2g = np.asarray(pf.cl_ksz2_galaxy(
        hm, ells, (fgrid, fvals), gdndz=dndz, n_radial=40, n_angle=20))
    print("ell      C_l^{kSZ^2 x g} [uK^2]")
    for l, c in zip(ells, cl_ksz2g):
        print(f"{l:7.0f}  {c: .3e}")

    # lensing contamination with C^{phi g} from the same halo model:
    # W_kappa x galaxy Limber cross converted kappa -> phi (l^2/2 factor)
    pgm = hm.get_power("g", name2="nfw")
    ckg = np.asarray(limb.C_kg(hm.bg, fgrid, zs, ks, pgm, zs, gdndz=dndz,
                               lzs=1100.0))
    cl_phig = 2.0 * ckg / fgrid**2
    lens = np.asarray(pf.cl_t2_lensing(ells, (fgrid, fvals), cl_tt,
                                       cl_phig, lmin=2.0, lmax=8000.0))
    print("\nell      lensing term [uK^2]   |lens|/kSZ^2")
    for l, c, s in zip(ells, lens, cl_ksz2g):
        print(f"{l:7.0f}  {c: .3e}          {abs(c) / s:6.2f}")

    # detection forecast: Gaussian estimator noise x galaxy bandpowers
    cl_ss = np.asarray(pf.cl_t2_t2_gaussian(ells, (fgrid, fvals),
                                            cl_tt + nl, lmin=2.0,
                                            lmax=8000.0))
    pgg = hm.get_power("g", name2="g")
    ngal2d = 1e-4 * np.trapezoid(
        np.asarray(hm.comoving_radial_distance(zs)) ** 2
        / np.asarray(hm.h_of_z(zs)) * dndz / np.trapezoid(dndz, zs), zs)
    clgg = np.asarray(limb.C_gg(hm.bg, ells, zs, ks, pgg, zs,
                                gdndz=dndz)) + 1.0 / ngal2d
    snr2, snr = pf.ksz2_snr(ells, cl_ksz2g, cl_ss, clgg, fsky=0.4)
    print(f"\ntotal kSZ^2 x g detection SNR (fsky=0.4): {float(snr):.1f}")


if __name__ == "__main__":
    main()
