"""Baryonic feedback on lensing spectra (reference: examples/lensing_baryons.py).

Builds NFW + Battaglia-gas + HOD tracers, forms total-matter spectra via the
baryon combinators, and projects to C_kg / C_kk ratios with and without
feedback.
"""

import numpy as np

import hmvec_tpu as hm


def main():
    zs = np.linspace(0.1, 3.0, 12)
    ms = np.geomspace(2e10, 1e17, 120)
    ks = np.geomspace(1e-4, 50, 400)
    ells = np.geomspace(30, 2000, 30)

    hcos = hm.HaloModel(zs, ks, ms=ms)
    hcos.add_battaglia_profile("e", family="AGN")
    hcos.add_hod("g", ngal=np.full(zs.size, 1e-4))

    Pnn = hcos.get_power("nfw")
    Pne = hcos.get_power("nfw", "e")
    Pee = hcos.get_power("e")
    Pgn = hcos.get_power("g", "nfw")
    Pge = hcos.get_power("g", "e")

    Pmm_fb = hcos.total_matter_power_spectrum(Pnn, Pne, Pee)
    Pgm_fb = hcos.total_matter_galaxy_power_spectrum(Pgn, Pge)

    gdndz = np.exp(-((zs - 0.8) ** 2) / (2 * 0.3**2))
    Ckk_nofb = hcos.C_kk(ells, zs, ks, Pnn, lzs1=1100.0, lzs2=1100.0)
    Ckk_fb = hcos.C_kk(ells, zs, ks, Pmm_fb, lzs1=1100.0, lzs2=1100.0)
    Ckg_nofb = hcos.C_kg(ells, zs, ks, Pgn, gzs=zs, gdndz=gdndz, lzs=1100.0)
    Ckg_fb = hcos.C_kg(ells, zs, ks, Pgm_fb, gzs=zs, gdndz=gdndz, lzs=1100.0)

    print("ell   C_kk(fb)/C_kk   C_kg(fb)/C_kg")
    for i in range(0, len(ells), 6):
        print(f"{ells[i]:7.1f}  {float(Ckk_fb[i]/Ckk_nofb[i]):.4f}"
              f"          {float(Ckg_fb[i]/Ckg_nofb[i]):.4f}")


if __name__ == "__main__":
    main()
