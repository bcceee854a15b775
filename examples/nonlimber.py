"""Exact (non-Limber) vs Limber angular spectra at low ell.

EXTENSION beyond the reference (which only ships the Limber projection,
cosmology.py:867-904).  For a narrow dndz the Limber approximation is
tens of percent off at ell <~ 10; the FFTLog-based exact linear C_l
(models/nonlimber.py) fixes that, including the RSD (Kaiser) and
magnification-bias contributions to number counts that Limber-style
codes usually drop.
"""

import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from hmvec_tpu.params import merge_params
from hmvec_tpu.models import background as bgm, linear_power as lpm
from hmvec_tpu.models import nonlimber as nlm, limber as lim


def main():
    params = merge_params()
    bg = bgm.background(params)
    ks = np.geomspace(1e-5, 10.0, 600)
    pk0 = np.asarray(lpm.plin_approx(bg, jnp.asarray([0.0]),
                                     jnp.asarray(ks)))[0]

    # a narrow photometric-like bin at z ~ 0.55
    gzs = np.linspace(0.2, 0.9, 160)
    gdndz = np.exp(-0.5 * ((gzs - 0.55) / 0.08) ** 2)
    bias = 2.0

    ells = [2, 5, 10, 20, 50, 100]
    cl_exact = np.asarray(nlm.C_gg_exact(bg, ells, ks, pk0, gzs, gdndz,
                                         bias=bias))
    cl_rsd = np.asarray(nlm.C_gg_exact(bg, ells, ks, pk0, gzs, gdndz,
                                       bias=bias, rsd=True))
    cl_mag = np.asarray(nlm.C_gg_exact(bg, ells, ks, pk0, gzs, gdndz,
                                       bias=bias, rsd=True, smag=1.2))

    zs_l = np.linspace(0.2, 0.9, 120)
    Pzk = np.asarray(lpm.plin_approx(bg, jnp.asarray(zs_l), jnp.asarray(ks)))
    cl_lim = bias**2 * np.asarray(
        lim.C_gg(bg, jnp.asarray(np.asarray(ells, dtype=float)), zs_l, ks,
                 Pzk, gzs, gdndz))

    print(" ell   C_l exact     +RSD        +RSD+mag    Limber/exact-1")
    for i, l in enumerate(ells):
        print(f"{l:4d}  {cl_exact[i]:.4e}  {cl_rsd[i]:.4e}  "
              f"{cl_mag[i]:.4e}  {cl_lim[i] / cl_exact[i] - 1.0:+.3f}")

    # CMB-lensing x galaxies, exact at low ell
    ckg = np.asarray(nlm.C_kg_exact(bg, ells, ks, pk0, gzs, gdndz,
                                    bias=bias, lzs=1100.0))
    print("\n ell   C_l^{kg} exact")
    for i, l in enumerate(ells):
        print(f"{l:4d}  {ckg[i]:.4e}")


if __name__ == "__main__":
    main()
