"""Massive-neutrino effects on the matter power (round-3 capability).

The reference gets these by passing mnu to CAMB
(/root/reference/hmvec/cosmology.py:167,170-171); here the engine-free
tier applies the EH99 free-streaming suppression ratio
(models/transfer.eh99_neutrino_ratio) automatically when mnu > 0 --
including through sigma8, the halo mass function, and Fisher derivatives.
"""

import numpy as np

import jax
import jax.numpy as jnp

from hmvec_tpu.models import background as bgm
from hmvec_tpu.models import linear_power as lpm
from hmvec_tpu.models.cosmology import Cosmology
from hmvec_tpu.params import merge_params


def main():
    ks = np.geomspace(1e-4, 10.0, 400)
    zs = np.array([0.0])

    print("linear-power suppression vs mnu = 0 (z = 0):")
    p0 = np.asarray(lpm.plin_approx(
        bgm.background(merge_params({"mnu": 0.0})), zs, ks))
    for mnu in (0.06, 0.12, 0.3, 0.6):
        p = merge_params({"mnu": mnu})
        bg = bgm.background(p)
        pm = np.asarray(lpm.plin_approx(bg, zs, ks))
        f_nu = float(bg.omnu0 / (bg.omm0 + bg.omnu0))
        i1 = np.argmin(np.abs(ks - 1.0))
        print(f"  mnu = {mnu:4.2f} eV  (f_nu = {f_nu:.4f}):  "
              f"P/P0(k=1) = {pm[0, i1] / p0[0, i1]:.3f}   "
              f"(-8 f_nu ballpark: {1 - 8 * f_nu:.3f})")

    print("\nsigma8 response:")
    for mnu in (0.0, 0.12, 0.3):
        s8 = float(Cosmology({"mnu": mnu}).get_sigma8(np.array([0.0]))[0])
        print(f"  mnu = {mnu:4.2f} eV:  sigma8 = {s8:.4f}")

    # Fisher derivative d ln P / d mnu at a nonzero fiducial (the EH99
    # fit has an f_nu^0.64 cusp at exactly zero -- differentiate at the
    # measured-oscillation floor instead)
    base = merge_params({})

    def lnp(mnu, k):
        pp = dict(base)
        pp["mnu"] = mnu
        bg = bgm.background(pp)
        return jnp.log(lpm.plin_approx(bg, jnp.array([0.0]),
                                       jnp.array([k]))[0, 0])

    g = jax.grad(lnp)
    print("\nd ln P / d mnu at mnu = 0.06 eV:")
    for k in (0.01, 0.1, 1.0):
        print(f"  k = {k:5.2f}:  {float(g(jnp.asarray(0.06), k)):+.3f} /eV")


if __name__ == "__main__":
    main()
