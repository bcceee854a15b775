"""tSZ y-power spectrum (mirrors the reference's 'tSZ example.ipynb'):
Tinker mass function + 'mean' mass definition + Battaglia pressure profile
-> P_yy -> Limber C_yy."""

import numpy as np

import hmvec_tpu as hm


def main():
    zs = np.linspace(0.05, 3.0, 12)
    ms = np.geomspace(1e11, 5e15, 100)
    ks = np.geomspace(1e-4, 30, 300)
    ells = np.geomspace(100, 8000, 20)

    hcos = hm.HaloModel(zs, ks, ms=ms, mass_function="tinker", mdef="mean")
    hcos.add_battaglia_pres_profile("y", family="pres")
    Pyy = hcos.get_power("y")
    cl_yy = np.asarray(hcos.C_yy(ells, zs, ks, Pyy))

    print("ell      10^12 ell(ell+1) C_yy / 2pi")
    for i in range(0, len(ells), 4):
        dl = ells[i] * (ells[i] + 1) * cl_yy[i] / (2 * np.pi)
        print(f"{ells[i]:8.1f}  {1e12*dl:10.4f}")


if __name__ == "__main__":
    main()
