"""Engine-free CMB power spectra: the built-in reduced Boltzmann solver.

The reference calls CAMB for all of this
(/root/reference/hmvec/cosmology.py:67-81); here the whole chain --
recombination, the perturbation hierarchy, LOS sources, unlensed
TT/EE/TE, the exact low-L lensing potential, and the flat-sky lensed
spectra -- runs natively (models/recomb.py, models/boltzlite.py,
models/lensed_cls.py) at the labeled few-percent tier.  Produces
cmb_cls.png (TT/EE + lensing potential panels) and prints the acoustic
landmarks against their Planck-2018-class values.
"""

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

import matplotlib  # noqa: E402

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from hmvec_tpu.models.cosmology import Cosmology  # noqa: E402


def main():
    lmax = 860
    cos = Cosmology()
    out = cos.get_cmb_cls(lmax=lmax, approx=True)

    ells = np.arange(lmax + 1, dtype=float)
    fac = ells * (ells + 1.0) / (2.0 * np.pi)
    dl_u = out["unlensed_scalar"][:, 0] * fac
    dl_l = out["total"][:, 0] * fac
    dle = out["total"][:, 1] * fac
    dpp = out["lens_potential"][:, 0]          # [L(L+1)]^2 C_phiphi / 2pi

    ipk = 150 + np.argmax(dl_u[150:300])
    print(f"first TT peak: l={ipk}, D={dl_u[ipk]:.0f} muK^2 "
          "(Planck-class: l=220, ~5750)")
    ipp = 10 + np.argmax(dpp[10:200])
    print(f"lensing potential peak: L={ipp}, "
          f"1e7*[L(L+1)]^2 C/2pi={1e7 * dpp[ipp]:.2f} "
          "(Planck-class: L~35-40, ~1.45)")
    sm = 1.0 - dl_l[ipk] / dl_u[ipk]
    print(f"lensing smooths the first peak by {100 * sm:.1f}%")

    fig, axes = plt.subplots(1, 3, figsize=(13, 3.6))
    axes[0].plot(ells[2:], dl_u[2:], label="unlensed")
    axes[0].plot(ells[2:], dl_l[2:], "--", label="lensed")
    axes[0].set_xlabel("$\\ell$")
    axes[0].set_ylabel("$D_\\ell^{TT}$ [$\\mu K^2$]")
    axes[0].legend()
    axes[1].plot(ells[2:], dle[2:])
    axes[1].set_xlabel("$\\ell$")
    axes[1].set_ylabel("$D_\\ell^{EE}$ [$\\mu K^2$]")
    axes[2].semilogx(ells[2:], 1e7 * dpp[2:])
    axes[2].set_xlabel("$L$")
    axes[2].set_ylabel("$10^7 [L(L+1)]^2 C_L^{\\phi\\phi}/2\\pi$")
    for ax in axes:
        ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig("cmb_cls.png", dpi=110)
    print("wrote cmb_cls.png")


if __name__ == "__main__":
    main()
