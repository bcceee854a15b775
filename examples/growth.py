"""Growth factor across cosmologies (reference: examples/growth.py).

D(z) from the closed-form Heath integral for several (omm, oml) choices,
plus the autodiff growth rate f(z) = dlnD/dlna, and -- new in round 3 --
the integrated growing mode for w0/wa dark energy
(background.growth_table; the reference needs a live Boltzmann engine for
this, cosmology.py:288-294).
"""

import numpy as np

from hmvec_tpu.models import background as bgm
from hmvec_tpu.params import merge_params


def main():
    zs = np.linspace(0.0, 4.0, 9)
    for omch2 in (0.08, 0.1198, 0.16):
        p = merge_params({"omch2": omch2})
        bg = bgm.background(p)
        D = np.asarray(bgm.d_growth(bg, 1.0 / (1.0 + zs), norm="z0norm"))
        f = np.asarray(bgm.growth_rate_f(bg, zs + 1e-3))
        print(f"omch2={omch2}: omm0={float(bg.omm0):.3f}")
        print("  z:", np.round(zs, 2))
        print("  D:", np.round(D, 4))
        print("  f:", np.round(f, 4))

    # w0/wa dark energy: ODE growing mode vs the (LCDM-only) closed form
    for w0, wa in ((-1.0, 0.0), (-0.9, 0.0), (-0.9, 0.3)):
        p = merge_params({"w0": w0, "wa": wa})
        bg = bgm.background(p)
        mode = bgm.growth_mode_for(p)
        D = np.asarray(bgm.d_growth(bg, 1.0 / (1.0 + zs), norm="z0norm",
                                    mode=mode))
        f = np.asarray(bgm.growth_rate_f(bg, zs + 1e-3, mode=mode))
        print(f"w0={w0} wa={wa} [{mode}]: D(z=1)={D[2]:.4f} "
              f"f(z=1)={f[2]:.4f}")


if __name__ == "__main__":
    main()
