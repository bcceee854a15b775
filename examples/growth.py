"""Growth factor across cosmologies (reference: examples/growth.py).

D(z) from the closed-form Heath integral for several (omm, oml) choices,
plus the autodiff growth rate f(z) = dlnD/dlna.
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


if __name__ == "__main__":
    main()
