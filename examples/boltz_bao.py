"""Engine-grade BAO with no table file: the 'boltz' linear-power engine.

Compares the three engine-free linear-power tiers at z = 0:

  * EH98 'eisenhu_osc'  -- analytic fitting form (approximate wiggles at
    the EH98 fitting-form sound horizon, ~4% off the true integral)
  * the 'boltz' engine  -- the built-in Boltzmann hierarchy
    (models/boltz_engine.py): wiggles at the INTEGRATED drag-epoch
    sound horizon (Planck-2018: r_drag = 147.09 Mpc)
  * their ratio         -- the wiggle phase drift is visible by eye

and prints the integrated r_s(z_drag)/z_drag next to the EH98 fit.

Reference analogue: hmvec's default P_lin comes from CAMB's Boltzmann
solve (/root/reference/hmvec/cosmology.py:376,:784-786).
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np                              # noqa: E402
import jax.numpy as jnp                         # noqa: E402
import matplotlib                               # noqa: E402

matplotlib.use("Agg")
import matplotlib.pyplot as plt                 # noqa: E402

import hmvec_tpu as hm                          # noqa: E402
from hmvec_tpu.models import background as bgmod            # noqa: E402
from hmvec_tpu.models.linear_power import plin_approx       # noqa: E402
from hmvec_tpu.models.boltz_engine import default_k_grid    # noqa: E402
from hmvec_tpu.models.distances_ext import rs_drag_eh       # noqa: E402
from hmvec_tpu.params import merge_params       # noqa: E402


def main():
    p = merge_params()
    bg = bgmod.background(p)

    rs, zdrag = hm.rs_drag_integral(bg=bg)
    rs_eh = float(np.asarray(rs_drag_eh(bg)))
    print(f"integrated r_s(z_drag) = {rs:.2f} Mpc at z_drag = {zdrag:.1f} "
          f"(Planck 2018: 147.09 / 1059.9)")
    print(f"EH98 fitting-form r_s  = {rs_eh:.2f} Mpc "
          f"({(rs_eh / rs - 1) * 100:+.1f}%)")

    # reduced solver grid keeps this example ~1 minute on CPU
    eng = hm.BoltzEngine(kmax=0.42, k_graft=0.38,
                         ks=default_k_grid(kmax=0.42, dk_bao=0.005,
                                           nk_log=16))
    kd = np.geomspace(1e-3, 1.0, 800)
    z0 = jnp.asarray([0.0])
    pb = np.asarray(eng.plin(bg, z0, jnp.asarray(kd)))[0]
    pe = np.asarray(plin_approx(bg, z0, jnp.asarray(kd)))[0]

    fig, ax = plt.subplots(2, 1, figsize=(7, 7), sharex=True)
    ax[0].loglog(kd, pe, label="EH98 eisenhu_osc")
    ax[0].loglog(kd, pb, "--", label="boltz engine")
    ax[0].set_ylabel(r"$P_{\rm lin}(k)\ [{\rm Mpc}^3]$")
    ax[0].legend()
    ax[1].semilogx(kd, pb / pe)
    ax[1].axhline(1.0, color="k", lw=0.5)
    ax[1].set_xlabel(r"$k\ [{\rm Mpc}^{-1}]$")
    ax[1].set_ylabel("boltz / EH98")
    fig.tight_layout()
    fig.savefig("/tmp/boltz_bao.png", dpi=110)
    print("wrote /tmp/boltz_bao.png")


if __name__ == "__main__":
    main()
