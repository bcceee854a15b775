"""The full halofit_version sweep -- the native analogue of the
reference's bin/test_halofit.py (which loops HaloCosmology(halofit=v)
over ['takahashi','original','bird','peacock','mead','casarini',
'mead2015'] and plots each ratio to takahashi per redshift).

Here every version is engine-free jnp (models/halofit.py,
models/hmcode.py), plus 'mead2020' and 'mead2020_feedback' (HMcode-2020
and its T_AGN baryonic-feedback response, beyond the reference's list).  Produces halofit_comp_z_{i}.png ratio panels like the
reference's script.
"""

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

import matplotlib  # noqa: E402

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from hmvec_tpu.models.cosmology import Cosmology  # noqa: E402

VERSIONS = ["takahashi", "original", "bird", "peacock", "mead",
            "casarini", "mead2015", "mead2020", "mead2020_feedback"]


def main():
    zs = np.array([0.0, 1.0, 2.0])
    ks = np.geomspace(1e-3, 20.0, 200)
    c = Cosmology()

    pks = {v: np.asarray(c.P_mm_nonlinear(ks, zs, halofit_version=v))
           for v in VERSIONS}

    for i, z in enumerate(zs):
        fig, ax = plt.subplots(figsize=(6, 4))
        for v in VERSIONS[1:]:
            ax.semilogx(ks, pks[v][i] / pks[VERSIONS[0]][i], label=v)
        ax.axhline(1.0, color="k", lw=0.5)
        ax.set_xlabel("k [1/Mpc]")
        ax.set_ylabel("P(k) / P_takahashi(k)")
        ax.set_title(f"z = {z}")
        ax.legend(fontsize=7)
        fig.tight_layout()
        fig.savefig(f"halofit_comp_z_{i}.png", dpi=110)
        plt.close(fig)
        r = {v: float(np.max(np.abs(pks[v][i] / pks[VERSIONS[0]][i] - 1)))
             for v in VERSIONS[1:]}
        print(f"z={z}: max |ratio-1| vs takahashi:",
              {k: round(val, 3) for k, val in r.items()})


if __name__ == "__main__":
    main()
