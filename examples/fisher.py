"""Fisher forecasting by autodiff -- the capability the reference's design
note asks for (hmvec.py:50-64) but does by finite-difference re-runs.

One jacfwd through the fused pipeline gives dC_kk/dtheta for all parameters
simultaneously; the Fisher matrix follows from a Knox covariance.

Run with ``--engine boltz`` for the ENGINE-GRADE mode: the linear tier is
the boltzlite hierarchy solve with shape_response, so the omch2/H0 columns
of the Jacobian carry the solved transfer-function response (cached +-h
re-solves differenced inside the trace) instead of the EH98 shape
derivative -- autodiff Fisher at Boltzmann-solver fidelity.
"""

import sys

import numpy as np
import jax.numpy as jnp

import hmvec_tpu as hm
from hmvec_tpu.models.cov import knox_cov


def main():
    zs = np.linspace(0.1, 3.0, 10)
    ms = np.geomspace(2e10, 1e17, 100)
    ks = np.geomspace(1e-4, 50, 300)
    ells = np.geomspace(30, 2000, 25)

    engine = None
    if "--engine" in sys.argv and \
            sys.argv[sys.argv.index("--engine") + 1] == "boltz":
        from hmvec_tpu.models.boltz_engine import BoltzEngine, default_k_grid
        # reduced solver grid keeps the 1 + 6 cached host solves ~minutes
        engine = BoltzEngine(kmax=0.3, k_graft=0.26,
                             ks=default_k_grid(kmax=0.3, dk_bao=0.0075,
                                               nk_log=12),
                             shape_response=True)
        print("engine-grade mode: boltz + shape_response "
              "(omch2/H0 Jacobian columns from cached re-solves)")

    fn = hm.make_lensing_cls_fn(zs, ks, ms, ells, jit=False, engine=engine)
    names = ("omch2", "As", "H0")
    fid = {"omch2": 0.1198, "As": 2.2e-9, "H0": 67.3}

    ckk_fid, _ = fn(fid)
    jac = hm.fisher_jacobian(lambda o: fn(o)[0], fid, names)  # (nell, npar)
    jac = np.asarray(jac)

    # Gaussian covariance (auto-spectrum, Knox)
    dl = np.gradient(ells)
    var = np.asarray(knox_cov(ckk_fid, ckk_fid, ckk_fid, ckk_fid,
                              ells, dl, fsky=0.4))
    F = np.einsum("la,l,lb->ab", jac, 1.0 / var, jac)
    cov = np.linalg.inv(F)
    sigmas = np.sqrt(np.diag(cov))
    print("Fisher forecast (C_kk only, fsky=0.4):")
    for n, s, f0 in zip(names, sigmas, (fid[k] for k in names)):
        print(f"  sigma({n}) = {s:.3e}  ({100*s/f0:.2f}% of fiducial)")


if __name__ == "__main__":
    main()
