"""Nonlinear matter power: HMcode-2016 ('mead') vs Takahashi halofit vs
the explicit halo model, plus the HMcode baryonic-feedback knob.

The reference gets its nonlinear P(k,z) from CAMB with
halofit_version='mead' (hmvec/cosmology.py:174); here both models are
native jnp (models/hmcode.py, models/halofit.py) and differentiable --
the feedback-sensitivity derivative at the end has no reference analogue.
"""

import numpy as np

import hmvec_tpu as hm


def main():
    zs = np.array([0.0, 0.5, 1.0])
    ks = np.geomspace(1e-3, 20.0, 200)
    ms = np.geomspace(2e10, 1e17, 120)

    # HaloModel(halofit='mead') caches nPzk through HMcode-2016
    hcos = hm.HaloModel(zs, ks, ms=ms, halofit="mead")
    p_mead = np.asarray(hcos.nPzk)
    p_lin = np.asarray(hcos.Pzk)

    from hmvec_tpu.models.cosmology import Cosmology
    from hmvec_tpu.models.halofit import halofit_power
    from hmvec_tpu.models.hmcode import hmcode_power

    c = Cosmology()
    p_tak = np.asarray(halofit_power(c, zs, ks))
    p_hm = np.asarray(hcos.get_power("nfw"))   # explicit 1h+2h halo model

    i = np.argmin(np.abs(ks - 1.0))
    print("P(k=1, z=0):  linear %.1f  mead %.1f  takahashi %.1f  halo-model %.1f"
          % (p_lin[0, i], p_mead[0, i], p_tak[0, i], p_hm[0, i]))
    print("mead/takahashi over k in [0.03, 3]:")
    sel = (ks > 0.03) & (ks < 3.0)
    for iz, z in enumerate(zs):
        r = (p_mead / p_tak)[iz, sel]
        print(f"  z={z:.1f}: {r.min():.3f} .. {r.max():.3f}")

    # baryonic feedback: suppression from lowering the concentration
    # amplitude (HMcode's A parameter; Mead 2015 fig. 6)
    p_agn = np.asarray(hmcode_power(c, zs, ks, A_bary=2.32))
    i5 = np.argmin(np.abs(ks - 5.0))
    print("feedback suppression P(A=2.32)/P(A=3.13) at k=5:",
          np.round((p_agn / p_mead)[:, i5], 3))

    # differentiable: d ln P / d A_bary at k=5, z=0 (no reference analogue)
    import jax
    import jax.numpy as jnp

    def lnp(a):
        return jnp.log(hmcode_power(c, np.array([0.0]),
                                    np.array([5.0]), A_bary=a)[0, 0])

    g = jax.grad(lnp)(jnp.asarray(3.13))
    print("d ln P / d A_bary (k=5, z=0): %.4f" % float(g))

    # one-loop SPT (models/spt.py): the perturbative tier, vs linear and
    # HMcode on quasi-linear scales
    ks_pt = np.geomspace(0.02, 0.3, 8)
    p_1l = np.asarray(c.P_mm_1loop(zs, ks_pt))
    p_lin = np.asarray(c.P_lin(jnp.asarray(ks_pt), zs))
    p_hm = np.asarray(hmcode_power(c, zs, ks_pt))
    print("\none-loop SPT / linear (z=0):",
          np.round((p_1l / p_lin)[0], 3))
    print("one-loop SPT / HMcode (z=1, k<=0.3):",
          np.round((p_1l / p_hm)[1], 3))
    # IR resummation: damps the spurious undamped SPT BAO wiggles
    p_ir = np.asarray(c.P_mm_1loop(zs, ks_pt, ir_resum=True))
    print("IR-resummed / plain 1-loop (z=0):",
          np.round((p_ir / p_1l)[0], 4))

    # quadratic-bias galaxy spectra (b1, b2, bs2 one-loop basis)
    from hmvec_tpu.models import spt as sptm
    ks_tab = np.geomspace(1e-5, 1e3, 1200)
    pk_tab = np.asarray(c.P_lin(jnp.asarray(ks_tab), np.array([0.0])))[0]
    pgg = np.asarray(sptm.pgg_1loop(ks_pt, ks_tab, pk_tab, b1=2.0,
                                    b2=0.6))
    print("P_gg(b1=2, b2=0.6) / b1^2 P_mm (z=0):",
          np.round(pgg / (4.0 * p_1l[0]), 3))


if __name__ == "__main__":
    main()
