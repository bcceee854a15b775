"""Pseudo-C_l (MASTER) analysis of a masked halo-model galaxy spectrum.

End-to-end: halo-model C_gg -> polar-cap survey mask -> coupled
pseudo-spectrum -> unbiased decoupled bandpowers -> mode-coupled (NKA)
Gaussian errors vs the naive fsky-Knox errors.  EXTENSION beyond the
reference, whose covariance layer is fsky-Knox only (hmvec/cov.py:33-63).
"""

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

from hmvec_tpu import HaloModel, shot_noise
from hmvec_tpu.models import limber as lim
from hmvec_tpu.models import master as mst

# ---- halo-model C_gg (same survey shape as forecast_3x2pt.py) ----
zs = np.linspace(0.25, 1.1, 12)
ks = np.geomspace(1e-3, 20.0, 128)
ms = np.geomspace(2e11, 1e16, 60)
gzs = np.linspace(0.3, 0.95, 40)
gdndz = np.exp(-0.5 * ((gzs - 0.6) / 0.12) ** 2)

LMAX = 500
ells = np.arange(LMAX + 1, dtype=np.float64)

hc = HaloModel(zs, ks, ms=ms)
hc.add_hod("g", ngal=np.full(zs.size, 4e-4))
pgg = hc.get_power("g")
cgg = np.asarray(lim.C_gg(hc.bg, jnp.asarray(ells[2:]), zs, ks, pgg,
                          gzs, gdndz))
cl = np.zeros(LMAX + 1)
cl[2:] = cgg
nl = shot_noise(6.0) * np.ones(LMAX + 1)          # 6 gal/arcmin^2

# ---- a 40-degree polar-cap survey mask ----
theta_cap = np.deg2rad(40.0)
fsky = (1.0 - np.cos(theta_cap)) / 2.0
wl = np.asarray(mst.cap_mask_cl(2 * LMAX, theta_cap))

# ---- couple, then decouple binned bandpowers ----
m00 = mst.coupling_matrix(LMAX, wl, (0, 0))
pseudo = mst.couple_cls(m00, cl + nl)
edges = np.unique(np.geomspace(30, LMAX + 1, 9).astype(int))
bp = np.asarray(mst.decouple_bandpowers(m00, pseudo, LMAX, edges))
B, _ = mst.bin_operator(LMAX, edges)
binned_truth = np.asarray(B @ (cl + nl))

# ---- NKA mode-coupled covariance vs fsky-Knox ----
cov_pseudo = mst.gaussian_covariance_nka(LMAX, wl, cl + nl, cl + nl,
                                         cl + nl, cl + nl)
cov_bp = np.asarray(mst.decoupled_covariance(m00, cov_pseudo, LMAX, edges))
sig_nka = np.sqrt(np.diag(cov_bp))

lmid = np.asarray(B @ ells)
dl = np.diff(edges)
sig_knox = np.sqrt(2.0 / ((2 * lmid + 1) * dl * fsky)) * binned_truth

if __name__ == "__main__":
    print(f"cap mask: theta = 40 deg, fsky = {fsky:.4f}")
    print(" l_mid   bandpower    truth        err(NKA)   err(Knox)  ratio")
    for i in range(len(lmid)):
        r = sig_nka[i] / sig_knox[i]
        print(f"{lmid[i]:6.0f}  {bp[i]:.4e}  {binned_truth[i]:.4e}  "
              f"{sig_nka[i]:.3e}  {sig_knox[i]:.3e}  {r:5.2f}")
    # decoupling is unbiased for the (smooth) input spectrum
    err = np.max(np.abs(bp / binned_truth - 1.0)[1:-1])
    print(f"max decoupling bias (interior bands): {err*100:.2f}%")
    assert err < 0.05
    assert np.all(np.isfinite(sig_nka)) and np.all(sig_nka > 0)
    print("OK")
