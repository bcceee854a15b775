"""Mean pairwise kSZ forecast for a DESI-like galaxy sample.

Chain: Battaglia electron profile -> aperture optical depth tau_bar(z,m)
(one radial quadrature per halo) -> HOD-weighted sample tau -> bias-
weighted linear pairwise velocity v12(r) -> T_pkSZ(r) and pair-count
SNR for a CMB map with per-object aperture noise.  The reference
(simonsobs/hmvec) only covers the velocity-reconstruction route
(ksz.py); this is the complementary real-space statistic.
"""

import numpy as np

from hmvec_tpu.models.halo_model import HaloModel
from hmvec_tpu.models import pairwise as pw

zs = np.linspace(0.3, 0.9, 4)
ms = np.geomspace(1e12, 5e15, 60)
ks = np.geomspace(1e-3, 20.0, 128)

hm = HaloModel(zs, ks, ms=ms)
hm.add_battaglia_profile("e", family="AGN", nxs=2000, xmax=15)
hm.add_hod("g", ngal=np.full(zs.size, 3e-4))

# per-halo aperture optical depth in a 1.2' aperture, HOD-weighted
tau_zm = hm.get_tau_aperture(theta_arcmin=1.2)
tau_g = hm.get_tau_mean_hod("g", tau_zm)
for i, z in enumerate(zs):
    print(f"z={z:.2f}: tau_bar(gal) = {float(tau_g[i]):.3e}, "
          f"bg = {float(hm.hods['g']['bg'][i]):.2f}")

# signal + SNR at the central slice for a 1 Gpc^3, sigma=10 muK survey
edges = np.linspace(20.0, 150.0, 14)
out = pw.get_pairwise_ksz_snr(hm, 1, ngal_mpc3=3e-4, volume_gpc3=1.0,
                              sigma_meas_uK=10.0, r_edges=edges,
                              theta_arcmin=1.2)
rc = np.asarray(out["r_centers"])
T = np.asarray(out["T_bins"])
sig = np.asarray(out["sigma_bins"])
print("\n   r [Mpc]   T_pkSZ [muK]   sigma [muK]")
for r, t, s in zip(rc, T, sig):
    print(f"   {r:7.1f}   {t:12.4f}   {s:11.4f}")
print(f"\ntotal pairwise-kSZ SNR (z={zs[1]:.2f} slice): "
      f"{float(out['snr']):.1f}")

# mean Compton-y monopole of the same halo population (FIRAS bound 1.5e-5)
ybar = float(hm.get_mean_compton_y())
print(f"\nmean Compton-y monopole <y> = {ybar:.2e} "
      f"(z in [{zs[0]}, {zs[-1]}], M in [{ms[0]:.0e}, {ms[-1]:.0e}])")
