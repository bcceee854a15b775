"""Halo-model bispectra: matter, galaxy, and the projected tSZ bispectrum.

Extension beyond the reference (simonsobs/hmvec ships power spectra
only).  Shows the three halo terms, the tree-level large-scale limit,
the squeezed-vs-equilateral shape hierarchy, and the flat-sky reduced
tSZ bispectrum b(l, l, l) -- the statistic behind published tSZ
bispectrum detections (Planck 2013 XXI, Crawford et al 2014).
"""

import numpy as np

import hmvec_tpu as hm


def main():
    zs = np.linspace(0.05, 3.0, 12)
    ks = np.geomspace(1e-3, 30.0, 160)
    ms = np.geomspace(2e10, 1e16, 120)
    hcos = hm.HaloModel(zs, ks, ms=ms)
    hcos.add_battaglia_pres_profile("y", family="pres")
    hcos.add_hod("g", ngal=np.full(zs.size, 1e-4))

    # --- matter bispectrum: term decomposition at z ~ 0.5 ---
    iz = int(np.argmin(np.abs(zs - 0.5)))
    keq = np.geomspace(5e-3, 5.0, 24)
    parts = {t: np.asarray(hcos.get_bispectrum(keq, name="nfw", terms=t))[iz]
             for t in ("1h", "2h", "3h")}
    tot = parts["1h"] + parts["2h"] + parts["3h"]
    for kpick in (0.01, 0.1, 1.0):
        i = int(np.argmin(np.abs(keq - kpick)))
        fr = {t: parts[t][i] / tot[i] for t in parts}
        print("equilateral k=%.2f: B=%.3e  (1h %.0f%% / 2h %.0f%% / 3h %.0f%%)"
              % (keq[i], tot[i], 100 * fr["1h"], 100 * fr["2h"],
                 100 * fr["3h"]))

    # --- tree-level limit on large scales ---
    k = np.array([5e-3])
    P = np.interp(np.log(k), np.log(ks), np.asarray(hcos.Pzk)[iz])
    btree = float(hm.tree_bispectrum(P, P, P, k, k, k)[0])
    btot = float(np.asarray(hcos.get_bispectrum(k, name="nfw"))[iz, 0])
    print("tree-level limit at k=5e-3: B_hm/B_tree = %.3f" % (btot / btree))

    # --- squeezed vs equilateral shape at fixed short mode ---
    ksh = np.array([0.5])
    beq = float(np.asarray(hcos.get_bispectrum(ksh, name="nfw"))[iz, 0])
    bsq = float(np.asarray(hcos.get_bispectrum(
        np.array([0.01]), ksh, ksh, name="nfw"))[iz, 0])
    print("squeezed(0.01,0.5,0.5)/equilateral(0.5): %.2f" % (bsq / beq))

    # --- galaxy bispectrum with quadratic bias ---
    bg = float(np.asarray(hcos.get_bispectrum(
        np.array([0.05]), name="g", terms="3h", include_b2=True))[iz, 0])
    bg1 = float(np.asarray(hcos.get_bispectrum(
        np.array([0.05]), name="g", terms="3h"))[iz, 0])
    print("galaxy B_3h at k=0.05: b2 term contributes %+.1f%%"
          % (100 * (bg / bg1 - 1.0)))

    # --- projected tSZ reduced bispectrum ---
    ells = np.geomspace(100, 3000, 8)
    by = np.asarray(hcos.get_angular_bispectrum(ells, name="y"))
    for ell, b in zip(ells, by):
        print("tSZ b(l,l,l) at l=%4d: %.3e" % (int(ell), b))
    assert np.all(by > 0)
    print("OK")


if __name__ == "__main__":
    main()
