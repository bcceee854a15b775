"""A schema-faithful stub of the `camb` module for exercising
tools/gen_camb_table.py's REAL writer path in this CAMB-less environment.

The numbers are synthetic (the twin's analytic EH power; smooth toy CMB
shapes) but every object/attribute/shape the tool touches matches the CAMB
API it was written against, so the .npz it emits is schema-exact: the
committed fixture tests/fixtures/camb_table_fixture.npz is produced by
running the unmodified tool against this stub (regenerate with
`python tests/_camb_stub.py`).
"""

import sys
import types

import numpy as np


def _toy_cls(lmax):
    """Smooth positive TT/EE/BB/TE shapes in muK^2, raw_cl, rows 0..lmax."""
    ell = np.arange(lmax + 1, dtype=np.float64)
    elln = np.maximum(ell, 1.0)
    dl_tt = 5e3 * np.exp(-((np.log(elln / 220.0)) ** 2) / 2.0) + 1.0
    cl_tt = 2 * np.pi * dl_tt / (elln * (elln + 1.0))
    cl_ee = 0.03 * cl_tt
    cl_bb = 1e-4 * cl_tt
    cl_te = 0.3 * np.sqrt(cl_tt * cl_ee)
    cls = np.column_stack([cl_tt, cl_ee, cl_bb, cl_te])
    cls[:2] = 0.0
    return cls


def make_stub_camb():
    """Build a `camb` module object backed by the numpy twin."""
    from hmvec_tpu.twin.core import TwinCosmology

    camb = types.ModuleType("camb")

    class _Pars:
        def __init__(self, cosmo):
            self.cosmo = cosmo
            self.WantTransfer = False
            self.lmax = None

        def set_for_lmax(self, lmax, lens_potential_accuracy=None):
            self.lmax = lmax

    class _PK:
        def __init__(self, tc, nonlinear):
            self.tc = tc
            self.nonlinear = nonlinear

        def P(self, zs, ks, grid=True):
            assert grid
            p = self.tc.plin(np.asarray(zs), np.asarray(ks))
            if self.nonlinear:
                # synthetic smooth boost (schema test only, not physics)
                k = np.asarray(ks)[None, :]
                p = p * (1.0 + (k / 0.3) ** 1.5 / (1.0 + (k / 3.0) ** 1.5))
            return p

    class _Results:
        def __init__(self, pars):
            self.pars = pars

        def get_cmb_power_spectra(self, pars, CMB_unit=None, raw_cl=False):
            assert raw_cl and CMB_unit == "muK"
            n = (pars.lmax or 2500) + 1
            total = _toy_cls(n - 1)
            return {"total": total, "unlensed_scalar": 0.98 * total}

        def get_lens_potential_cls(self, lmax=None):
            ell = np.arange(lmax + 1, dtype=np.float64)
            elln = np.maximum(ell, 1.0)
            # CAMB deflection convention [L(L+1)]^2 C_phiphi / 2 pi
            cpp = 1e-7 * np.exp(-((np.log(elln / 60.0)) ** 2) / 3.0)
            out = np.column_stack([cpp, 0.1 * cpp, np.zeros_like(cpp)])
            out[:2] = 0.0
            return out

    def set_params(H0=67.3, ombh2=0.02225, omch2=0.1198, ns=0.9645,
                   As=2.2e-9, mnu=0.0, tau=0.06, **kw):
        tc = TwinCosmology({"H0": H0, "ombh2": ombh2, "omch2": omch2,
                            "ns": ns, "As": As, "mnu": mnu})
        return _Pars(tc)

    def get_matter_power_interpolator(pars, nonlinear=False, **kw):
        return _PK(pars.cosmo, nonlinear)

    camb.set_params = set_params
    camb.get_matter_power_interpolator = get_matter_power_interpolator
    camb.get_results = _Results
    return camb


FIXTURE_KW = dict(zmax=4.0, nz=16, kmax=150.0, nk=256, lmax=600)


def generate_fixture(out):
    """Run the UNMODIFIED tool writer against the stub."""
    had = sys.modules.get("camb")
    sys.modules["camb"] = make_stub_camb()
    try:
        sys.path.insert(0, "/root/repo/tools")
        import gen_camb_table
        gen_camb_table.main(out=out, **FIXTURE_KW)
    finally:
        sys.path.remove("/root/repo/tools")
        if had is None:
            del sys.modules["camb"]
        else:
            sys.modules["camb"] = had


if __name__ == "__main__":
    import os
    here = os.path.dirname(os.path.abspath(__file__))
    os.makedirs(os.path.join(here, "fixtures"), exist_ok=True)
    generate_fixture(os.path.join(here, "fixtures",
                                  "camb_table_fixture.npz"))
