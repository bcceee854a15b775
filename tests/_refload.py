"""Import the reference's actual source (/root/reference/hmvec) for parity
tests, with the missing native engines (camb/classy) stubbed out.

The engine-free reference modules -- fft.py, tinker.py, utils.py, the free
functions in hmvec.py, Cosmology.Tk -- are pure numpy/scipy and importable
once `import camb` / `import classy` resolve to stub modules and the
scipy APIs removed since the reference was written (interp2d) are shimmed.
This breaks the twin-circularity of the accuracy story: these tests compare
against the reference's own code, not our re-reading of it.
"""

import importlib.util
import os
import sys
import types

import pytest

REF_DIR = "/root/reference/hmvec"
_PKG = "refhmvec"


def _stub_engines():
    if "camb" not in sys.modules:
        camb = types.ModuleType("camb")
        camb.model = types.ModuleType("camb.model")
        sys.modules["camb"] = camb
        sys.modules["camb.model"] = camb.model
    if "classy" not in sys.modules:
        classy = types.ModuleType("classy")
        classy.Class = type("Class", (), {})
        sys.modules["classy"] = classy
    # scipy >= 1.14 removed interp2d; the reference imports it at module
    # level (cosmology.py:3) but only calls it inside limber_integral,
    # which these parity tests never exercise.
    import scipy.interpolate as si
    if not hasattr(si, "interp2d"):
        si.interp2d = None


def load_ref(modname):
    """Import /root/reference/hmvec/<modname>.py as refhmvec.<modname>."""
    if not os.path.isdir(REF_DIR):
        pytest.skip("reference tree not available")
    _stub_engines()
    if _PKG not in sys.modules:
        pkg = types.ModuleType(_PKG)
        pkg.__path__ = [REF_DIR]
        sys.modules[_PKG] = pkg
    full = f"{_PKG}.{modname}"
    if full in sys.modules:
        return sys.modules[full]
    spec = importlib.util.spec_from_file_location(
        full, os.path.join(REF_DIR, modname + ".py"))
    mod = importlib.util.module_from_spec(spec)
    mod.__package__ = _PKG
    sys.modules[full] = mod
    spec.loader.exec_module(mod)
    return mod


def load_ref_tinker():
    """tinker.py with its data path repointed: the reference resolves
    `hmvec/../data/alpha_consistency.txt` (tinker.py:64) which is broken in
    its own layout (data lives in hmvec/data/); patch __file__ so the
    relative hop lands on the real file."""
    mod = load_ref("tinker")
    # dirname(__file__) must be an EXISTING dir whose ../data is the real
    # data dir; hmvec/data itself qualifies (hmvec/data/../data == it).
    mod.__file__ = os.path.join(REF_DIR, "data", "tinker.py")
    return mod
