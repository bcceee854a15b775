"""fNL scale-dependent bias threaded through the 2-halo term.

Oracles: the explicit-loop twin (independent leg construction), the closed
low-k form P_gg -> (bg + 2 fnl dc (bg-1)/alpha)^2 P_lin, and exact no-op at
fnl=0.
"""

import numpy as np
import pytest

from hmvec_tpu.models.halo_model import HaloModel
from hmvec_tpu.twin.halo_ext import TwinHaloModelExt

ZS = np.linspace(0.3, 1.2, 3)       # canonical nz=3
MS = np.geomspace(2e10, 1e16, 80)   # canonical nm=80
KS = np.geomspace(1e-4, 2.0, 64)
NGAL = np.full(ZS.size, 2e-4)
FNL = 50.0


@pytest.fixture(scope="module")
def pair():
    hm = HaloModel(ZS, KS, ms=MS)
    hm.add_hod("g", ngal=NGAL)
    tw = TwinHaloModelExt(ZS, KS, MS)
    tw.add_hod("g", ngal=NGAL)
    return hm, tw


def test_fnl_zero_is_noop(pair):
    hm, _ = pair
    base = np.asarray(hm.get_power_2halo("g"))
    zero = np.asarray(hm.get_power_2halo("g", fnl=0.0))
    np.testing.assert_allclose(zero, base, rtol=1e-12)


def test_fnl_matches_twin(pair):
    hm, tw = pair
    for names in [("g", None), ("g", "nfw"), ("nfw", None)]:
        pj = np.asarray(hm.get_power_2halo(names[0], names[1], fnl=FNL))
        pt = tw.get_power_2halo(names[0], names[1], fnl=FNL)
        np.testing.assert_allclose(pj, pt, rtol=1e-6, err_msg=str(names))


def test_fnl_lowk_closed_form(pair):
    """At the lowest k the HOD leg must approach the linear-bias form
    bg + 2 fnl dc (bg - 1)/alpha (consistency completion makes the leg
    exactly bg-like at k -> 0)."""
    hm, _ = pair
    base = np.asarray(hm.get_power_2halo("g"))
    wfnl = np.asarray(hm.get_power_2halo("g", fnl=FNL))
    bg = np.asarray(hm._tracer("g").bg)
    alpha = np.asarray(hm.alpha_fnl(hm.zs, hm.ks))
    bfnl = bg[:, None] + 2.0 * FNL * 1.42 * (bg[:, None] - 1.0) / alpha
    expected_ratio = (bfnl / bg[:, None]) ** 2
    np.testing.assert_allclose(wfnl[:, 0] / base[:, 0],
                               expected_ratio[:, 0], rtol=2e-3)


def test_fnl_matter_unchanged_at_lowk(pair):
    """Matter 2-halo picks up no low-k fNL correction: the (b-1) leg
    completes to exactly zero (bias consistency minus mass conservation)."""
    hm, _ = pair
    base = np.asarray(hm.get_power_2halo("nfw"))
    wfnl = np.asarray(hm.get_power_2halo("nfw", fnl=FNL))
    np.testing.assert_allclose(wfnl[:, 0], base[:, 0], rtol=1e-4)
    # while the galaxy spectrum IS strongly boosted at the same k
    bgg = np.asarray(hm.get_power_2halo("g"))
    wgg = np.asarray(hm.get_power_2halo("g", fnl=FNL))
    assert np.all(wgg[:, 0] / bgg[:, 0] > 1.5)


def test_fnl_total_and_signature(pair):
    hm, tw = pair
    pj = np.asarray(hm.get_power("g", fnl=FNL))
    pt = (tw.get_power_1halo("g") + tw.get_power_2halo("g", fnl=FNL))
    np.testing.assert_allclose(pj, pt, rtol=1e-6)
