import numpy as np

from hmvec_tpu.models.cosmology import Cosmology
from hmvec_tpu.models.distances_ext import theta_star_approx


def test_theta100_roundtrip():
    c0 = Cosmology()
    th = float(theta_star_approx(c0.bg))
    c = Cosmology(params={"theta100": th})
    assert abs(c.p["H0"] - 67.3) < 1e-6
    assert abs(float(theta_star_approx(c.bg)) - th) < 1e-12


def test_theta100_monotone_in_h0():
    th_lo = float(theta_star_approx(Cosmology(params={"H0": 60.0}).bg))
    th_hi = float(theta_star_approx(Cosmology(params={"H0": 75.0}).bg))
    assert th_hi > th_lo
