import numpy as np

from hmvec_tpu.models.cosmology import Cosmology


def test_sigma8_parameterization():
    c = Cosmology(params={"sigma8": 0.81})
    got = float(np.asarray(c.get_sigma8(np.array([0.0])))[0])
    assert abs(got - 0.81) < 1e-6


def test_s8_parameterization():
    c = Cosmology(params={"S8": 0.78})
    s8 = float(np.asarray(c.get_sigma8(np.array([0.0])))[0])
    S8 = s8 * np.sqrt(c.omm0 / 0.3)
    assert abs(S8 - 0.78) < 1e-6
