"""Production-serving robustness envelope.

The serving surface (pipeline.make_batched_fn) is meant to take MCMC
proposals and emulator grids UNSUPERVISED, so the full halo-model chain
must return finite, physical outputs across the whole prior box --
phantom and quintessence dark energy, open/closed curvature, massive
neutrinos, extreme H0/ns/As -- not just at the fiducial.  One vmapped
XLA program evaluates every corner (compile once, batch the weirdness).

These are envelope tests (finiteness, positivity, sane dynamic range,
parameter-direction sanity), not accuracy oracles -- the twin-parity
suites cover accuracy at the fiducial.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from hmvec_tpu.pipeline import make_pmm_fn, make_hod_fn, make_batched_fn

ZS = np.linspace(0.1, 3.0, 4)
KS = np.geomspace(1e-3, 10.0, 64)
MS = np.geomspace(1e11, 1e15, 40)

NAMES = ("H0", "omch2", "w0", "wa", "mnu", "omk", "ns", "As")
CORNERS = np.array([
    # H0    omch2   w0     wa    mnu   omk    ns     As
    [67.5, 0.1203, -1.0,  0.0,  0.0,  0.00, 0.965, 2.2e-9],   # fiducial
    [55.0, 0.1403, -1.0,  0.0,  0.0,  0.00, 0.965, 2.2e-9],   # low H0
    [80.0, 0.1003, -1.0,  0.0,  0.0,  0.00, 0.965, 2.2e-9],   # high H0
    [67.5, 0.1203, -1.5,  0.0,  0.0,  0.00, 0.965, 2.2e-9],   # deep phantom
    [67.5, 0.1203, -0.6,  0.0,  0.0,  0.00, 0.965, 2.2e-9],   # quintessence
    [67.5, 0.1203, -1.2,  0.5,  0.0,  0.00, 0.965, 2.2e-9],   # CPL wa > 0
    [67.5, 0.1203, -0.8, -0.5,  0.0,  0.00, 0.965, 2.2e-9],   # CPL wa < 0
    [67.5, 0.1203, -1.0,  0.0,  0.6,  0.00, 0.965, 2.2e-9],   # heavy mnu
    [67.5, 0.1203, -1.0,  0.0,  0.0,  0.10, 0.965, 2.2e-9],   # open
    [67.5, 0.1203, -1.0,  0.0,  0.0, -0.05, 0.965, 2.2e-9],   # closed
    [67.5, 0.1203, -1.0,  0.0,  0.0,  0.00, 0.900, 1.6e-9],   # red tilt, low As
    [67.5, 0.1203, -1.0,  0.0,  0.0,  0.00, 1.050, 2.9e-9],   # blue tilt, high As
    [55.0, 0.1403, -1.4,  0.4,  0.5,  0.08, 0.920, 1.8e-9],   # everything at once
])


@pytest.fixture(scope="module")
def pmm_batch():
    bf = make_batched_fn(make_pmm_fn(ZS, KS, MS, jit=False, growth="auto"),
                         NAMES)
    return np.asarray(bf(jnp.asarray(CORNERS)))


def test_pmm_finite_positive_everywhere(pmm_batch):
    assert pmm_batch.shape == (CORNERS.shape[0], ZS.size, KS.size)
    assert np.all(np.isfinite(pmm_batch))
    assert np.all(pmm_batch > 0.0)


def test_pmm_sane_dynamic_range(pmm_batch):
    """P(k ~ 0.1/Mpc, z ~ 0.1) is O(1e3-1e5) Mpc^3 for anything inside
    (even generously outside) the observational prior box."""
    ik = np.argmin(np.abs(KS - 0.1))
    p01 = pmm_batch[:, 0, ik]
    assert np.all(p01 > 1e2) and np.all(p01 < 1e6)
    # high-k 1-halo tail stays below the P(0.1) peak region for every
    # cosmology (no blow-up from the profile/mass-function machinery)
    assert np.all(pmm_batch[:, 0, -1] < p01)


def test_pmm_parameter_directions(pmm_batch):
    fid = pmm_batch[0]
    # more As -> more power; less As -> less.  Compared near the pivot
    # k0 = 0.05/Mpc where the simultaneous tilt change is ~neutral (far
    # below the pivot a red tilt RAISES power, so a uniform inequality
    # over all k would be wrong physics, not a wrong code path).
    piv = slice(24, 32)
    assert np.all(pmm_batch[10, :, piv] < fid[:, piv])
    assert np.all(pmm_batch[11, :, piv] > fid[:, piv])
    # massive neutrinos suppress small scales relative to large at z=0
    ratio = pmm_batch[7, 0] / fid[0]
    assert ratio[-1] < ratio[0]
    # phantom DE (w0 = -1.5): more growth suppression at high z relative
    # to LCDM normalized today is NOT asserted (normalization choices) --
    # only that the whole z-range stays finite and ordered
    assert np.all(pmm_batch[3] > 0)


def test_hod_extreme_number_densities():
    """The ngal -> mthresh bisection must stay on-bracket for number
    densities spanning 1e-6 .. 1e-3 Mpc^-3 (LRG-sparse to ELG-dense)."""
    for ngal in (1e-6, 1e-3):
        fn = make_hod_fn(ZS, KS, MS, np.full(ZS.size, ngal), jit=True)
        pgg, pgm = fn()
        pgg, pgm = np.asarray(pgg), np.asarray(pgm)
        assert np.all(np.isfinite(pgg)) and np.all(np.isfinite(pgm))
        assert np.all(pgg > 0)
    # sparser samples live in more massive, more biased halos
    fn_lo = make_hod_fn(ZS, KS, MS, np.full(ZS.size, 1e-6), jit=True)
    fn_hi = make_hod_fn(ZS, KS, MS, np.full(ZS.size, 1e-3), jit=True)
    pgg_lo = np.asarray(fn_lo()[0])
    pgg_hi = np.asarray(fn_hi()[0])
    assert np.all(pgg_lo[:, :8] > pgg_hi[:, :8])   # large-scale bias^2
