"""f32 sampling + mixed32 DFT fast path vs the exact f64 transform.

On TPU generic_profile_fft defaults to f32 profile sampling with the
2-matmul double-single DFT; tests force that path on CPU and check it
stays well inside the 1e-5 twin-parity budget.
"""

import numpy as np
import jax.numpy as jnp

from hmvec_tpu.ops.sine_transform import generic_profile_fft, sine_dft
from hmvec_tpu.models import profiles as prof


def _setup():
    nz, nm = 4, 12
    zs = np.linspace(0.2, 2.0, nz)
    ms = np.geomspace(1e12, 1e15, nm)
    ks = np.geomspace(1e-3, 80, 160)
    rng = np.random.default_rng(5)
    cs = jnp.asarray(rng.uniform(3.0, 12.0, (nz, nm)))
    rss = jnp.asarray(rng.uniform(0.05, 1.5, (nz, nm)))
    return zs, ks, cs, rss


def test_mixed32_dft_close_to_exact():
    rng = np.random.default_rng(6)
    y = jnp.asarray(rng.standard_normal((3, 7, 1024)))
    exact = np.asarray(sine_dft(y, 0.01, method="fft"))
    m32 = np.asarray(sine_dft(y.astype(jnp.float32), 0.01, method="mixed32"))
    peak = np.abs(exact).max()
    assert np.abs(m32 - exact).max() / peak < 2e-6


def test_f32_sampling_profile_transform():
    zs, ks, cs, rss = _setup()

    def rhofunc(xs):
        return prof.rho_nfw_x(xs, rhoscale=1.0)[None, None, :]

    _, uk64 = generic_profile_fft(rhofunc, cs, rss, zs, ks, 200.0, 4096,
                                  sample_dtype=jnp.float64)
    _, uk32 = generic_profile_fft(rhofunc, cs, rss, zs, ks, 200.0, 4096,
                                  sample_dtype=jnp.float32,
                                  method="mixed32")
    diff = np.abs(np.asarray(uk32) - np.asarray(uk64))
    # u is normalized to ~1 at low k; the fast path must stay well under
    # the 1e-5 parity gate
    assert diff.max() < 2e-6


def test_f32_sampling_battaglia_density():
    zs, ks, cs, rss = _setup()
    nz, nm = cs.shape
    rng = np.random.default_rng(7)
    m200 = jnp.asarray(rng.uniform(1e12, 1e15, (nz, nm)))
    rhocritz = jnp.asarray(np.full(nz, 1.3e11))
    from hmvec_tpu.params import battaglia_defaults
    fit = dict(battaglia_defaults["AGN"])

    def rhofunc(xs):
        return prof.rho_gas_x(xs[None, None, :], m200[..., None],
                              jnp.asarray(zs)[:, None, None], 0.049, 0.31,
                              rhocritz[:, None, None], -0.2, fit)

    _, uk64 = generic_profile_fft(rhofunc, cs, rss, zs, ks, 20.0, 2048,
                                  sample_dtype=jnp.float64)
    _, uk32 = generic_profile_fft(rhofunc, cs, rss, zs, ks, 20.0, 2048,
                                  sample_dtype=jnp.float32,
                                  method="mixed32")
    assert np.abs(np.asarray(uk32) - np.asarray(uk64)).max() < 2e-6
    # f32 path really produced f32 samples (dtype plumbing works)
    r32 = rhofunc(jnp.asarray(np.linspace(0.01, 20, 16), jnp.float32))
    assert r32.dtype == jnp.float32


def test_intrinsic_free_poly_kernels():
    """The f32 split-exponential path must not regress: this TPU's XLA f32
    log/log1p intrinsics err ~3e-4 (DEVNOTES), so the polynomial kernels
    carry the accuracy of the whole f32 Battaglia sampling stage."""
    from hmvec_tpu.models.profiles import (_exp2_poly_f32, _log1p_poly_f32,
                                           _exp_split_f32)
    f = jnp.asarray(np.linspace(-0.5, 0.5, 20001), jnp.float32)
    got = np.asarray(_exp2_poly_f32(f), np.float64)
    ref = np.exp2(np.asarray(f, np.float64))
    assert np.max(np.abs(got - ref) / ref) < 3e-7

    u = jnp.asarray(np.linspace(0.0, 1.0, 20001), jnp.float32)
    gl = np.asarray(_log1p_poly_f32(u), np.float64)
    rl = np.log1p(np.asarray(u, np.float64))
    assert np.max(np.abs(gl - rl)) < 5e-7

    a = jnp.asarray(np.linspace(-85.0, 3.0, 20001))
    es = np.asarray(_exp_split_f32(a), np.float64)
    er = np.exp(np.asarray(a))
    assert np.max(np.abs(es - er) / er) < 3e-7


def test_scaled_mixed32_dft_matches_normalized_chain():
    """The step/kt-folded sine matrix (round-3 config-2 path,
    _sine_dft_mixed32_scaled) equals sine_dft(y, step)/kt to the mixed32
    accuracy class, with column 0 zeroed."""
    import jax.numpy as jnp
    from hmvec_tpu.ops.sine_transform import (sine_dft,
                                              _sine_dft_mixed32_scaled)

    rng = np.random.default_rng(3)
    n = 512
    y = (rng.random((6, n)) * np.exp(-np.linspace(0, 5, n))[None, :]
         ).astype(np.float32)
    step = 20.0 / n
    dkt = 2 * np.pi / (n * step)
    ref = np.asarray(sine_dft(jnp.asarray(y, dtype=jnp.float64), step,
                              method="matmul"))
    kts = np.arange(n // 2 + 1) * dkt
    ref_over = ref / np.where(kts == 0, 1.0, kts)
    got = np.asarray(_sine_dft_mixed32_scaled(jnp.asarray(y), step))
    assert np.all(got[:, 0] == 0.0)
    peak = np.abs(ref_over).max(axis=-1, keepdims=True)
    assert (np.abs(got[:, 1:] - ref_over[:, 1:]) / peak).max() < 2e-6


def test_deferred_mass_norm_commutes_with_resample():
    """1/mnorm is a per-(z,m) scalar: applying it after the kt-axis lerp
    (the round-3 fast path) is exact up to f64 rounding."""
    import jax.numpy as jnp
    from hmvec_tpu.ops.sine_transform import resample_uniform_source

    rng = np.random.default_rng(5)
    u = jnp.asarray(rng.random((3, 4, 129)))
    mnorm = jnp.asarray(1.0 + rng.random((3, 4)))
    scales = jnp.asarray(0.5 + rng.random((3, 4)))
    ks = jnp.asarray(np.geomspace(1e-2, 40.0, 50))
    a = resample_uniform_source(u / mnorm[..., None], 0.3, scales, ks,
                                method="gather")
    b = resample_uniform_source(u, 0.3, scales, ks, method="gather") \
        * (1.0 / mnorm)[..., None]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-15)
