"""Eisenstein & Hu (1998) matter transfer functions in jnp.

Implements the zero-baryon-oscillation fit ("eisenhu") and the full
oscillatory fit ("eisenhu_osc") of EH98 (ApJ 496, 605), the same model the
reference exposes as Cosmology.Tk (hmvec/cosmology.py:404-504).  Written
from the published equations; equation numbers cited inline.

All wavenumbers enter in Mpc^-1 (no h); internally converted to h/Mpc as the
fits require.  Fully differentiable in the cosmological parameters.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# The reference hardcodes T_CMB = 2.726 K inside Tk (cosmology.py:410) even
# though its CAMB background runs at 2.7255 K; we reproduce that split
# deliberately for parity (tests/test_reference_parity.py pins it).
T_CMB_TRANSFER_K = 2.726

_LN2_F32 = np.float32(0.6931471805599453)
_SQRT2_F32 = np.float32(1.4142135623730951)


def _log_f32(y32):
    """ln(y) for y > 0 in f32 WITHOUT the log intrinsic.

    This TPU's XLA f32 log is only ~2.6e-4 relative even on [1, 100]
    (measured on-chip; the same finding profiles._exp2_poly_f32
    documents), and L = ln(e + 1.8 beta q) enters the EH98 transfer
    LINEARLY -- the round-5 f32 serving path failed its 1e-5 twin gate
    at exactly that error.  Exponent extraction + the atanh-series
    log1p polynomial (mul/add only, correctly rounded on the VPU)
    restores ~1e-7."""
    bits = jax.lax.bitcast_convert_type(y32, jnp.int32)
    n = (bits >> 23) - 127
    m = jax.lax.bitcast_convert_type(
        (bits & ((1 << 23) - 1)) | (127 << 23), jnp.float32)  # [1, 2)
    big = m > _SQRT2_F32
    m = jnp.where(big, m * np.float32(0.5), m)
    n = n + big.astype(jnp.int32)
    # ln(m) = 2 atanh(u/(2+u)), u = m-1 in [-0.3, 0.42]
    u = m - 1.0
    w = u / (2.0 + u)
    w2 = w * w
    acc = jnp.full_like(w, np.float32(1.0 / 13.0))
    for ck in (1.0 / 11.0, 1.0 / 9.0, 1.0 / 7.0, 1.0 / 5.0,
               1.0 / 3.0, 1.0):
        acc = acc * w2 + np.float32(ck)
    return n.astype(jnp.float32) * _LN2_F32 + 2.0 * w * acc


def _ln(x):
    """jnp.log, with the f32 intrinsic replaced by the polynomial kernel
    (f64 paths are untouched -- bit-identical to jnp.log)."""
    x = jnp.asarray(x)
    if x.dtype == jnp.float32:
        return _log_f32(x)
    return jnp.log(x)


def _eh_scales(bg):
    """Shared EH98 background scales. Returns dict of scalars."""
    h = bg.H0 / 100.0
    w_m = bg.omch2 + bg.ombh2
    w_b = bg.ombh2
    t27 = T_CMB_TRANSFER_K / 2.7
    t27_sq = t27 * t27

    k_eq = 7.46e-2 * w_m / t27_sq / h          # EH98 eq (3), [h/Mpc]
    z_eq = 2.50e4 * w_m / t27_sq**2            # eq (2)

    b1 = 0.313 * w_m**-0.419 * (1.0 + 0.607 * w_m**0.674)
    b2 = 0.238 * w_m**0.223
    z_d = (1291.0 * w_m**0.251 / (1.0 + 0.659 * w_m**0.828)
           * (1.0 + b1 * w_b**b2))             # eq (4)

    r_d = 31.5 * w_b / t27_sq**2 * (1.0e3 / z_d)    # eq (5)
    r_eq = 31.5 * w_b / t27_sq**2 * (1.0e3 / z_eq)  # eq (5)

    sh_d = (2.0 / (3.0 * k_eq) * jnp.sqrt(6.0 / r_eq)
            * _ln((jnp.sqrt(1.0 + r_d) + jnp.sqrt(r_eq + r_d))
                      / (1.0 + jnp.sqrt(r_eq))))    # eq (6), [Mpc/h]

    k_silk = (1.6 * w_b**0.52 * w_m**0.73
              * (1.0 + (10.4 * w_m) ** -0.95) / h)  # eq (7), [h/Mpc]

    return dict(h=h, w_m=w_m, w_b=w_b, t27_sq=t27_sq, k_eq=k_eq, z_eq=z_eq,
                z_d=z_d, r_d=r_d, r_eq=r_eq, sh_d=sh_d, k_silk=k_silk)


def transfer_eh98(bg, ks, kind: str = "eisenhu_osc", compute_dtype=None):
    """T(k) for ks in Mpc^-1 (matches reference Tk semantics).

    compute_dtype=jnp.float32: serving-tier fast path -- the whole chain
    (scalar fits and the ~20-transcendental per-element body) runs in
    f32 instead of TPU-emulated f64 (~10-20x cheaper transcendentals).
    Accuracy ~1e-6-class on T: the only large-argument hazard is the
    BAO sinc phase (k s_d up to ~1.6e4 rad, f32 ulp there ~1e-3 rad),
    but where the phase is large the baryon term is Silk-damped to
    irrelevance -- in the BAO band (phase <~ 60 rad) the f32 phase
    error is ~5e-6 rad and enters T at <1e-8 (measured in
    tests/test_fast_sampling.py)."""
    if compute_dtype is not None:
        bgc = jax.tree_util.tree_map(
            lambda v: jnp.asarray(v).astype(compute_dtype), bg)
        return transfer_eh98(bgc, jnp.asarray(ks).astype(compute_dtype),
                             kind)
    s = _eh_scales(bg)
    k = jnp.asarray(ks) / s["h"]  # fits want h/Mpc
    fb = bg.ombh2 / (bg.omch2 + bg.ombh2)
    fc = bg.omch2 / (bg.omch2 + bg.ombh2)

    if kind == "eisenhu":
        # zero-baryon shape with alpha_gamma suppression, EH98 eqs (28-31)
        alpha_gamma = (1.0 - 0.328 * _ln(431.0 * s["w_m"]) * s["w_b"] / s["w_m"]
                       + 0.38 * _ln(22.3 * s["w_m"]) * fb**2)
        gamma_eff = bg.omm0 * s["h"] * (
            alpha_gamma + (1.0 - alpha_gamma) / (1.0 + (0.43 * k * s["sh_d"]) ** 4))
        q = k * s["t27_sq"] / gamma_eff
        L = _ln(2.0 * jnp.e + 1.8 * q)
        C = 14.2 + 731.0 / (1.0 + 62.5 * q)
        return L / (L + C * q * q)

    if kind != "eisenhu_osc":
        raise ValueError(kind)

    # --- CDM part, EH98 eqs (9-12, 17-20) ---
    a1 = (46.9 * s["w_m"]) ** 0.670 * (1.0 + (32.1 * s["w_m"]) ** -0.532)
    a2 = (12.0 * s["w_m"]) ** 0.424 * (1.0 + (45.0 * s["w_m"]) ** -0.582)
    alpha_c = a1**-fb * a2 ** (-(fb**3))
    b1 = 0.944 / (1.0 + (458.0 * s["w_m"]) ** -0.708)
    b2 = (0.395 * s["w_m"]) ** -0.0266
    beta_c = 1.0 / (1.0 + b1 * (fc**b2 - 1.0))

    def t_tilde(k1, alpha, beta):
        q = k1 / (13.41 * s["k_eq"])           # eq (10)
        L = _ln(jnp.e + 1.8 * beta * q)
        C = 14.2 / alpha + 386.0 / (1.0 + 69.9 * q**1.08)
        return L / (L + C * q * q)             # eq (19)

    f = 1.0 / (1.0 + (k * s["sh_d"] / 5.4) ** 4)     # eq (18)
    tc = f * t_tilde(k, 1.0, beta_c) + (1.0 - f) * t_tilde(k, alpha_c, beta_c)

    # --- baryon part, EH98 eqs (13-15, 21-24) ---
    y = (1.0 + s["z_eq"]) / (1.0 + s["z_d"])
    x = jnp.sqrt(1.0 + y)
    g_eh = y * (-6.0 * x + (2.0 + 3.0 * y) * _ln((x + 1.0) / (x - 1.0)))
    alpha_b = 2.07 * s["k_eq"] * s["sh_d"] * (1.0 + s["r_d"]) ** -0.75 * g_eh

    beta_node = 8.41 * s["w_m"] ** 0.435
    tilde_s = s["sh_d"] / (1.0 + (beta_node / (k * s["sh_d"])) ** 3) ** (1.0 / 3.0)
    beta_b = 0.5 + fb + (3.0 - 2.0 * fb) * jnp.sqrt((17.2 * s["w_m"]) ** 2 + 1.0)

    tb = (t_tilde(k, 1.0, 1.0) / (1.0 + (k * s["sh_d"] / 5.2) ** 2)
          + alpha_b / (1.0 + (beta_b / (k * s["sh_d"])) ** 3)
          * jnp.exp(-((k / s["k_silk"]) ** 1.4))) * _sinc(k * tilde_s)

    return fb * tb + fc * tc


def _sinc(x):
    """sin(x)/x with TPU-f32-safe argument reduction.

    XLA:TPU's f32 sin mis-reduces large arguments (measured 5e-2
    relative at |x| ~ 1e3 on-chip, exactly where the BAO phase k s_d
    lives), so in the f32 fast path the phase is reduced mod 2pi in f64
    first (multiplies only -- cheap even as emulated f64) and the sin
    evaluated in f32 on the reduced argument.  The f32 PRODUCT k*s is
    precise enough (~2e-6 rad in the BAO band; beyond it the baryon
    term is Silk-damped), only the in-op reduction was broken."""
    x = jnp.asarray(x)
    if x.dtype == jnp.float32 and jax.config.jax_enable_x64:
        x64 = x.astype(jnp.float64)
        red = x64 - (2.0 * jnp.pi) * jnp.round(x64 / (2.0 * jnp.pi))
        s = jnp.sin(red.astype(jnp.float32))
        return jnp.where(jnp.abs(x) < 1e-4,
                         1.0 - x * x / 6.0, s / x)
    return jnp.sinc(x / jnp.pi)


# ---------------------------------------------------------------------------
# Massive neutrinos: Eisenstein & Hu (1999) free-streaming suppression
# ---------------------------------------------------------------------------
#
# The reference gets massive-neutrino physics by passing mnu to CAMB
# (hmvec/cosmology.py:167); its own engine-free Tk tiers ignore mnu in the
# transfer shape.  Here the engine-free linear power applies the EH99
# (ApJ 511, 5; astro-ph/9710252) suppression as a RATIO on top of the EH98
# oscillatory spectrum:
#
#   P_mnu(k, z) = [T99(f_nu, k, z) / T99(f_nu = 0, k, z)]^2 * P_EH98(k, z)
#
# where T99 = T_master(k) * D_cbnu(k, z) / D1(z) is the EH99 total-matter
# transfer (master shape fit x scale-dependent growth).  The ratio -> 1 as
# f_nu -> 0 (BAO wiggles are kept from EH98; EH99's master fit is
# wiggle-free) and captures the ~ -8 f_nu small-scale suppression and its
# redshift dependence.  Equation numbers from the published paper cited
# inline.


def _eh99_tsup(w_m, t27_sq, k, s_mpc, alpha_nu, beta_c):
    """Suppressed master shape T_sup(k), EH99 eqs (16-20)."""
    sqa = jnp.sqrt(alpha_nu)
    gamma_eff = w_m * (sqa + (1.0 - sqa)
                       / (1.0 + (0.43 * k * s_mpc) ** 4))      # eq (16)
    q_eff = k * t27_sq / gamma_eff                             # eq (17)
    L = _ln(jnp.e + 1.84 * beta_c * sqa * q_eff)           # eq (19)
    C = 14.4 + 325.0 / (1.0 + 60.5 * q_eff**1.11)              # eq (20)
    return L / (L + C * q_eff**2)                              # eq (18)


def eh99_neutrino_ratio(bg, ks, d_anorm, component: str = "total"):
    """(nz, nk) ratio R with P_mnu = R^2 * P_EH98.

    component: 'total' (cb+nu matter, EH99 eq 13) or 'cb' (cold
    CDM+baryon spectrum, eq 12) -- the cb spectrum is what halo-model
    sigma/nu should be built from when m_nu > 0 (neutrinos are too hot
    to cluster in halos; Mead 2016 sec. 4).

    ``d_anorm``: (nz,) growth normalized to D -> a in matter domination
    (background.d_growth(..., norm='anorm'); EH99's D1 is (1+z_eq) times
    this -- we use the package's exact growth instead of the paper's
    Carroll-Press-Turner fit, consistently in numerator and denominator).

    Grad-safe at f_nu = 0: singular f_nu powers are evaluated at a clamped
    f_nu and the result is gated to exactly 1.0 below f_nu = 1e-7, so the
    mnu = 0 limit is bit-exact P_EH98 (and d/dmnu at exactly 0 is 0 --
    the EH99 fit has an f_nu^0.64 cusp there; differentiate at a nonzero
    fiducial).
    """
    h = bg.H0 / 100.0
    t27 = T_CMB_TRANSFER_K / 2.7
    t27_sq = t27 * t27
    w_b = bg.ombh2
    w_nu = bg.omnu0 * h**2
    w_m = bg.omch2 + w_b + w_nu
    f_nu = w_nu / w_m
    f_b = w_b / w_m
    f_c = 1.0 - f_nu - f_b
    f_cb = f_c + f_b
    nnu_m = bg.nnu_m
    f_nu_s = jnp.maximum(f_nu, 1e-8)

    k = jnp.asarray(ks)                                        # Mpc^-1; EH99
    # works in Mpc^-1 directly (theta^2/Gamma carries the h's)

    z_eq = 2.50e4 * w_m / t27_sq**2                            # eq (1)
    b1 = 0.313 * w_m**-0.419 * (1.0 + 0.607 * w_m**0.674)
    b2 = 0.238 * w_m**0.223
    z_d = (1291.0 * w_m**0.251 / (1.0 + 0.659 * w_m**0.828)
           * (1.0 + b1 * w_b**b2))                             # eq (2)
    y_d = (1.0 + z_eq) / (1.0 + z_d)                           # eq (3)
    s_mpc = (44.5 * _ln(9.83 / w_m)
             / jnp.sqrt(1.0 + 10.0 * w_b**0.75))               # eq (4)
    q = k * t27_sq / w_m                                       # eq (5)

    def p_of(f):
        return 0.25 * (5.0 - jnp.sqrt(1.0 + 24.0 * f))         # eq (11)

    def alpha_of(p_c, p_cb, fr):
        # eq (15); fr = f_c / f_cb
        return (fr * (5.0 - 2.0 * (p_c + p_cb)) / (5.0 - 4.0 * p_cb)
                * (1.0 + y_d) ** (p_cb - p_c)
                * (1.0 + 0.5 * (p_c - p_cb)
                   * (1.0 + 1.0 / ((3.0 - 4.0 * p_c) * (7.0 - 4.0 * p_cb)))
                   / (1.0 + y_d)))

    d1 = (1.0 + z_eq) * jnp.asarray(d_anorm)                   # EH99 D1, (nz,)

    # ---- numerator: f_nu > 0 ----
    p_c = p_of(f_c)
    p_cb = p_of(f_cb)
    alpha_nu = alpha_of(p_c, p_cb, f_c / f_cb)
    beta_c = 1.0 / (1.0 - 0.949 * (f_nu + f_b))                # eq (21)
    tsup = _eh99_tsup(w_m, t27_sq, k, s_mpc, alpha_nu, beta_c)
    q_nu = 3.92 * q * jnp.sqrt(nnu_m) / f_nu_s                 # eq (23)
    Bk = 1.0 + (1.24 * f_nu_s**0.64 * nnu_m ** (0.3 + 0.6 * f_nu)
                / (q_nu**-1.6 + q_nu**0.8))                    # eq (22)
    y_fs = (17.2 * f_nu * (1.0 + 0.488 * f_nu_s ** (-7.0 / 6.0))
            * (nnu_m * q / f_nu_s) ** 2)                       # eq (14)
    dfs = (d1[:, None] / (1.0 + y_fs[None, :])) ** 0.7
    p_cb_s = jnp.maximum(p_cb, 1e-9)
    if component == "cb":
        d_cbnu = ((1.0 + dfs) ** (p_cb / 0.7)
                  * d1[:, None] ** (1.0 - p_cb))               # eq (12)
    elif component == "total":
        d_cbnu = ((f_cb ** (0.7 / p_cb_s) + dfs) ** (p_cb / 0.7)
                  * d1[:, None] ** (1.0 - p_cb))               # eq (13)
    else:
        raise ValueError(component)

    # ---- denominator: same w_m with f_nu = 0 (f_cb0 = 1, p_cb0 = 0,
    # B0 = 1, D_cbnu0 = D1) ----
    f_c0 = 1.0 - f_b    # omega_nu folded back into the CDM
    p_c0 = p_of(f_c0)
    alpha_nu0 = alpha_of(p_c0, 0.0, f_c0)
    beta_c0 = 1.0 / (1.0 - 0.949 * f_b)
    tsup0 = _eh99_tsup(w_m, t27_sq, k, s_mpc, alpha_nu0, beta_c0)

    ratio = (tsup * Bk)[None, :] / tsup0[None, :] * (d_cbnu / d1[:, None])
    return jnp.where(f_nu > 1e-7, ratio, 1.0)
