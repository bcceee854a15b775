"""Eisenstein & Hu (1998) matter transfer functions in jnp.

Implements the zero-baryon-oscillation fit ("eisenhu") and the full
oscillatory fit ("eisenhu_osc") of EH98 (ApJ 496, 605), the same model the
reference exposes as Cosmology.Tk (hmvec/cosmology.py:404-504).  Written
from the published equations; equation numbers cited inline.

All wavenumbers enter in Mpc^-1 (no h); internally converted to h/Mpc as the
fits require.  Fully differentiable in the cosmological parameters.
"""

from __future__ import annotations

import jax.numpy as jnp

# The reference hardcodes T_CMB = 2.726 K inside Tk (cosmology.py:410) even
# though its CAMB background runs at 2.7255 K; we reproduce that split
# deliberately for parity (tests/test_reference_parity.py pins it).
T_CMB_TRANSFER_K = 2.726


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
            * jnp.log((jnp.sqrt(1.0 + r_d) + jnp.sqrt(r_eq + r_d))
                      / (1.0 + jnp.sqrt(r_eq))))    # eq (6), [Mpc/h]

    k_silk = (1.6 * w_b**0.52 * w_m**0.73
              * (1.0 + (10.4 * w_m) ** -0.95) / h)  # eq (7), [h/Mpc]

    return dict(h=h, w_m=w_m, w_b=w_b, t27_sq=t27_sq, k_eq=k_eq, z_eq=z_eq,
                z_d=z_d, r_d=r_d, r_eq=r_eq, sh_d=sh_d, k_silk=k_silk)


def transfer_eh98(bg, ks, kind: str = "eisenhu_osc"):
    """T(k) for ks in Mpc^-1 (matches reference Tk semantics)."""
    s = _eh_scales(bg)
    k = jnp.asarray(ks) / s["h"]  # fits want h/Mpc
    fb = bg.ombh2 / (bg.omch2 + bg.ombh2)
    fc = bg.omch2 / (bg.omch2 + bg.ombh2)

    if kind == "eisenhu":
        # zero-baryon shape with alpha_gamma suppression, EH98 eqs (28-31)
        alpha_gamma = (1.0 - 0.328 * jnp.log(431.0 * s["w_m"]) * s["w_b"] / s["w_m"]
                       + 0.38 * jnp.log(22.3 * s["w_m"]) * fb**2)
        gamma_eff = bg.omm0 * s["h"] * (
            alpha_gamma + (1.0 - alpha_gamma) / (1.0 + (0.43 * k * s["sh_d"]) ** 4))
        q = k * s["t27_sq"] / gamma_eff
        L = jnp.log(2.0 * jnp.e + 1.8 * q)
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
        L = jnp.log(jnp.e + 1.8 * beta * q)
        C = 14.2 / alpha + 386.0 / (1.0 + 69.9 * q**1.08)
        return L / (L + C * q * q)             # eq (19)

    f = 1.0 / (1.0 + (k * s["sh_d"] / 5.4) ** 4)     # eq (18)
    tc = f * t_tilde(k, 1.0, beta_c) + (1.0 - f) * t_tilde(k, alpha_c, beta_c)

    # --- baryon part, EH98 eqs (13-15, 21-24) ---
    y = (1.0 + s["z_eq"]) / (1.0 + s["z_d"])
    x = jnp.sqrt(1.0 + y)
    g_eh = y * (-6.0 * x + (2.0 + 3.0 * y) * jnp.log((x + 1.0) / (x - 1.0)))
    alpha_b = 2.07 * s["k_eq"] * s["sh_d"] * (1.0 + s["r_d"]) ** -0.75 * g_eh

    beta_node = 8.41 * s["w_m"] ** 0.435
    tilde_s = s["sh_d"] / (1.0 + (beta_node / (k * s["sh_d"])) ** 3) ** (1.0 / 3.0)
    beta_b = 0.5 + fb + (3.0 - 2.0 * fb) * jnp.sqrt((17.2 * s["w_m"]) ** 2 + 1.0)

    tb = (t_tilde(k, 1.0, 1.0) / (1.0 + (k * s["sh_d"] / 5.2) ** 2)
          + alpha_b / (1.0 + (beta_b / (k * s["sh_d"])) ** 3)
          * jnp.exp(-((k / s["k_silk"]) ** 1.4))) * jnp.sinc(k * tilde_s / jnp.pi)

    return fb * tb + fc * tc
