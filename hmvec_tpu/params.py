"""Parameter registry.

Mirrors the semantics of the reference registry (hmvec/params.py:40-113 and
hmvec/params.py:2-37): a flat dict of defaults merged with user overrides at
construction time (reference: cosmology.py:60-62).  Values are the published
fit parameters (Sheth-Tormen, Duffy et al. 2008, Battaglia et al. 2016,
Planck-like fiducial cosmology) and are therefore identical to the
reference's numbers -- they are physical constants / published fits, not
code.

This module is pure Python (no jax) so it can be shared by the numpy twin.
"""

from __future__ import annotations

import copy

# Battaglia et al. 2016 generalized-NFW fit families
# (reference: hmvec/params.py:2-37)
battaglia_defaults = {
    "AGN": {
        "rho0_A0": 4000.0,
        "rho0_alpham": 0.29,
        "rho0_alphaz": -0.66,
        "alpha_A0": 0.88,
        "alpha_alpham": -0.03,
        "alpha_alphaz": 0.19,
        "beta_A0": 3.83,
        "beta_alpham": 0.04,
        "beta_alphaz": -0.025,
    },
    "SH": {
        "rho0_A0": 19000.0,
        "rho0_alpham": 0.09,
        "rho0_alphaz": -0.95,
        "alpha_A0": 0.70,
        "alpha_alpham": -0.017,
        "alpha_alphaz": 0.27,
        "beta_A0": 4.43,
        "beta_alpham": 0.005,
        "beta_alphaz": 0.037,
    },
    "pres": {
        "P0_A0": 18.1,
        "P0_alpham": 0.154,
        "P0_alphaz": -0.758,
        "xc_A0": 0.497,
        "xc_alpham": -0.00865,
        "xc_alphaz": 0.731,
        "beta_A0": 4.35,
        "beta_alpham": 0.0393,
        "beta_alphaz": 0.415,
    },
}

default_params = {
    # ---- Mass function (Sheth-Tormen + sigma^2 integral grid) ----
    "st_A": 0.3222,
    "st_a": 0.707,
    "st_p": 0.3,
    "st_deltac": 1.686,
    "sigma2_kmin": 1e-4,
    "sigma2_kmax": 2000,
    "sigma2_numks": 10000,
    "Wkr_taylor_switch": 0.01,
    # ---- Profiles (Duffy et al. 2008 concentration; transform sampling) ----
    "duffy_A_vir": 7.85,  # for Mvir
    "duffy_alpha_vir": -0.081,
    "duffy_beta_vir": -0.71,
    "duffy_A_mean": 10.14,  # for M200 (rho_mean(z))
    "duffy_alpha_mean": -0.081,
    "duffy_beta_mean": -1.01,
    "nfw_integral_numxs": 40000,
    "nfw_integral_xmax": 200,
    "electron_density_profile_integral_numxs": 5000,
    "electron_density_profile_integral_xmax": 20,
    "electron_pressure_profile_integral_numxs": 5000,
    "electron_pressure_profile_integral_xmax": 20,
    "battaglia_gas_gamma": -0.2,
    "battaglia_gas_family": "AGN",
    "battaglia_pres_gamma": -0.3,
    "battaglia_pres_alpha": 1.0,
    "battaglia_pres_family": "pres",
    # ---- Power spectra ----
    "kstar_damping": 0.01,
    "default_halofit": "mead",
    # HMcode Bullock concentration amplitude (baryonic-feedback knob;
    # Mead 2015 table 2: 3.13 = DM-only fit, ~2 = strong AGN feedback)
    "hmcode_A": 3.13,
    # ---- Cosmology (Planck-like; massless neutrinos by default) ----
    "omch2": 0.1198,
    "ombh2": 0.02225,
    "H0": 67.3,
    "ns": 0.9645,
    "As": 2.2e-9,
    "mnu": 0.0,
    "omk": 0.0,
    "pivot_scalar": 0.05,
    "w0": -1.0,
    "tau": 0.06,
    "nnu": 3.046,
    "wa": 0.0,
    "num_massive_neutrinos": 3,
    "T_CMB": 2.7255e6,  # muK
    "parsec": 3.08567758e16,  # m
    "mSun": 1.989e30,  # kg
    "thompson_SI": 6.6524e-29,  # m^2
    "meterToMegaparsec": 3.241e-23,
    "Yp": 0.24,
    # ---- HOD ----
    "hod_A_log10mthresh": 1.0,
    "hod_sig_log_mstellar": 0.2,
    "hod_alphasat": 1.0,
    "hod_Bsat": 9.04,
    "hod_betasat": 0.74,
    "hod_Bcut": 1.65,
    "hod_betacut": 0.59,
    "hod_bisection_search_min_log10mthresh": 7.0,
    "hod_bisection_search_max_log10mthresh": 14.0,
    # Fixed-trip-count bisection (jit-able); 2^-90 of a 7-decade interval is
    # exact at f64 resolution.  Replaces the reference's rtol-based dynamic
    # loop (hmvec/utils.py:9-42, params.py:104-107).
    "hod_bisection_num_iter": 90,
    # Zheng et al 2005/2007 five-parameter HOD (EXTENSION; the reference
    # ships only the Behroozi-threshold family) -- SDSS-like fiducials
    "hod_zheng_log10Mmin": 12.0,
    "hod_zheng_siglogm": 0.2,
    "hod_zheng_log10M0": 11.7,
    "hod_zheng_log10M1": 13.0,
    "hod_zheng_alpha": 1.0,
}

# Physical constants used across modules (SI unless noted)
constants = {
    "cspeed_kms": 299792.458,  # km/s
    "G_SI": 6.674e-11,
    "mProton_SI": 1.673e-27,
    "H100_SI": 3.241e-18,  # 100 km/s/Mpc in 1/s
    "thompson_SI": 6.6524e-29,
    "meter_to_megaparsec": 3.241e-23,
    "electron_mass_kg": 9.1093837015e-31,
    "c_SI": 299792458.0,
    "G_newton_SI": 6.67430e-11,
    "deltac": 1.686,
}


def merge_params(overrides=None):
    """Merge user overrides onto the defaults (reference: cosmology.py:60-62)."""
    p = copy.deepcopy(default_params)
    if overrides:
        p.update(dict(overrides))
    return p


def scoped_override(base: dict, override, allowed_keys, strict: bool):
    """Scoped param_override handling for profiles/HOD.

    Mirrors the reference's allowlist behaviour: HOD raises on unknown keys
    (hmvec/hmvec.py:394), Battaglia silently ignores them (hmvec.py:211-213).
    """
    out = dict(base)
    if override is None:
        return out
    for key, val in override.items():
        if key in allowed_keys:
            out[key] = val
        elif strict:
            raise ValueError(f"Unknown override parameter: {key!r}")
    return out
