"""Mean pairwise kSZ forecasting (EXTENSION beyond the reference).

The reference (simonsobs/hmvec) forecasts kSZ exclusively through the
velocity-reconstruction route (ksz.py: Nvv, SNR, templates).  The
complementary real-space statistic used by the ACT/SPT/SO pairwise
analyses is the mean pairwise kSZ temperature

    T_pkSZ(r) = - (T_CMB / c) * tau_bar * v12(r)   [> 0 for infall],

built from the SAME Battaglia-16 electron density profile the reference
Fourier-transforms for Pee (hmvec.py:188-250):

- ``tau_aperture_battaglia``: the mean Thomson optical depth of a halo
  measured in a disk aperture of physical radius R_ap,
  tau_bar = sigma_T * N_e,cyl / (pi R_ap^2), with the cylinder electron
  count evaluated as ONE radial quadrature per (z, m) -- the fraction of
  a spherical shell of radius r whose projected radius falls inside the
  aperture is the closed form w(r) = 1 for r <= R_ap and
  1 - sqrt(1 - (R_ap/r)^2) beyond, so no 2-D projection grid is ever
  materialized (a (nz, nm, n_x) broadcast, TPU-friendly static shapes).
- bias-weighted linear mean pairwise velocity (models/rsd.py,
  ``mean_pairwise_velocity`` with the ``b`` argument):
  v12(r) = -(2/3) f aH r b xibar(r) / (1 + b^2 xi(r)).
- pair-count forecast errors: N_pair(r) = 2 pi nbar^2 V r^2 dr (1+xi),
  sigma_bin = sqrt(2/N_pair) sigma_meas (each pair difference carries
  twice the single-object measurement variance).

Everything is jit/grad-safe (fixed-node Gauss-Legendre quadrature,
double-where guarded sqrt at the aperture edge).  Radial separations r
for v12/xi are COMOVING Mpc (they come from the comoving P(k)); the
aperture radius and the profile radius are PHYSICAL Mpc (the Battaglia
profile is parameterized in physical r via the physical rho_crit(z),
hmvec.py:800-860) -- pass ``theta_arcmin`` to specify the aperture
angularly (R_ap = theta * d_A(z), physical angular-diameter distance).

Oracle: hmvec_tpu/twin/pairwise.py (explicit-loop numpy, dense Simpson
quadrature) plus closed-form identities (aperture -> infinity recovers
sigma_T * N_e,total; w(r) shell-fraction identity).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..params import battaglia_defaults, default_params, scoped_override
from ..utils.weights import leggauss_cached
from . import profiles as prof

# shared constants (models/ksz.py conventions)
_SIGMA_T_SI = 6.6524e-29          # Thomson cross-section, m^2
_M_PROTON_SI = 1.673e-27          # kg
_MSUN_KG = 1.989e30               # as profiles.py / the reference
_METER_TO_MPC = 3.241e-23
_C_KM_S = 299792.458
_XH = 0.76                        # hydrogen mass fraction (hmvec.py:920)


def aperture_shell_fraction(r, R_ap):
    """Fraction of a thin spherical shell at radius r whose projected
    (line-of-sight-integrated) radius lies inside R_ap:

        w(r) = 1                         for r <= R_ap,
        w(r) = 1 - sqrt(1 - (R_ap/r)^2)  for r >  R_ap.

    (The shell area with |cos(polar)| > sqrt(1-(R/r)^2) projects inside
    the disk.)  Grad-safe: the sqrt argument is masked before the branch
    so reverse-mode autodiff never sees d(sqrt)/dx at a clipped zero.
    """
    r = jnp.asarray(r)
    outside = r > R_ap
    arg = jnp.where(outside, 1.0 - (R_ap / jnp.where(outside, r, R_ap)) ** 2,
                    1.0)
    return jnp.where(outside, 1.0 - jnp.sqrt(arg), 1.0)


def tau_aperture_battaglia(zs, m200, r200, cmax, rhocritz, omb, omm,
                           R_ap, gamma, fit_params, n_x=256):
    """Mean aperture optical depth tau_bar(z, m) of the Battaglia-16 gas
    density profile inside a disk of PHYSICAL radius R_ap [Mpc].

        N_e,cyl = int_0^{rmax} 4 pi r^2 n_e(r) w(r; R_ap) dr,
        tau_bar = sigma_T N_e,cyl / (pi R_ap^2),

    with n_e = (1+X_H)/(2 m_p) rho_gas (fully-ionized H+He electron
    count) and the profile truncated at x = 2 r / R200 = cmax exactly
    like the registered Fourier profile (fft.py:80-81 semantics).

    zs (nz,), m200/r200/cmax (nz, nm), rhocritz (nz,), R_ap scalar or
    (nz,) [physical Mpc].  Fixed n_x-node Gauss-Legendre in x per (z,m),
    SPLIT at the aperture edge x_edge = R_ap / (R200/2): w(r) has a
    kink there (sqrt'(0) one-sided), so a single panel converges only
    algebraically for halos larger than the aperture -- two panels are
    each smooth and converge spectrally (measured: 6e-4 -> <1e-8 max
    rel at n_x = 256 on a 1e12-1e15 Msun grid).  Returns tau_bar
    (nz, nm).
    """
    zs = jnp.asarray(zs)
    m200 = jnp.asarray(m200)
    r200 = jnp.asarray(r200)
    cmax = jnp.asarray(cmax)
    R_ap = jnp.asarray(R_ap)
    if R_ap.ndim == 1:
        R_ap = R_ap[:, None]          # (nz, 1) broadcasting over m

    t_np, w_np = leggauss_cached(n_x)             # nodes on [-1, 1]
    t = jnp.asarray(0.5 * (t_np + 1.0))           # (n_x,) on (0, 1)
    w = jnp.asarray(0.5 * w_np)

    rg = r200 / 2.0                               # x = r / (R200/2)
    x_edge = jnp.clip(R_ap / rg, 0.0, cmax)       # kink location in x
    sigma_T_mpc2 = _SIGMA_T_SI * _METER_TO_MPC**2

    def _f(xs):
        # x^2 n_e(x) w_ap(x)
        rho = prof.rho_gas_x(xs, m200[..., None], zs[:, None, None],
                             omb, omm, rhocritz[:, None, None], gamma,
                             fit_params)          # Msun/Mpc^3 (physical)
        n_e = rho * (_MSUN_KG / _M_PROTON_SI) * (1.0 + _XH) / 2.0
        wap = aperture_shell_fraction(xs * rg[..., None], R_ap[..., None])
        return xs**2 * n_e * wap

    # panel 1: [0, x_edge], integrand smooth (w_ap = 1)
    xs1 = x_edge[..., None] * t[None, None, :]
    I1 = x_edge * jnp.einsum("x,zmx->zm", w, _f(xs1))
    # panel 2: [x_edge, cmax] under u^2 = x - x_edge -- w_ap there goes
    # like 1 - sqrt(1 - (R/r)^2) ~ u near the edge (sqrt endpoint
    # singularity), analytic in u; double-where keeps the zero-width
    # (aperture beyond halo) case grad-safe
    width2 = jnp.maximum(cmax - x_edge, 0.0)
    pos = width2 > 0.0
    umax = jnp.where(pos, jnp.sqrt(jnp.where(pos, width2, 1.0)), 0.0)
    us = umax[..., None] * t[None, None, :]
    xs2 = x_edge[..., None] + us**2
    I2 = umax * jnp.einsum("x,zmx->zm", w, 2.0 * us * _f(xs2))
    I = I1 + I2
    Ne_cyl = 4.0 * jnp.pi * rg**3 * I
    return sigma_T_mpc2 * Ne_cyl / (jnp.pi * R_ap**2)


def electron_count_total_battaglia(zs, m200, r200, cmax, rhocritz, omb,
                                   omm, gamma, fit_params, n_x=512):
    """Total electron count N_e(< rmax) of the truncated profile (the
    R_ap -> infinity limit of the cylinder count); used by the identity
    tests and for converting tau conventions."""
    big = 1e9 * jnp.max(r200)
    tau = tau_aperture_battaglia(zs, m200, r200, cmax, rhocritz, omb,
                                 omm, big, gamma, fit_params, n_x=n_x)
    sigma_T_mpc2 = _SIGMA_T_SI * _METER_TO_MPC**2
    return tau * jnp.pi * big**2 / sigma_T_mpc2


def compton_y_k0_battaglia(zs, m200, r200, cmax, rhocritz, omb, omm,
                           alpha, gamma, fit_params, hz, n_x=512):
    """Exact k -> 0 limit of the y-weighted Battaglia pressure profile,

        u_y(0) = 4 pi sigma_T/(m_e c^2) r200^3 (1+z)^2 / H(z)
                 * int_0^cmax x^2 P_e(x) dx,

    by n_x-node Gauss-Legendre per (z, m) (integrand ~ x^(2+gamma),
    smooth -- spectral convergence).  This is what
    add_battaglia_pres_profile's u_y(k) tends to as k -> 0, EXCEPT that
    the FFT path's output grid bottoms out at kt_min/(r200(1+z)) ~
    0.3/Mpc and flat-extrapolates below (reference fft.py:97-115
    semantics), which is ~5% low for the largest halos -- the monopole
    needs the true limit.  Constants match add_battaglia_pres_profile
    (hmvec.py:313-316).
    """
    zs = jnp.asarray(zs)
    m200 = jnp.asarray(m200)
    r200 = jnp.asarray(r200)
    cmax = jnp.asarray(cmax)
    t_np, w_np = leggauss_cached(n_x)
    t = jnp.asarray(0.5 * (t_np + 1.0))
    w = jnp.asarray(0.5 * w_np)
    xs = cmax[..., None] * t[None, None, :]
    P = prof.pressure_x(xs, m200[..., None], r200[..., None],
                        zs[:, None, None], omb, omm,
                        rhocritz[:, None, None], alpha, gamma, fit_params)
    I = cmax * jnp.einsum("x,zmx->zm", w, xs**2 * P)
    sigmaT = 6.6524587321e-29
    mElect = 9.1093837015e-31 / 1.989e30
    c_SI = 299792458.0
    unit = (4.0 * jnp.pi * (sigmaT / (mElect * c_SI**2)) * r200**3
            * ((1.0 + zs) ** 2 / jnp.asarray(hz))[:, None])
    return unit * I


def pairwise_ksz_signal(ks, pk, f, aH, bg, tau_bar,
                        T_CMB_uK=None):
    """Mean pairwise kSZ temperature signal on the FFTLog r grid:

        T_pkSZ(r) = - T_CMB * tau_bar * v12(r) / c    [muK],

    positive for infall (v12 < 0) in the standard estimator sign
    convention.  ks/pk: linear matter power at the sample redshift
    (log-uniform ks); f, aH, bg, tau_bar scalars (one redshift slice).
    Returns (rs [comoving Mpc], T(r) [muK]).
    """
    from .rsd import mean_pairwise_velocity
    if T_CMB_uK is None:
        T_CMB_uK = default_params["T_CMB"]
    rs, v12 = mean_pairwise_velocity(ks, pk, f, aH, b=bg)
    return rs, -T_CMB_uK * tau_bar * v12 / _C_KM_S


def pairwise_ksz_errors(r_edges, rs, xi, T_r, ngal_mpc3, volume_gpc3,
                        sigma_meas_uK, bg=1.0):
    """Pair-count forecast errors for the binned pairwise kSZ signal.

    Galaxy pair count in a separation bin [r_i, r_{i+1}]:
        N_pair = 2 pi nbar^2 V r_c^2 dr (1 + bg^2 xi(r_c)),
    (half of nbar*N * 4 pi r^2 dr (1 + xi_gg)); each pair temperature
    difference carries twice the single-object measurement variance, so
        sigma_bin = sqrt(2 / N_pair) * sigma_meas.

    r_edges (nb+1,) comoving Mpc; rs/xi/T_r on the signal grid
    (interpolated to bin centers); ngal_mpc3 nbar [1/Mpc^3];
    volume_gpc3 [Gpc^3]; sigma_meas_uK per-object aperture noise [muK].
    Returns (r_centers, T_bins, sigma_bins, snr).
    """
    r_edges = jnp.asarray(r_edges)
    rc = 0.5 * (r_edges[1:] + r_edges[:-1])
    dr = jnp.diff(r_edges)
    xi_c = jnp.interp(rc, jnp.asarray(rs), jnp.asarray(xi))
    T_c = jnp.interp(rc, jnp.asarray(rs), jnp.asarray(T_r))
    V = volume_gpc3 * 1e9
    npair = (2.0 * jnp.pi * ngal_mpc3**2 * V * rc**2 * dr
             * (1.0 + bg**2 * xi_c))
    sigma = jnp.sqrt(2.0 / npair) * sigma_meas_uK
    snr = jnp.sqrt(jnp.sum((T_c / sigma) ** 2))
    return rc, T_c, sigma, snr


def get_pairwise_ksz_snr(hm, zindex, ngal_mpc3, volume_gpc3,
                         sigma_meas_uK, r_edges, hod_name="g",
                         R_ap=None, theta_arcmin=1.0, nks=512,
                         tau_bar=None):
    """End-to-end pairwise kSZ SNR for one redshift slice of a HaloModel
    with a registered electron profile + HOD.

    Builds tau_bar as the HOD-weighted mean aperture optical depth (pass
    ``tau_bar`` to override), the bias-weighted v12 from the linear
    P(k) at zs[zindex], and the pair-count errors.  Returns a dict with
    r_centers / T_bins / sigma_bins / snr / tau_bar / v12 grid.
    """
    z = float(np.asarray(hm.zs)[zindex])
    if tau_bar is None:
        tau_zm = hm.get_tau_aperture(R_ap=R_ap, theta_arcmin=theta_arcmin)
        tau_bar = hm.get_tau_mean_hod(hod_name, tau_zm)[zindex]
    bg = hm.hods[hod_name]["bg"][zindex]
    ks = jnp.geomspace(1e-4, 1e2, nks)
    pk = hm.P_lin(ks, np.array([z]))[0]
    f = hm.get_growth_rate_f(np.array([z]))[0]
    aH = hm.h_of_z(np.array([z]))[0] * _C_KM_S / (1.0 + z)
    rs, T_r = pairwise_ksz_signal(ks, pk, f, aH, bg, tau_bar)
    from ..ops.fftlog import correlation_function
    _, xi = correlation_function(np.asarray(ks), pk)
    rc, T_b, sig, snr = pairwise_ksz_errors(
        r_edges, rs, xi, T_r, ngal_mpc3, volume_gpc3, sigma_meas_uK,
        bg=bg)
    return {"r_centers": rc, "T_bins": T_b, "sigma_bins": sig,
            "snr": snr, "tau_bar": tau_bar, "rs": rs, "T_r": T_r}
