"""Generate Chebyshev coefficient tables for Si/Ci evaluation on TPU.

jax.scipy has no sici (reference calls scipy.special.sici at hmvec.py:350),
so we build our own vectorized evaluator:

  * x in [0, 4]:    Si(x)/x and (Ci(x)-gamma-ln x) are even entire functions;
                    fit Chebyshev series in u = 2*(x/4)^2 - 1.
  * x in (4, 40]:   auxiliary functions f, g with
                    Si = pi/2 - f cos - g sin,  Ci = f sin - g cos;
                    fit x*f(x), x^2*g(x) as Chebyshev in w = 2*(4/x) - 1 ...
                    (actually in v = 1/x mapped linearly to [-1, 1]).
  * x > 40:         13-term asymptotic series (min term < 1e-15).

Oracle: scipy.special.sici (float64).  Run: python tools/gen_special_coeffs.py
Writes: hmvec_tpu/ops/_sici_coeffs.py
"""

import numpy as np
from numpy.polynomial import chebyshev as C
from scipy.special import sici

EULER_GAMMA = 0.5772156649015328606

OUT = "hmvec_tpu/ops/_sici_coeffs.py"


def fit_cheb(func, lo, hi, deg, n=4001):
    xs = np.linspace(lo, hi, n)
    ys = func(xs)
    ser = C.Chebyshev.fit(xs, ys, deg, domain=[lo, hi])
    err = np.max(np.abs(ser(xs) - ys))
    return ser.coef, err


def main():
    # --- small-x branch: u = (x/4)^2 in [0,1] ---
    def si_over_x_of_u(u):
        x = 4.0 * np.sqrt(u)
        si, _ = sici(np.where(x == 0, 1e-300, x))
        out = si / np.where(x == 0, 1.0, x)
        return np.where(u == 0, 1.0, out)

    def ci_reg_of_u(u):
        # h(x) = Ci(x) - gamma - ln(x), even, h(0)=0
        x = 4.0 * np.sqrt(np.maximum(u, 1e-300))
        _, ci = sici(x)
        out = ci - EULER_GAMMA - np.log(x)
        return np.where(u == 0, 0.0, out)

    si_small, e1 = fit_cheb(si_over_x_of_u, 0.0, 1.0, 28)
    ci_small, e2 = fit_cheb(ci_reg_of_u, 0.0, 1.0, 28)

    # --- mid-x branch: v = 1/x in [1/40, 1/4] ---
    def xf_of_v(v):
        x = 1.0 / v
        si, ci = sici(x)
        f = (np.pi / 2 - si) * np.cos(x) + ci * np.sin(x)
        return x * f

    def x2g_of_v(v):
        x = 1.0 / v
        si, ci = sici(x)
        g = (np.pi / 2 - si) * np.sin(x) - ci * np.cos(x)
        return x * x * g

    xf_mid, e3 = fit_cheb(xf_of_v, 1.0 / 40.0, 1.0 / 4.0, 48)
    x2g_mid, e4 = fit_cheb(x2g_of_v, 1.0 / 40.0, 1.0 / 4.0, 48)

    print(f"fit max errs: si_small={e1:.2e} ci_small={e2:.2e} "
          f"xf_mid={e3:.2e} x2g_mid={e4:.2e}")

    # --- unified split-domain tables for the fast TPU sici path:
    # one degree-24 Clenshaw with per-element coefficient select across
    # 3 domains (keeps the serial dependency chain short on the VPU) ---
    DEG_U = 24

    def si_over_x_small(u):          # domain 0: t-var u=(x/4)^2 in [0,1]
        return si_over_x_of_u(u)

    def ci_reg_small(u):
        return ci_reg_of_u(u)

    def xf_of_v2(v):                 # domains 1,2: t-var v=1/x
        x = 1.0 / v
        si, ci = sici(x)
        return x * ((np.pi / 2 - si) * np.cos(x) + ci * np.sin(x))

    def x2g_of_v2(v):
        x = 1.0 / v
        si, ci = sici(x)
        return x * x * ((np.pi / 2 - si) * np.sin(x) - ci * np.cos(x))

    doms = [
        ("small", si_over_x_small, ci_reg_small, 0.0, 1.0),
        ("mid1", xf_of_v2, x2g_of_v2, 1.0 / 10.0, 1.0 / 4.0),
        ("mid2", xf_of_v2, x2g_of_v2, 1.0 / 40.0, 1.0 / 10.0),
    ]
    A_rows, B_rows, dom_bounds = [], [], []
    for name, fa, fb, lo, hi in doms:
        ca, ea = fit_cheb(fa, lo, hi, DEG_U)
        cb, eb = fit_cheb(fb, lo, hi, DEG_U)
        print(f"unified {name}: A={ea:.2e} B={eb:.2e}")
        A_rows.append(ca)
        B_rows.append(cb)
        dom_bounds.append((lo, hi))
    A_U = np.stack(A_rows)
    B_U = np.stack(B_rows)

    # --- Bessel J0: small branch u = (x/8)^2 in [0,1]; large branch via
    # modulus/phase: j0 = sqrt(2/(pi x)) [P(v) cos(x - pi/4) + Q(v) sin(x - pi/4)],
    # v = 8/x in [0,1] ---
    from scipy.special import j0 as sp_j0

    def j0_small_of_u(u):
        x = 8.0 * np.sqrt(u)
        return sp_j0(x)

    def j0_mod_phase(v):
        # recover P, Q from j0 and j1-like relations numerically: fit the
        # auxiliary functions from j0 and its derivative
        x = 8.0 / v
        from scipy.special import j1 as sp_j1
        amp = np.sqrt(np.pi * x / 2.0)
        c = np.cos(x - np.pi / 4.0)
        s = np.sin(x - np.pi / 4.0)
        # [c, s; -s', ...]: solve 2x2 using j0 and j0' = -j1
        # j0 = a*(P c + Q s); j0' = a'*(...) -- simpler: use two equations
        # from j0 and j1: j1 = sqrt(2/(pi x)) [P1 cos(x-3pi/4)+Q1 sin(..)]
        # Instead fit P,Q jointly by least squares on overdetermined grid.
        return amp, c, s, sp_j0(x), sp_j1(x)

    j0_small, e5 = fit_cheb(j0_small_of_u, 0.0, 1.0, 40)

    # Fit P(v), Q(v) by least squares: j0(x)*sqrt(pi x/2) = P cos + Q sin
    v = np.linspace(1e-6, 1.0, 8001)
    amp, c, s, j0v, _ = j0_mod_phase(v)
    lhs = j0v * amp
    # model: lhs = sum_i p_i T_i(t) * c + sum_i q_i T_i(t) * s, t = 2v-1
    deg = 20
    t = 2.0 * v - 1.0
    Tmat = np.polynomial.chebyshev.chebvander(t, deg)
    A = np.hstack([Tmat * c[:, None], Tmat * s[:, None]])
    coef, *_ = np.linalg.lstsq(A, lhs, rcond=None)
    j0_P = coef[:deg + 1]
    j0_Q = coef[deg + 1:]
    resid = np.max(np.abs(A @ coef - lhs))
    print(f"j0 fits: small={e5:.2e} large-resid(on sqrt-scaled)={resid:.2e}")

    def fmt(name, arr):
        vals = ",\n    ".join(repr(float(v)) for v in arr)
        return f"{name} = np.array([\n    {vals}\n])\n"

    with open(OUT, "w") as fh:
        fh.write('"""Auto-generated by tools/gen_special_coeffs.py -- do not edit."""\n')
        fh.write("import numpy as np\n\n")
        fh.write(f"EULER_GAMMA = {EULER_GAMMA!r}\n\n")
        fh.write(fmt("SI_SMALL", si_small))
        fh.write(fmt("CI_SMALL", ci_small))
        fh.write(fmt("XF_MID", xf_mid))
        fh.write(fmt("X2G_MID", x2g_mid))
        fh.write(fmt("J0_SMALL", j0_small))
        fh.write(fmt("J0_P", j0_P))
        fh.write(fmt("J0_Q", j0_Q))
        fh.write("# unified split-domain sici tables (rows: x<=4, 4<x<=10, "
                 "10<x<=40)\n")
        fh.write("SICI_DOM_LO = np.array([%r, %r, %r])\n"
                 % (dom_bounds[0][0], dom_bounds[1][0], dom_bounds[2][0]))
        fh.write("SICI_DOM_HI = np.array([%r, %r, %r])\n"
                 % (dom_bounds[0][1], dom_bounds[1][1], dom_bounds[2][1]))
        for i in range(3):
            fh.write(fmt(f"SICI_A{i}", A_U[i]))
            fh.write(fmt(f"SICI_B{i}", B_U[i]))
    print("wrote", OUT)


if __name__ == "__main__":
    main()
