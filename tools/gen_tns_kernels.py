"""Derive the TNS (Taruya-Nishimichi-Saito 2010, arXiv:1006.0699)
redshift-space A(k,mu) and B(k,mu) correction-term kernels FROM FIRST
PRINCIPLES with sympy, and code-generate hmvec_tpu/models/_tns_kernels.py.

Nothing is transcribed from the paper's appendix tables: we start from
the defining integrals,

    A(k,mu) = (k mu f) int d^3q/(2pi)^3 (q_z/q^2)
                  [ B_sigma(q, k-q, -k) - B_sigma(q, k, -k-q) ],
    B(k,mu) = (k mu f)^2 int d^3q/(2pi)^3 F(q) F(k-q),
    F(p)    = (p_z/p^2) [ P_dt(p) + f (p_z^2/p^2) P_tt(p) ],

with the tree-level cross bispectrum

    <theta(k1) a(k2) a(k3)> = (2pi)^3 delta_D(k123) B_sigma(k1,k2,k3),
    a(k) = delta(k) + f (k_z^2/k^2) theta(k),

assembled from the second-order EdS kernels F2/G2 (theta normalized so
theta = delta at linear order, the same convention as models/spt.py).
The azimuthal integral is done symbolically (the integrand is a
polynomial of degree <= 6 in cos(phi)), the second bispectrum ordering
is mapped onto the same |k-q| leg by q -> -q, and the result is
collected as

    A(k,mu,f) = (k^3/4pi^2) sum_{m,n} mu^m f^n
                int dln q int dln y  C^A_{mn,j}(r,y) * Pprod_j,
    Pprod in { P(kr)P(ky), P(kr)P(k), P(ky)P(k) },

(and the analogue for B with the four {dt,tt}x{dt,tt} products), in the
same (r = q/k, y = |k-q|/k) variables and ln-y inner substitution as
models/spt.p22.  The generated coefficients are validated end-to-end
against an independent direct 3-D (q, y, phi) numerical twin that keeps
both bispectrum orderings explicit (hmvec_tpu/twin/tns.py,
tests/test_tns.py).

Run:  python tools/gen_tns_kernels.py
"""

from __future__ import annotations

import sympy as sp


def _kern2(dot, a2, b2, c0, c2):
    """Second-order kernel family: c0 + dot/2 (1/a2 + 1/b2)
    + c2 dot^2/(a2 b2).  (F2: c0=5/7, c2=2/7; G2: 3/7, 4/7.)"""
    return c0 + dot / 2 * (sp.Integer(1) / a2 + sp.Integer(1) / b2) \
        + c2 * dot**2 / (a2 * b2)


def F2(dot, a2, b2):
    return _kern2(dot, a2, b2, sp.Rational(5, 7), sp.Rational(2, 7))


def G2(dot, a2, b2):
    return _kern2(dot, a2, b2, sp.Rational(3, 7), sp.Rational(4, 7))


def derive():
    r, y, mu, f, c, S = sp.symbols("r y mu f c S", real=True)
    # geometry, all momenta in units of k:
    #   x = cos(k,q) from the y-substitution; q_z/q = x mu + S c with
    #   S^2 = (1-x^2)(1-mu^2) (phi measured from the (k, n) plane)
    x = (1 + r**2 - y**2) / (2 * r)
    muq = x * mu + S * c                    # mu_q = q_z/q
    mukq = (mu - r * muq) / y               # mu_{k-q}
    Pr, Py, Pk = sp.symbols("Pr Py Pk")     # linear P at kr, ky, k
    # four B-term power products (dt/tt at kr and ky)
    Bdd, Bdt, Btd, Btt = sp.symbols("Bdd Bdt Btd Btt")

    # ---- A term ----------------------------------------------------
    # ordering 1: (k1,k2,k3) = (q, k-q, -k)
    #   dots (k^2 units): k2.k3 = -(1-rx); k1.k3 = -rx; k1.k2 = rx - r^2
    # tree level:
    #   B_sigma = 2 G2(k2,k3)(1+f mu2^2)(1+f mu3^2) P(k2)P(k3)
    #           + 2 [F2(k1,k3)+f mu2^2 G2(k1,k3)](1+f mu3^2) P(k1)P(k3)
    #           + 2 [F2(k1,k2)+f mu3^2 G2(k1,k2)](1+f mu2^2) P(k1)P(k2)
    def b_sigma(d23, d13, d12, a1, a2_, a3, m2sq, m3sq, P1, P2, P3):
        t1 = 2 * G2(d23, a2_, a3) * (1 + f * m2sq) * (1 + f * m3sq) \
            * P2 * P3
        t2 = 2 * (F2(d13, a1, a3) + f * m2sq * G2(d13, a1, a3)) \
            * (1 + f * m3sq) * P1 * P3
        t3 = 2 * (F2(d12, a1, a2_) + f * m3sq * G2(d12, a1, a2_)) \
            * (1 + f * m2sq) * P1 * P2
        return t1 + t2 + t3

    rx = r * x
    B1 = b_sigma(d23=-(1 - rx), d13=-rx, d12=rx - r**2,
                 a1=r**2, a2_=y**2, a3=1,
                 m2sq=mukq**2, m3sq=mu**2, P1=Pr, P2=Py, P3=Pk)
    # ordering 2 after q -> -q: (k1,k2,k3) = (-q, k, q-k), and the
    # minus sign of (q_z/q^2) under the flip turns the difference into
    # a sum: A-integrand = muq (B1 + B2).
    #   dots: k2.k3 = rx - 1; k1.k3 = rx - r^2; k1.k2 = -rx
    B2 = b_sigma(d23=rx - 1, d13=rx - r**2, d12=-rx,
                 a1=r**2, a2_=1, a3=y**2,
                 m2sq=mu**2, m3sq=mukq**2, P1=Pr, P2=Pk, P3=Py)
    # measure: A = (k^3 mu f / 4pi^2) int dlnq dlny  (r y^2) <muq*(B1+B2)>
    IA = sp.expand(muq * (B1 + B2) * r * y**2)

    # ---- B term ----------------------------------------------------
    # B = (k^3 mu^2 f^2 / 4pi^2) int dlnq dlny (r y)
    #       <muq mukq (Pdt_r + f muq^2 Ptt_r)(Pdt_y + f mukq^2 Ptt_y)>
    # power products kept as Bdd = Pdt(kr)Pdt(ky), Bdt = Pdt(kr)Ptt(ky),
    # Btd = Ptt(kr)Pdt(ky), Btt = Ptt(kr)Ptt(ky).
    IB = sp.expand(
        muq * mukq * r * y
        * (Bdd + f * mukq**2 * Bdt + f * muq**2 * Btd
           + f**2 * muq**2 * mukq**2 * Btt))

    # ---- azimuthal average ------------------------------------------
    # <c^n>_phi: 0 for odd n; 1/2, 3/8, 5/16 for n = 2, 4, 6.
    moments = {0: sp.Integer(1), 2: sp.Rational(1, 2),
               4: sp.Rational(3, 8), 6: sp.Rational(5, 16)}

    def phi_average(expr):
        poly = sp.Poly(expr, c)
        out = sp.Integer(0)
        for (n,), coeff in poly.terms():
            if n % 2 == 1:
                continue
            assert n in moments, f"cos(phi) degree {n} unexpected"
            out += coeff * moments[n]
        # surviving even powers of S: S^2 = (1-x^2)(1-mu^2)
        out = sp.expand(out)
        out = out.subs(S**6, ((1 - x**2) * (1 - mu**2)) ** 3)
        out = out.subs(S**4, ((1 - x**2) * (1 - mu**2)) ** 2)
        out = out.subs(S**2, (1 - x**2) * (1 - mu**2))
        assert not out.has(S)
        return sp.expand(out)

    IA = phi_average(IA)
    IB = phi_average(IB)

    # ---- collect (mu^m f^n) x P-structure coefficients --------------
    def collect_terms(expr, pstructs):
        """-> {(m, n, pname): C(r, y)} with C canonical rational.
        Every monomial of expr must carry exactly one P-structure
        (asserted)."""
        psyms = sorted({s for ps in pstructs.values()
                        for s in ps.free_symbols}, key=str)
        want = {tuple(sp.Poly(ps, *psyms).monoms()[0]): name
                for name, ps in pstructs.items()}
        terms = {}
        for mono, coeff_p in sp.Poly(expr, *psyms).terms():
            assert mono in want, f"unexpected P-structure {mono}"
            pname = want[mono]
            poly = sp.Poly(sp.expand(coeff_p), mu, f)
            for (m, n), cmn in poly.terms():
                C = sp.cancel(sp.together(cmn))
                if C != 0:
                    terms[(m, n, pname)] = C
        return terms

    a_terms = collect_terms(IA, {"ry": Pr * Py, "rk": Pr * Pk,
                                 "yk": Py * Pk})
    b_terms = collect_terms(IB, {"dd": Bdd, "dt": Bdt,
                                 "td": Btd, "tt": Btt})

    # sanity: P_s(k, mu) is even in mu.  A carries an overall k mu f
    # and B an overall (k mu f)^2, so every surviving A power must be
    # odd and every B power even.
    assert all(m % 2 == 1 for (m, n, p) in a_terms), sorted(a_terms)
    assert all(m % 2 == 0 for (m, n, p) in b_terms), sorted(b_terms)
    return a_terms, b_terms


def codegen(a_terms, b_terms, path):
    from sympy.printing.pycode import pycode
    r, y = sp.symbols("r y", real=True)

    def emit(terms, fname, doc):
        keys = sorted(terms)
        exprs = [terms[k] for k in keys]
        repl, reduced = sp.cse(exprs, optimizations="basic")
        lines = [f"def {fname}(r, y):", f'    """{doc}"""']
        for sym, sub in repl:
            lines.append(f"    {sym} = {pycode(sub)}")
        lines.append("    return {")
        for k, e in zip(keys, reduced):
            lines.append(f"        {k!r}: {pycode(e)},")
        lines.append("    }")
        return "\n".join(lines)

    header = '''"""GENERATED by tools/gen_tns_kernels.py -- do not edit.

Reduced 2-D kernels of the TNS redshift-space A/B correction terms,
derived from first principles with sympy (tree-level B_sigma with
F2/G2, analytic phi-average); see the generator docstring for the
definitions and tests/test_tns.py for the independent direct-3D
validation.  Keys are (mu-power m, f-power n, P-structure):

    A(k,mu,f) = (k^3/4pi^2) (mu f)   sum mu^m f^n
                    int dlnq dlny  C^A_{mn,j}(r, y) Pprod_j,
    B(k,mu,f) = (k^3/4pi^2) (mu f)^2 sum mu^m f^n
                    int dlnq dlny  C^B_{mn,j}(r, y) Pprod_j,
    A Pprod: "ry" = P(kr)P(ky), "rk" = P(kr)P(k), "yk" = P(ky)P(k);
    B Pprod: "dd/dt/td/tt" = {Pdt,Ptt}(kr) x {Pdt,Ptt}(ky),

with r = q/k, y = |k-q|/k and the dlnq dlny measure (the r y^2 / r y
Jacobians are already inside the coefficients).
"""

# flake8: noqa
'''
    src = (header + "\n\n"
           + emit(a_terms, "a_kernels",
                  "A-term coefficients C^A_{(m,n,j)}(r, y).") + "\n\n\n"
           + emit(b_terms, "b_kernels",
                  "B-term coefficients C^B_{(m,n,j)}(r, y).") + "\n")
    with open(path, "w") as fh:
        fh.write(src)
    print(f"wrote {path}: {len(a_terms)} A terms, {len(b_terms)} B terms")
    print("A keys:", sorted(a_terms))
    print("B keys:", sorted(b_terms))


if __name__ == "__main__":
    a_terms, b_terms = derive()
    codegen(a_terms, b_terms, "hmvec_tpu/models/_tns_kernels.py")
