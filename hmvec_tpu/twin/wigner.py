"""Independent numpy/scipy oracle for Wigner small-d transform sums.

Built on the Jacobi-polynomial closed form (Wikipedia "Wigner D-matrix",
Varshalovich 4.3.4(13)), completely independent of the lax.scan upward
recurrence in models/shear.py:

    d^l_{mn}(beta) = sqrt( (l+m)! (l-m)! / ((l+n)! (l-n)!) )
                     (sin beta/2)^{m-n} (cos beta/2)^{m+n}
                     P^{(m-n, m+n)}_{l-m}(cos beta)

valid for m - n >= 0 and m + n >= 0, which covers every spin pair the
shear module exposes: (0,0), (2,2), (2,-2), (2,0).  Factorial ratios go
through gammaln so no large factorials are formed.
"""

from __future__ import annotations

import numpy as np
from scipy.special import eval_jacobi, gammaln


def wigner_d(l, m, n, beta):
    """d^l_{mn}(beta) for scalar integers l, m, n; beta array-like (rad).

    Requires m - n >= 0 and m + n >= 0 (the Jacobi form's domain); returns
    zeros for l < max(|m|, |n|).
    """
    l, m, n = int(l), int(m), int(n)
    if m - n < 0 or m + n < 0:
        raise ValueError("oracle requires m - n >= 0 and m + n >= 0")
    beta = np.asarray(beta, dtype=np.float64)
    if l < max(abs(m), abs(n)):
        return np.zeros_like(beta)
    lognorm = 0.5 * (gammaln(l + m + 1) + gammaln(l - m + 1)
                     - gammaln(l + n + 1) - gammaln(l - n + 1))
    s, c = np.sin(beta / 2.0), np.cos(beta / 2.0)
    return (np.exp(lognorm) * s ** (m - n) * c ** (m + n)
            * eval_jacobi(l - m, m - n, m + n, np.cos(beta)))


def wigner_d_sum(ells, cls, thetas_rad, mn=(0, 0)):
    """Explicit-loop sum_l (2l+1)/(4pi) C_l d^l_{mn}(theta).

    ells: (nl,) integers; cls: (nl,) (1-D only -- this is an oracle);
    thetas_rad: (nt,).  Returns (nt,).
    """
    m, n = int(mn[0]), int(mn[1])
    ells = np.asarray(ells)
    cls = np.asarray(cls, dtype=np.float64)
    thetas_rad = np.asarray(thetas_rad, dtype=np.float64)
    out = np.zeros_like(thetas_rad)
    for l, cl in zip(ells, cls):
        out += (2.0 * l + 1.0) / (4.0 * np.pi) * cl * wigner_d(
            l, m, n, thetas_rad)
    return out
