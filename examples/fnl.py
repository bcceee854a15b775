"""Scale-dependent fNL bias (reference: examples/fnl.py)."""

import numpy as np

import hmvec_tpu as hm


def main():
    ks = np.geomspace(1e-4, 0.1, 100)
    c = hm.Cosmology()
    for fnl in (-20, 0, 20):
        b = np.asarray(c.bias_fnl(bg_bias=2.0, fnl=fnl, z=1.0, ks=ks))
        print(f"fnl={fnl:+d}: b(k=1e-4)={b[0]:.3f}  b(k=1e-2)="
              f"{b[np.argmin(np.abs(ks-1e-2))]:.3f}  b(k=0.1)={b[-1]:.3f}")


if __name__ == "__main__":
    main()
