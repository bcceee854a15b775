import time, numpy as np
import jax, jax.numpy as jnp
from hmvec_tpu.models.cosmology import Cosmology
from hmvec_tpu.models import spt

c = Cosmology(accuracy="low")
ks_tab = np.geomspace(1e-5, 1e3, 1200)
pk_tab = c.P_lin(jnp.asarray(ks_tab), np.array([0.0]))[0]
ks = jnp.asarray(np.geomspace(0.005, 0.5, 128))

f_mm = jax.jit(lambda p: spt.p1loop(ks, ks_tab, p, qmin=1e-4, qmax=1e2))
f_gg = jax.jit(lambda p, b1, b2: spt.pgg_1loop(ks, ks_tab, p, b1, b2,
                                               qmin=1e-4, qmax=1e2))
t0 = time.time()
r = np.asarray(f_mm(pk_tab)); print("p1loop compile+run", time.time()-t0, "s")
t0 = time.time()
r2 = np.asarray(f_gg(pk_tab, 2.0, 0.5)); print("pgg compile+run", time.time()-t0, "s")
for name, f, args in [("p1loop", f_mm, (pk_tab,)), ("pgg_1loop", f_gg, (pk_tab, 2.0, 0.5))]:
    ts = []
    for _ in range(10):
        t0 = time.time(); np.asarray(f(*args)); ts.append(time.time()-t0)
    print(f"{name}: median {1e3*np.median(ts):.1f} ms (nk=128, nq=512, nx=256)")
