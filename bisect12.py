import time
import jax, jax.numpy as jnp
import numpy as np

N = 1024
x = jnp.ones((N,))

def mk(n_consts, dev):
    consts = [jnp.float32(float(i)) if dev else np.float32(float(i)) for i in range(n_consts)]
    def f(a):
        acc = a
        for c in consts:
            acc = acc + c
        return acc
    return f

for dev in (False, True):
    for n in (10, 100, 400):
        f = mk(n, dev)
        t0 = time.perf_counter(); lo = jax.jit(f).lower(x); dt = time.perf_counter()-t0
        print(f"dev={dev} n_consts={n}: lower {dt:.3f}s")
