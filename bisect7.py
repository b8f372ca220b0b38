import time
import jax, jax.numpy as jnp
import numpy as np

def timeit(jf, *a, reps=20):
    jax.block_until_ready(jf(*a))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter(); jax.block_until_ready(jf(*a)); best = min(best, time.perf_counter()-t0)
    return best*1e3

N = 512*512
x = jnp.ones((N,)); y = jnp.zeros((N,))
add1 = jax.jit(lambda a, b: a + b)
print("add before:", timeit(add1, x, y))

h = np.asarray(x[:8])   # D2H transfer
print("after D2H:", timeit(add1, x, y))

d = jnp.asarray(np.ones((N,), np.float32)); d.block_until_ready()  # H2D
print("after H2D:", timeit(add1, x, y))

full = np.asarray(x)    # big D2H
print("after big D2H:", timeit(add1, x, y))
time.sleep(3)
print("after sleep 3:", timeit(add1, x, y))
