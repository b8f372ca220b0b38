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
print("add1 before:", timeit(add1, x, y))

def tri(a):
    acc = a
    for i in range(12):
        acc = acc * 1.0001 + float(i)
    return acc
trif = jax.jit(tri)
out = jax.block_until_ready(trif(x))
print("add1 after poison (same executable):", timeit(add1, x, y))
add2 = jax.jit(lambda a, b: b + a)
print("add2 new executable:", timeit(add2, x, y))
del out
import gc; gc.collect()
print("add1 after del out:", timeit(add1, x, y))
time.sleep(5)
print("add1 after 5s sleep:", timeit(add1, x, y))
print("tri again:", timeit(trif, x))
print("add1 after tri steady:", timeit(add1, x, y))
