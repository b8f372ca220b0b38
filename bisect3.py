import time
import jax, jax.numpy as jnp
import numpy as np

def t(fn, *a, reps=20):
    jf = jax.jit(fn)
    jax.block_until_ready(jf(*a))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter(); jax.block_until_ready(jf(*a)); best = min(best, time.perf_counter()-t0)
    return best*1e3

N = 512*512
x = jnp.ones((N,)); y = jnp.ones((N,))
print("single in/out add:", t(lambda a, b: a + b, x, y))
xs = tuple(jnp.ones((N,)) for _ in range(7))
print("7-ary tuple add:", t(lambda t7: t7[0] + t7[6], xs))
m = jnp.ones((1024,1024))
print("matmul jit:", t(lambda a: a @ a, m))
print("eager add:", end=" ")
z=(x+y).block_until_ready()
t0=time.perf_counter()
for _ in range(20): z=(x+y).block_until_ready()
print((time.perf_counter()-t0)/20*1e3)
