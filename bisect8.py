import time
import jax, jax.numpy as jnp
import numpy as np

N = 512*512
x = jnp.ones((N,)); y = jnp.zeros((N,))
add1 = jax.jit(lambda a, b: a + b)
add1(x, y).block_until_ready()

# poison
_ = np.asarray(x[:8])

# async pipelining: 20 dispatches, block once
z = x
t0 = time.perf_counter()
for _i in range(20):
    z = add1(z, y)
z.block_until_ready()
print("20 async chained:", (time.perf_counter()-t0)*1e3, "ms total")

# sequential blocking
t0 = time.perf_counter()
for _i in range(20):
    z = add1(z, y).block_until_ready()
print("20 blocking:", (time.perf_counter()-t0)*1e3, "ms total")

# does a new process see clean state? (tested implicitly)
# can we unpoison via donate/device_put? try device_put
x2 = jax.device_put(np.ones((N,), np.float32)); x2.block_until_ready()
t0 = time.perf_counter(); add1(x2, y).block_until_ready(); print("single after device_put:", (time.perf_counter()-t0)*1e3)
