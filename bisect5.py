import sys, time
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
x = jnp.ones((N,)); y = jnp.zeros((N,))
print("baseline:", t(lambda a, b: a + b, x, y))

which = sys.argv[1]
if which == "inf":
    f = lambda a: jnp.minimum(jnp.full((N,), jnp.inf), a)
elif which == "div0":
    f = lambda a, b: a / b          # 1/0 = inf
elif which == "divwhere":
    f = lambda a, b: jnp.where(b > 0, a / b, 0.0)
elif which == "big":
    f = lambda a: jnp.where(a > 2.0, a, jnp.float32(3e38))
elif which == "nan":
    f = lambda a, b: (a - a) / b    # 0/0 = NaN? b=0 -> nan
elif which == "gather":
    idx = jnp.zeros((N,), jnp.int32)
    f = lambda a: a[idx]
elif which == "while":
    def f(a):
        def cond(s): return s[0] < 5
        def body(s): return (s[0]+1, s[1]*1.5)
        return jax.lax.while_loop(cond, body, (0, a))[1]
elif which == "tri":
    av = jnp.ones((3,)); 
    def f(a):
        acc = a
        for i in range(12):
            acc = acc * 1.0001 + float(i)
        return acc
else:
    raise SystemExit("unknown")

if which == "div0":
    out = jax.block_until_ready(jax.jit(f)(x, y))
elif which in ("nan", "divwhere"):
    out = jax.block_until_ready(jax.jit(f)(x, y))
else:
    out = jax.block_until_ready(jax.jit(f)(x))
print(which, "ran; sample:", np.asarray(jax.tree_util.tree_leaves(out)[0][:1]))
print("add after:", t(lambda a, b: a + b, x, y))
