import sys, time
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

mode = sys.argv[1]
if mode == "h2d":
    d = jnp.asarray(np.ones((N,), np.float32)); d.block_until_ready()
elif mode == "h2d_small":
    d = jnp.asarray(np.ones((4,), np.float32)); d.block_until_ready()
elif mode == "trace":
    from raytracer795_tpu.scene.loader import load_scene
    from raytracer795_tpu.models import camera as camera_model
    from raytracer795_tpu.ops import intersect
    import dataclasses
    loaded = load_scene("tests/scenes/cornellbox_pt.xml")
    scene = loaded.scene
    cam = dataclasses.replace(loaded.cameras[0], nx=512, ny=512, num_samples=1, grid=1)
    rays = jax.tree_util.tree_map(jnp.asarray, jax.jit(lambda: camera_model.primary_rays(cam))())
    print("add after scene+rays:", timeit(add1, x, y))
    tf = jax.jit(lambda r: intersect.trace(scene, r))
    t0 = time.perf_counter(); jax.block_until_ready(tf(rays)); print("trace compile:", time.perf_counter()-t0)
    print("add after trace compile+run:", timeit(add1, x, y))
    print("trace steady:", timeit(tf, rays))
print("add after:", timeit(add1, x, y))
