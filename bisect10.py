import time, dataclasses
import jax, jax.numpy as jnp
import numpy as np
from raytracer795_tpu.scene.loader import load_scene
from raytracer795_tpu.models import camera as camera_model
from raytracer795_tpu.ops import intersect

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

loaded = load_scene("tests/scenes/cornellbox_pt.xml")
scene_dev = jax.tree_util.tree_map(jnp.asarray, loaded.scene)
cam = dataclasses.replace(loaded.cameras[0], nx=512, ny=512, num_samples=1, grid=1)
rays = jax.tree_util.tree_map(jnp.asarray, jax.jit(lambda: camera_model.primary_rays(cam))())

tf = jax.jit(intersect.trace)
t0 = time.perf_counter(); jax.block_until_ready(tf(scene_dev, rays)); print("trace(arg) compile:", time.perf_counter()-t0)
print("add after:", timeit(add1, x, y))
print("trace(arg) steady:", timeit(tf, scene_dev, rays))
print("add after steady:", timeit(add1, x, y))
