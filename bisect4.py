import time
import jax, jax.numpy as jnp

def t(fn, *a, reps=20):
    jf = jax.jit(fn)
    jax.block_until_ready(jf(*a))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter(); jax.block_until_ready(jf(*a)); best = min(best, time.perf_counter()-t0)
    return best*1e3

N = 512*512
x = jnp.ones((N,)); y = jnp.ones((N,))
print("baseline add:", t(lambda a, b: a + b, x, y))

import raytracer795_tpu  # noqa
print("after pkg import:", t(lambda a, b: a + b, x, y))

from raytracer795_tpu.scene.loader import load_scene
loaded = load_scene("tests/scenes/cornellbox_pt.xml")
print("after scene load:", t(lambda a, b: a + b, x, y))

import dataclasses
from raytracer795_tpu.models import camera as camera_model
cam = dataclasses.replace(loaded.cameras[0], nx=512, ny=512, num_samples=1, grid=1)
rays = jax.tree_util.tree_map(jnp.asarray, jax.jit(lambda: camera_model.primary_rays(cam))())
print("after rays:", t(lambda a, b: a + b, x, y))
print("rays add:", t(lambda r: r.o.x + r.time, rays))
print("rays devices:", rays.o.x.devices(), rays.time.devices())

from raytracer795_tpu.ops import intersect
scene = loaded.scene
hitf = jax.jit(lambda r: intersect.trace(scene, r))
import time as _t
t0=_t.perf_counter(); hit = jax.block_until_ready(hitf(rays)); print("trace compile+run:", _t.perf_counter()-t0)
print("trace steady:", t(lambda r: intersect.trace(scene, r), rays))
print("add after trace:", t(lambda a, b: a + b, x, y))
print("rays add after trace:", t(lambda r: r.o.x + r.time, rays))
