"""Scratch: bisect the trace slowdown on TPU (disposable)."""
import time, dataclasses
import jax, jax.numpy as jnp
from raytracer795_tpu.scene.loader import load_scene
from raytracer795_tpu.models import camera as camera_model
from raytracer795_tpu.ops import intersect
from raytracer795_tpu.utils.vec3 import Vec3

def t(fn, *a, reps=10):
    jf = jax.jit(fn)
    jax.block_until_ready(jf(*a))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter(); jax.block_until_ready(jf(*a)); best = min(best, time.perf_counter()-t0)
    return best*1e3

loaded = load_scene("tests/scenes/cornellbox_pt.xml")
scene = loaded.scene
cam = dataclasses.replace(loaded.cameras[0], nx=512, ny=512, num_samples=1, grid=1)
rays = jax.tree_util.tree_map(jnp.asarray, jax.jit(lambda: camera_model.primary_rays(cam))())
print("trace full:", t(lambda r: intersect.trace(scene, r), rays))

g = scene.groups[0]
local = rays  # no xform
print("bbox_pass:", t(lambda r: intersect._bbox_pass(g, r), rays))
bbox_ok = jax.jit(lambda r: intersect._bbox_pass(g, r))(rays)
print("tri_unrolled:", t(lambda r, b: intersect._tri_candidates_unrolled(scene, g, r, b), rays, bbox_ok))
print("spheres:", t(lambda r: intersect._sphere_candidates(scene, g, r), rays))
print("transform_rays:", t(lambda r: intersect._transform_rays(g, r), rays))

import numpy as np
scene_dev = jax.tree_util.tree_map(jnp.asarray, scene)
g2 = scene_dev.groups[0]
print("transform_rays dev-scene:", t(lambda r: intersect._transform_rays(g2, r), rays))
print("trace dev-scene:", t(lambda r: intersect.trace(scene_dev, r), rays))
# control: trivial fn on the rays pytree
print("trivial:", t(lambda r: r.o.x + r.time, rays))
