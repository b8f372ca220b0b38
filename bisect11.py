import time, dataclasses
import jax, jax.numpy as jnp
import numpy as np
from raytracer795_tpu.scene.loader import load_scene
from raytracer795_tpu.models import camera as camera_model
from raytracer795_tpu.ops import intersect

loaded = load_scene("tests/scenes/cornellbox_pt.xml")
scene_dev = jax.tree_util.tree_map(jnp.asarray, loaded.scene)
# any non-jnp leaves left?
leaves = jax.tree_util.tree_leaves(scene_dev)
print("leaves:", len(leaves), "np leaves:", sum(isinstance(l, np.ndarray) for l in leaves))
cam = dataclasses.replace(loaded.cameras[0], nx=512, ny=512, num_samples=1, grid=1)
rays = jax.tree_util.tree_map(jnp.asarray, jax.jit(lambda: camera_model.primary_rays(cam))())

t0 = time.perf_counter(); jx = jax.make_jaxpr(intersect.trace)(scene_dev, rays); print("make_jaxpr:", time.perf_counter()-t0, "eqns:", len(jx.eqns))
t0 = time.perf_counter(); lowered = jax.jit(intersect.trace).lower(scene_dev, rays); print("lower:", time.perf_counter()-t0)
t0 = time.perf_counter(); compiled = lowered.compile(); print("compile:", time.perf_counter()-t0)
t0 = time.perf_counter(); jax.block_until_ready(compiled(scene_dev, rays)); print("first run:", time.perf_counter()-t0)
def timeit(jf, *a, reps=10):
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter(); jax.block_until_ready(jf(*a)); best = min(best, time.perf_counter()-t0)
    return best*1e3
print("steady:", timeit(compiled, scene_dev, rays))
x = jnp.ones((512*512,)); y = jnp.zeros((512*512,))
print("add after:", timeit(jax.jit(lambda a,b:a+b), x, y))
