import time, dataclasses, jax, jax.numpy as jnp
from raytracer795_tpu.scene.loader import load_scene
from raytracer795_tpu.models import camera as camera_model
from raytracer795_tpu.ops import intersect

loaded = load_scene("tests/scenes/cornellbox_pt.xml")
scene = loaded.scene
group = scene.groups[0]
cam = dataclasses.replace(loaded.cameras[0], nx=800, ny=800, num_samples=1, grid=1)
rays = jax.tree.map(jnp.asarray, camera_model.primary_rays(cam))

def timeit(f, *args, reps=5):
    jf = jax.jit(f)
    jax.block_until_ready(jf(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); jax.block_until_ready(jf(*args)); ts.append(time.perf_counter()-t0)
    return min(ts)*1e3

# 1. just transform rays (identity here)
print("xform:", timeit(lambda r: intersect._transform_rays(group, r), rays), "ms")
# 2. bbox pass only
def f2(r):
    local = intersect._transform_rays(group, r)
    return intersect._bbox_pass(group, local)
print("bbox:", timeit(f2, rays), "ms")
# 3. tri candidates without bbox mask
def f3(r):
    local = intersect._transform_rays(group, r)
    N = local.o.shape[0]
    bbox_ok = jnp.ones((N, group.obj_bbox.shape[0] + 1), bool)
    return intersect._tri_candidates(scene, group, local, bbox_ok)
print("tri(no real bbox):", timeit(f3, rays), "ms")
# 4. everything but division-by-zero patterns? replicate with det guard
# 5. spheres alone
def f5(r):
    local = intersect._transform_rays(group, r)
    return intersect._sphere_candidates(scene, group, local)
print("spheres:", timeit(f5, rays), "ms")
