"""Per-wavefront timing probe on rock1800k: nearest vs shadow any-hit.

Times (a) the primary nearest wavefront, (b) one shadow any-hit wavefront
per light from the primary hit points — the components of the dragon
frame — each jitted standalone and best-of-N. Tuning tool, not a bench.
"""

import dataclasses
import functools
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SCENES = os.path.join(_HERE, "tests", "scenes")
sys.path.insert(0, _SCENES)

import make_assets  # noqa: E402

make_assets.ensure_rock(os.path.join(_SCENES, "rock1800k.ply"), 1350, 668)

from raytracer795_tpu.models import camera as camera_model  # noqa: E402
from raytracer795_tpu.ops import intersect  # noqa: E402
from raytracer795_tpu.scene.loader import load_scene  # noqa: E402
from raytracer795_tpu.utils.vec3 import Vec3, vnorm  # noqa: E402

res = int(os.environ.get("BENCH_RES", "800"))
reps = int(os.environ.get("TUNE_REPS", "5"))
loaded = load_scene(os.path.join(_SCENES, "rock1800k.xml"))
loaded.cameras[0] = dataclasses.replace(
    loaded.cameras[0], nx=res, ny=res, num_samples=1, grid=1)
scene = loaded.scene
cam = loaded.cameras[0]

px, py = camera_model.band_pixels(cam.nx, cam.ny)
rays = camera_model.primary_rays_at(cam, jnp.asarray(px), jnp.asarray(py))


@jax.jit
def nearest(rays):
    hit = intersect.trace(scene, rays)
    return hit.t, hit.valid, hit.prim


@functools.partial(jax.jit, static_argnums=(1,))
def shadow(rays, li):
    hit = intersect.trace(scene, rays)
    vn = intersect.compute_vertex_normals(scene)
    det = intersect.hit_details(scene, rays, hit, vn)
    pos = scene.lights.point_pos[li]
    topoint = Vec3(pos[0] - det.point.x, pos[1] - det.point.y,
                   pos[2] - det.point.z)
    d_light = vnorm(topoint)
    wi = topoint * (1.0 / d_light)
    zero = Vec3.zeros(rays.time.shape)
    wi = Vec3(jnp.where(hit.valid, wi.x, 0.0),
              jnp.where(hit.valid, wi.y, 0.0),
              jnp.where(hit.valid, wi.z, 0.0))
    o = det.point + det.normal * scene.shadow_eps
    srays = intersect.Rays(o=o, d=wi, time=rays.time)
    return intersect.trace_anyhit(scene, srays, d_light)


def best_of(fn, *a):
    fn(*a)[0].block_until_ready() if isinstance(fn(*a), tuple) else \
        jax.block_until_ready(fn(*a))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*a))
        best = min(best, time.perf_counter() - t0)
    return best


t_near = best_of(nearest, rays)
t_sh0 = best_of(shadow, rays, 0)
t_sh1 = best_of(shadow, rays, 1)
print(json.dumps({
    "nearest_ms": round(t_near * 1e3, 1),
    "shadow0_minus_trace_ms": round((t_sh0 - t_near) * 1e3, 1),
    "shadow1_minus_trace_ms": round((t_sh1 - t_near) * 1e3, 1),
    "multi_block_rows": os.environ.get("RT795_MULTI_BLOCK_ROWS", "16*"),
    "pack_tris": os.environ.get("RT795_PACK_TRIS", "64512*"),
}))
