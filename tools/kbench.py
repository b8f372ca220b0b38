"""Stable multipack-kernel microbench: device-side repetition loop.

The tunneled single-chip box shows 2x wall-clock swings on per-launch
timing; wrapping R sequential kernel calls in one jitted fori_loop
amortizes dispatch/tunnel noise so kernel changes can be compared.

Usage: python tools/kbench.py [reps]   (env RT795_BLOCK_ROWS etc. apply)
"""
import os
import sys
import time
import dataclasses

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "tests", "scenes"))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jaxcomp"))

import jax
import jax.numpy as jnp
import numpy as np

from raytracer795_tpu.scene.loader import load_scene
from raytracer795_tpu.ops import intersect, pallas_bvh
from raytracer795_tpu.models import camera as camera_model
from raytracer795_tpu.utils.vec3 import Vec3

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 5
HERE = os.path.dirname(os.path.abspath(__file__))
SCENE = os.path.join(HERE, "..", "tests", "scenes", "rock1800k.xml")


def timed(tag, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    per = best / REPS
    print(f"{tag}: {per*1e3:8.1f} ms/wavefront  (best-of-3 of {REPS} reps)")
    return per


def main():
    loaded = load_scene(SCENE)
    cam = dataclasses.replace(loaded.cameras[0], nx=800, ny=800,
                              num_samples=1, grid=1)
    scene = loaded.scene
    mp = scene.groups[0].bvh_pack
    rows = 320
    px, py = camera_model.band_pixels(cam.nx, rows)
    rays = camera_model.primary_rays_at(cam, jnp.asarray(px),
                                        jnp.asarray(py))
    N = rays.o.x.shape[0]
    eps = scene.int_eps

    # chain each rep's input through the previous result (x tiny) so XLA
    # cannot hoist the loop-invariant kernel call out of the fori_loop
    @jax.jit
    def rep_nearest(o, d):
        def body(i, acc):
            o2 = Vec3(o.x + acc * 1e-38, o.y, o.z)
            k, t, idx = pallas_bvh.tri_bvh_nearest_multi(
                mp, o2, d, eps)
            return t[0] + jnp.float32(idx[0])
        return jax.lax.fori_loop(0, REPS, body, 0.0)

    @jax.jit
    def rep_anyhit(o, d, cap):
        def body(i, acc):
            o2 = Vec3(o.x + acc * 1e-38, o.y, o.z)
            f = pallas_bvh.tri_bvh_anyhit_multi(mp, o2, d, cap, eps)
            return jnp.float32(f[0])
        return jax.lax.fori_loop(0, REPS, body, 0.0)

    t_near = timed("nearest  primaries", rep_nearest, rays.o, rays.d)

    # realistic shadow wavefront: origins at primary hits, dir to light,
    # cap = light distance; miss lanes zero-direction (retired)
    hit = jax.jit(intersect.trace)(scene, rays)
    det = jax.jit(intersect.hit_details)(
        scene, rays, hit, intersect.compute_vertex_normals(scene))
    lp = np.asarray(scene.lights.point_pos[0])
    to_l = Vec3(lp[0] - det.point.x, lp[1] - det.point.y,
                lp[2] - det.point.z)
    dist = jnp.sqrt(to_l.x**2 + to_l.y**2 + to_l.z**2)
    inv = jnp.where(dist > 0, 1.0 / dist, 0.0)
    live = hit.valid
    sd = Vec3(*(jnp.where(live, c * inv, 0.0)
                for c in (to_l.x, to_l.y, to_l.z)))
    so = det.point + det.normal * scene.shadow_eps
    so = Vec3(*(jnp.where(live, c, 0.0) for c in (so.x, so.y, so.z)))
    cap = jnp.where(live, dist, 0.0)
    print(f"  shadow live frac {float(live.mean()):.3f}")
    t_sh = timed("anyhit   shadows  ", rep_anyhit, so, sd, cap)
    print(f"frame est (1 nearest + 2 shadow, x2 bands + xfer): "
          f"{2*(t_near + 2*t_sh):.2f} s + transfer")


if __name__ == "__main__":
    main()
