"""Dragon-scale benchmark: rays/sec through the Pallas BVH kernel.

Prints ONE JSON line like bench.py, for the 101k-triangle rock100k scene
(Whitted, depth 2, two point lights — so each frame traces one nearest-hit
wavefront plus two any-hit shadow wavefronts per depth). The reference
analogue is the hw2 dragon result (pages/Page2.md:57: 1.8M tris in 2.756 s
on 8 CPU threads). ``vs_baseline`` compares against the same chip target as
bench.py (north star 100M rays/s per v5e host / 8 chips).

Run: python bench_mesh.py   (BENCH_RES overrides the 800x800 default)
"""

from __future__ import annotations

import dataclasses
import json
import os
import time

import jax

_HERE = os.path.dirname(os.path.abspath(__file__))
_SCENE = os.path.join(_HERE, "tests", "scenes", "rock100k.xml")

RES = int(os.environ.get("BENCH_RES", "800"))
CHIP_BASELINE_RAYS_PER_S = 100e6 / 8.0


def main() -> None:
    from raytracer795_tpu import render as render_mod
    from raytracer795_tpu.scene.loader import load_scene

    loaded = load_scene(_SCENE)
    loaded.cameras[0] = dataclasses.replace(
        loaded.cameras[0], nx=RES, ny=RES, num_samples=1, grid=1)
    scene = loaded.scene
    n_tris = sum(g.n_tris for g in scene.groups)

    n_lights = int(scene.lights.point_pos.shape[0])
    lanes = RES * RES
    # per depth level: 1 nearest wavefront + one any-hit per light
    rays_per_frame = lanes * scene.max_depth * (1 + n_lights)

    img = render_mod.render_camera(loaded, 0, seed=0)     # compile
    best = float("inf")
    for i in range(3):
        t0 = time.perf_counter()
        img = render_mod.render_camera(loaded, 0, seed=i + 1)
        best = min(best, time.perf_counter() - t0)

    del img
    render_mod.log_render_stats(scene, loaded.cameras[0], best, 1)
    value = rays_per_frame / best
    print(json.dumps({
        "metric": f"rays/s/chip (rock100k {n_tris} tris, Whitted {RES}x{RES}"
                  f" 1spp, depth {scene.max_depth}, {n_lights} shadow lights,"
                  " Pallas BVH)",
        "value": round(value, 1),
        "unit": "rays/s",
        "vs_baseline": round(value / CHIP_BASELINE_RAYS_PER_S, 4),
    }))


if __name__ == "__main__":
    main()
