"""Dragon-scale benchmark: rays/sec through the Pallas BVH kernels.

Prints TWO JSON lines like bench.py's:
  1. the 101k-triangle rock100k scene (single VMEM pack),
  2. the 1,800,900-triangle rock1800k scene (multi-pack HBM streaming —
     the scale of the reference's flagship dragon, pages/Page2.md:57:
     1.8M tris in 2.756 s on the author's laptop; the compiled reference
     renders our rock1800k scene in 7.2 s on this box).
Each frame traces one nearest-hit wavefront plus two any-hit shadow
wavefronts per depth (Whitted, depth 2, two point lights).
``vs_baseline`` compares against the same chip target as bench.py (north
star 100M rays/s per v5e host / 8 chips).

Run: python bench_mesh.py   (BENCH_RES overrides the 800x800 default;
BENCH_DRAGON=0 skips the 1.8M scene)
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

import jax

_HERE = os.path.dirname(os.path.abspath(__file__))
_SCENES = os.path.join(_HERE, "tests", "scenes")

RES = int(os.environ.get("BENCH_RES", "800"))
# spp amortizes the per-frame film transfer (fixed bytes) over 4x the
# traced rays — the reference's own dragon-class workloads are 100 spp
# (pages/Page3.md:77); at 1 spp this box's slow device->host tunnel
# (~10-25 MB/s), not the chip, bounds the measurement.
SPP = int(os.environ.get("BENCH_SPP", "4"))
CHIP_BASELINE_RAYS_PER_S = 100e6 / 8.0


def bench_scene(xml_name: str, label: str, res: int, spp: int,
                one_launch: bool = False) -> None:
    from raytracer795_tpu import render as render_mod
    from raytracer795_tpu.scene.loader import load_scene

    g = 1
    while g * g < spp:
        g += 1
    loaded = load_scene(os.path.join(_SCENES, xml_name))
    loaded.cameras[0] = dataclasses.replace(
        loaded.cameras[0], nx=res, ny=res, num_samples=spp, grid=g)
    scene = loaded.scene
    n_tris = sum(gr.n_tris for gr in scene.groups)

    # This box's tunneled chip pays a large, highly variable per-launch +
    # per-transfer cost (measured 65 ms..3.9 s for the SAME compiled
    # 1.8M-tri frame minutes apart). ``one_launch`` renders the whole
    # frame in a single device launch so a frame pays that tax once, and
    # the rep count is raised so the best-of catches a quiet window.
    old_lanes = render_mod.MAX_LANES
    if one_launch and "RT795_MAX_LANES" not in os.environ:
        render_mod.MAX_LANES = max(old_lanes, res * res * spp)

    n_lights = int(scene.lights.point_pos.shape[0])
    lanes = res * res * spp
    # per depth level: 1 nearest wavefront + one any-hit per light
    rays_per_frame = lanes * scene.max_depth * (1 + n_lights)

    img = render_mod.render_camera(loaded, 0, seed=0, spp=spp,
                                   ldr=True)   # compile
    best = float("inf")
    for i in range(6):
        t0 = time.perf_counter()
        img = render_mod.render_camera(loaded, 0, seed=i + 1, spp=spp,
                                       ldr=True)
        best = min(best, time.perf_counter() - t0)
    render_mod.MAX_LANES = old_lanes

    del img
    net_rays = render_mod.count_net_rays(loaded, 0, seed=1, spp=spp)
    render_mod.log_render_stats(scene, loaded.cameras[0], best, spp,
                                net_rays=net_rays)
    value = rays_per_frame / best
    net_value = net_rays / best
    print(json.dumps({
        "metric": f"rays/s/chip ({label} {n_tris} tris, Whitted {res}x{res}"
                  f" {spp}spp, depth {scene.max_depth},"
                  f" {n_lights} shadow lights, Pallas BVH)",
        "value": round(value, 1),
        "unit": "rays/s",
        "vs_baseline": round(value / CHIP_BASELINE_RAYS_PER_S, 4),
        "net_rays_per_s": round(net_value, 1),
        "net_vs_baseline": round(net_value / CHIP_BASELINE_RAYS_PER_S, 4),
        "frame_seconds": round(best, 3),
    }))


def main() -> None:
    bench_scene("rock100k.xml", "rock100k", RES, SPP)
    if os.environ.get("BENCH_INSTANCES", "1") != "0":
        # 36 MeshInstances + base share one kernel pack -> batched into
        # single traversal launches (RT795_BATCH_INSTANCES=0 for the
        # per-group-launch A/B). Same 800x800 4spp config as rock100k:
        # at 400x400 1spp the frame is fixed launch/transfer overhead,
        # not traversal (measured 4.8M vs 23.3M rays/s gross).
        bench_scene("instances_rock.xml", "instances_rock 37-group", RES,
                    SPP, one_launch=True)
    if os.environ.get("BENCH_DRAGON", "1") != "0":
        sys.path.insert(0, _SCENES)
        import make_assets

        make_assets.ensure_rock(os.path.join(_SCENES, "rock1800k.ply"),
                                1350, 668)
        bench_scene("rock1800k.xml", "rock1800k/dragon-scale", RES, 1,
                    one_launch=True)


if __name__ == "__main__":
    main()
