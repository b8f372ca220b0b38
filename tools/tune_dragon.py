"""One-config dragon-frame timing probe (tuning harness, not a bench).

Prints a single JSON line with the best-of-N frame time of the rock1800k
scene under the CURRENT RT795_* env (MULTI_BLOCK_ROWS, PACK_TRIS,
PACK_LEAF, ...). Drive it from a shell loop to A/B kernel parameters on
the real chip; bench_mesh.py stays the reportable benchmark.
"""

import dataclasses
import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SCENES = os.path.join(_HERE, "tests", "scenes")
sys.path.insert(0, _SCENES)

import make_assets  # noqa: E402

make_assets.ensure_rock(os.path.join(_SCENES, "rock1800k.ply"), 1350, 668)

from raytracer795_tpu import render as render_mod  # noqa: E402
from raytracer795_tpu.scene.loader import load_scene  # noqa: E402

res = int(os.environ.get("BENCH_RES", "800"))
reps = int(os.environ.get("TUNE_REPS", "5"))
loaded = load_scene(os.path.join(_SCENES, "rock1800k.xml"))
loaded.cameras[0] = dataclasses.replace(
    loaded.cameras[0], nx=res, ny=res, num_samples=1, grid=1)
render_mod.MAX_LANES = max(render_mod.MAX_LANES, res * res)

render_mod.render_camera(loaded, 0, seed=0, ldr=True)   # compile
best = float("inf")
for i in range(reps):
    t0 = time.perf_counter()
    render_mod.render_camera(loaded, 0, seed=i + 1, ldr=True)
    best = min(best, time.perf_counter() - t0)
print(json.dumps({
    "frame_s": round(best, 3),
    "multi_block_rows": os.environ.get("RT795_MULTI_BLOCK_ROWS", "16*"),
    "pack_tris": os.environ.get("RT795_PACK_TRIS", "64512*"),
    "pack_leaf": os.environ.get("RT795_PACK_LEAF", "72*"),
}))
