"""Multi-host SPMD rendering: process bootstrap + per-host film assembly.

The reference has no multi-host story (8 POSIX threads on one box,
src/Scene.cpp:340-356); this is the TPU-native scale-out layer on top of
parallel/shard.py's SPMD render:

- ``initialize()`` wires the JAX distributed runtime (one process per host,
  all chips of all hosts become ``jax.devices()``); single-process runs are
  a no-op so every entry point works unchanged on one box.
- ``render_camera_distributed()`` renders one camera with the flat
  pixel/sample lane axis sharded over EVERY device of every host: each
  process launches the same SPMD program, computes only its addressable
  shard of the film, and host 0 assembles the full image via a
  process-level allgather (the collectives ride ICI within a host's chips
  and DCN across hosts — XLA inserts them from the shard_map specs).

Work splits lane-contiguously (block sharding): wavefront lanes cost
near-uniform time (fixed-depth masked math), so block tiles keep the film
assembly a reshape — the same reasoning as shard.py vs the reference's
modulo interleave (pages/Page3.md:101).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from raytracer795_tpu.models import camera as camera_model
from raytracer795_tpu.parallel import shard as par
from raytracer795_tpu.render import _background_radiance, _pixel_uv
from raytracer795_tpu.scene import types as T


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> int:
    """Bring up the JAX distributed runtime; returns this process' id.

    Arguments default to the standard env vars (JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID), which jax.distributed.initialize
    also reads on TPU pods from the metadata server. With no coordinator
    configured (single host) this is a no-op returning 0.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if coordinator_address is None and num_processes is None \
            and "JAX_NUM_PROCESSES" not in os.environ:
        return 0        # single-process: nothing to initialize
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)
    return jax.process_index()


def _pad_lanes(rays, multiple: int):
    """Pad the lane axis with NaN rays (matched nothing, masked math)."""
    n = rays.o.x.shape[0]
    pad = (-n) % multiple
    if pad == 0:
        return rays, n

    def padf(x):
        return jnp.concatenate([x, jnp.full((pad,), jnp.nan, x.dtype)])

    return jax.tree_util.tree_map(padf, rays), n


def render_camera_distributed(loaded: T.LoadedScene, cam_index: int = 0,
                              seed: int = 0, mesh=None) -> np.ndarray:
    """Render one camera over all devices of all processes -> [ny, nx, 3].

    Every process returns the fully assembled film (an allgather of the
    per-device tiles); on a single process this degenerates to the local
    sharded render. Single-spp center-ray sampling (the reference's
    SingleSample contract); the spp axis is folded into lanes by callers
    that need it, exactly as render.py does.
    """
    scene = loaded.scene
    cam = loaded.cameras[cam_index]
    if mesh is None:
        mesh = par.make_ray_mesh()
    n_dev = mesh.devices.size
    key = jax.random.PRNGKey(seed)

    # bg is computed on the UNPADDED rays (pixel_uv has nx*ny lanes) and
    # padded alongside them — computing it after padding crashed on
    # bg-textured scenes whose pixel count isn't divisible by n_dev.
    rays0 = camera_model.primary_rays(cam)
    bg = _background_radiance(
        scene, rays0, _pixel_uv(cam.nx, cam.ny, 1), True)
    bga = jnp.nan_to_num(bg.to_array().reshape(-1, 3))
    rays, n_lanes = _pad_lanes(rays0, n_dev)
    pad = rays.o.x.shape[0] - n_lanes
    if pad:
        bga = jnp.concatenate([bga, jnp.zeros((pad, 3), bga.dtype)])

    img = par.render_rays_sharded(scene, rays, bga, key, mesh)

    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        img = multihost_utils.process_allgather(img, tiled=True)
    film = np.asarray(img)[:n_lanes].reshape(cam.ny, cam.nx, 3)
    return film


def main(argv=None):
    """CLI: python -m raytracer795_tpu.parallel.distributed scene.xml

    One process per host (launch identically on every host with the
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID env vars
    set); host 0 writes the images.
    """
    import argparse

    from raytracer795_tpu.scene.loader import load_scene
    from raytracer795_tpu.utils import image_io

    ap = argparse.ArgumentParser(description="multi-host SPMD renderer")
    ap.add_argument("scene")
    ap.add_argument("-o", "--out-dir", default=".")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    pid = initialize()
    loaded = load_scene(args.scene)
    os.makedirs(args.out_dir, exist_ok=True)
    for i, cam in enumerate(loaded.cameras):
        film = render_camera_distributed(loaded, i, seed=args.seed)
        if pid == 0:
            path = os.path.join(args.out_dir, cam.image_name)
            image_io.save_image(path, film)
            print(f"[distributed] {cam.image_name}: {cam.nx}x{cam.ny} "
                  f"on {jax.device_count()} devices / "
                  f"{jax.process_count()} processes")


if __name__ == "__main__":
    main()
