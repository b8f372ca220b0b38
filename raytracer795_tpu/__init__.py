"""raytracer795_tpu — a TPU-native (JAX/XLA/Pallas) differentiable ray tracer.

A from-scratch reimplementation of the capability set of the reference C++
renderer badiba/raytracer-795 (CENG 795 coursework ray tracer), redesigned
TPU-first:

- scenes are pytrees of device arrays (SoA), not object graphs;
- rays are wavefront batches shaped [N] / [H, W, S], not per-pixel recursion;
- the Whitted integrator is an iterative masked-lane machine, the path tracer
  a bounce loop with throughput and NEE;
- BVH traversal runs as a vectorized stackless walk over a flattened node
  array (with a Pallas kernel fast path);
- multi-chip scaling uses jax.sharding meshes + shard_map, not threads.

Reference behavior contracts are cited per module as ``src/<file>:<lines>``
(paths into the reference repo).
"""

import jax as _jax

# Ray-geometry math must stay full float32: never let small matmuls fall to
# the MXU's bf16 default.
_jax.config.update("jax_default_matmul_precision", "float32")

from raytracer795_tpu.scene.loader import load_scene
from raytracer795_tpu.render import render_scene, render_camera

__version__ = "0.1.0"

__all__ = [
    "load_scene",
    "render_scene",
    "render_camera",
]
