"""Perlin noise with the reference's exact tables and weight function.

Behavior contract (src/Perlin.cpp):
- 16-entry gradient table and the hardcoded shuffle permutation
  {12,7,15,6,11,0,4,9,13,3,14,8,2,5,1,10} (src/Perlin.cpp:4-25);
- weight(x) = -6|x|^5 + 15|x|^4 - 10|x|^3 + 1 — note this is 1 - fade(|x|),
  NOT the classic fade; preserved deliberately (src/Perlin.cpp:27-30);
- lattice hash: shuffled[(x + shuffled[(y + shuffled[z mod 16]) mod 16]) mod 16]
  with non-negative mod (src/Perlin.cpp:86-97);
- noise conversions: linear -> (v+1)/2, absval -> |v| (src/Perlin.cpp:76-81);
- bump gradient via forward differences with eps=0.001 (src/Perlin.cpp:36-50).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from raytracer795_tpu.scene import types as T

_TABLE = np.array([
    [1, 1, 0], [-1, 1, 0], [1, -1, 0], [-1, -1, 0],
    [1, 0, 1], [-1, 0, 1], [1, 0, -1], [-1, 0, -1],
    [0, 1, 1], [0, -1, 1], [0, 1, -1], [0, -1, -1],
    [1, 1, 0], [-1, 1, 0], [0, -1, 1], [0, -1, -1],
], np.float32)

_SHUFFLED = np.array([12, 7, 15, 6, 11, 0, 4, 9, 13, 3, 14, 8, 2, 5, 1, 10],
                     np.int32)

_EPS = 0.001


def _weight(x: jnp.ndarray) -> jnp.ndarray:
    x = jnp.abs(x)
    return ((-6.0) * x**5) + (15.0 * x**4) - (10.0 * x**3) + 1.0


def _hash(lattice: jnp.ndarray) -> jnp.ndarray:
    """lattice [..., 3] int32 -> gradient index [...]."""
    shuffled = jnp.asarray(_SHUFFLED)
    h = shuffled[jnp.mod(lattice[..., 2], 16)]
    h = shuffled[jnp.mod(lattice[..., 1] + h, 16)]
    return shuffled[jnp.mod(lattice[..., 0] + h, 16)]


def perlin(p: jnp.ndarray, scale, nc: int) -> jnp.ndarray:
    """Noise value for points p [..., 3] (src/Perlin.cpp:52-84)."""
    table = jnp.asarray(_TABLE)
    point = p * scale
    base = jnp.floor(point).astype(jnp.int32)       # [..., 3]
    value = jnp.zeros(p.shape[:-1], p.dtype)
    for i in range(2):
        for j in range(2):
            for k in range(2):
                lattice = base + jnp.asarray([i, j, k], jnp.int32)
                grad = table[_hash(lattice)]        # [..., 3]
                rel = point - lattice.astype(point.dtype)
                w = _weight(rel[..., 0]) * _weight(rel[..., 1]) * _weight(rel[..., 2])
                value = value + jnp.sum(grad * rel, axis=-1) * w
    if nc == T.NC_LINEAR:
        value = (value + 1.0) * 0.5
    elif nc == T.NC_ABSVAL:
        value = jnp.abs(value)
    return value


def perlin_gradient(p: jnp.ndarray, scale, nc: int) -> jnp.ndarray:
    """Forward-difference gradient, eps=0.001 (src/Perlin.cpp:36-50).

    Kept finite-difference (not autodiff) for bit-level parity with the
    reference's bump mapping.
    """
    v0 = perlin(p, scale, nc)
    grads = []
    for axis in range(3):
        dp = p.at[..., axis].add(_EPS)
        grads.append((perlin(dp, scale, nc) - v0) / _EPS)
    return jnp.stack(grads, axis=-1)
