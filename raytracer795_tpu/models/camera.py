"""Vectorized camera ray generation.

One broadcasted computation produces every primary/sample ray of a frame
([H*W*S] SoA), replacing the per-pixel loops of src/Camera.cpp:63-139 and
src/Scene.cpp:365-411. RNG is counter-based (jax.random over a fold_in'd
key) instead of the reference's shared mt19937 — statistically equivalent
jittered sampling, deterministic per (key, frame).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from raytracer795_tpu.ops.intersect import Rays
from raytracer795_tpu.scene.types import Camera
from raytracer795_tpu.utils.vecmath import normalize


def primary_rays(cam: Camera, row0=0, n_rows: int | None = None) -> Rays:
    """Center-of-pixel rays, time 0 (getPrimaryRay, src/Camera.cpp:63-72).

    ``row0`` (traced ok) + static ``n_rows`` select a horizontal band so
    frames larger than the lane budget tile row-wise with one compilation.
    """
    nx, ny = cam.nx, cam.ny
    if n_rows is None:
        n_rows = ny
    x = (jnp.arange(nx) + 0.5) / nx
    y = (row0 + jnp.arange(n_rows) + 0.5) / ny
    u = cam.left + (cam.right_edge - cam.left) * x          # [nx]
    v = cam.top - (cam.top - cam.bottom) * y                # [n_rows]
    pos = jnp.asarray(cam.pos, jnp.float32)
    m = (pos[None, None]
         + jnp.asarray(cam.gaze, jnp.float32) * cam.near_distance
         + u[None, :, None] * jnp.asarray(cam.right, jnp.float32)
         + v[:, None, None] * jnp.asarray(cam.up, jnp.float32))  # [rows, nx, 3]
    d = normalize(m - pos)
    o = jnp.broadcast_to(pos, d.shape)
    n = nx * n_rows
    return Rays(o=o.reshape(n, 3), d=d.reshape(n, 3), time=jnp.zeros((n,)))


def sample_rays(cam: Camera, key: jax.Array) -> Rays:
    """All jittered sample rays of a frame: [ny*nx*S] SoA."""
    return sample_rays_range(cam, key, 0, cam.num_samples)


def sample_rays_range(cam: Camera, key: jax.Array, base, count: int,
                      row0=0, n_rows: int | None = None) -> Rays:
    """Jittered sample rays for sample indices [base, base+count).

    ``count`` is static (lane-count shape); ``base`` may be a traced scalar
    so one compiled program serves every sample chunk of a frame. ``row0``
    (traced) + static ``n_rows`` select a horizontal pixel band for frames
    larger than the lane budget.

    Grid placement per getSampleRay (src/Camera.cpp:94-113): sample s sits in
    sub-pixel cell (s % g, s // g) of a g x g grid (g = ceil-sqrt of S) with
    uniform jitter. With DoF the ray starts on the lens and gets time 0
    (src/Camera.cpp:119-139); otherwise time ~ U(0,1) for motion blur.
    """
    nx, S, g = cam.nx, count, cam.grid
    ny = cam.ny if n_rows is None else n_rows
    pos = jnp.asarray(cam.pos, jnp.float32)
    right = jnp.asarray(cam.right, jnp.float32)
    up = jnp.asarray(cam.up, jnp.float32)
    gaze = jnp.asarray(cam.gaze, jnp.float32)

    pw = (cam.right_edge - cam.left) / nx
    ph = (cam.top - cam.bottom) / cam.ny
    sw, sh = pw / g, ph / g

    # pixel lower-bottom corners (PixelLBCorner, src/Camera.cpp:84-92)
    u = cam.left + jnp.arange(nx) * pw                      # [nx]
    v = cam.top - (row0 + jnp.arange(ny) + 1) * ph          # [band rows]
    lb = (pos[None, None]
          + gaze * cam.near_distance
          + u[None, :, None] * right
          + v[:, None, None] * up)                          # [ny, nx, 3]

    s = base + jnp.arange(S)
    si = (s % g).astype(jnp.float32)                        # [S]
    sj = (s // g).astype(jnp.float32)

    chi = jax.random.uniform(key, (ny, nx, S, 5))
    m = (lb[:, :, None, :]
         + ((si[None, None, :] + chi[..., 0]) * sw)[..., None] * right
         + ((sj[None, None, :] + chi[..., 1]) * sh)[..., None] * up)
    d = normalize(m - pos)                                  # [ny, nx, S, 3]

    if cam.is_dof:
        q = (pos[None, None, None]
             + (cam.aperture_size * (chi[..., 2] - 0.5))[..., None] * right
             + (cam.aperture_size * (chi[..., 3] - 0.5))[..., None] * up)
        t_fd = cam.focus_distance / jnp.sum(d * gaze, axis=-1)
        p = pos + d * t_fd[..., None]
        d = normalize(p - q)
        o = q
        time = jnp.zeros((ny, nx, S))
    else:
        o = jnp.broadcast_to(pos, d.shape)
        time = chi[..., 4]

    n = ny * nx * S
    return Rays(o=o.reshape(n, 3), d=d.reshape(n, 3), time=time.reshape(n))
