"""Vectorized camera ray generation (lane-major Vec3 output).

One broadcasted computation produces every primary/sample ray of a frame
([H*W*S] component SoA), replacing the per-pixel loops of
src/Camera.cpp:63-139 and src/Scene.cpp:365-411. RNG is counter-based
(jax.random over a fold_in'd key) instead of the reference's shared mt19937
— statistically equivalent jittered sampling, deterministic per (key, frame).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from raytracer795_tpu.ops.intersect import Rays
from raytracer795_tpu.scene.types import Camera
from raytracer795_tpu.utils.vec3 import Vec3, vdot, vnormalize


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
    ub = jnp.broadcast_to(u[None, :], (n_rows, nx)).reshape(-1)
    vb = jnp.broadcast_to(v[:, None], (n_rows, nx)).reshape(-1)
    pos = np.asarray(cam.pos, np.float32)
    gaze = np.asarray(cam.gaze, np.float32)
    right = np.asarray(cam.right, np.float32)
    up = np.asarray(cam.up, np.float32)
    m = Vec3(
        pos[0] + gaze[0] * cam.near_distance + ub * right[0] + vb * up[0],
        pos[1] + gaze[1] * cam.near_distance + ub * right[1] + vb * up[1],
        pos[2] + gaze[2] * cam.near_distance + ub * right[2] + vb * up[2])
    d = vnormalize(m - Vec3(pos[0], pos[1], pos[2]))
    n = nx * n_rows
    o = Vec3(jnp.full((n,), pos[0]), jnp.full((n,), pos[1]),
             jnp.full((n,), pos[2]))
    return Rays(o=o, d=d, time=jnp.zeros((n,)))


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
    pos = np.asarray(cam.pos, np.float32)
    right = np.asarray(cam.right, np.float32)
    up = np.asarray(cam.up, np.float32)
    gaze = np.asarray(cam.gaze, np.float32)

    pw = (cam.right_edge - cam.left) / nx
    ph = (cam.top - cam.bottom) / cam.ny
    sw, sh = pw / g, ph / g

    # pixel lower-bottom corners (PixelLBCorner, src/Camera.cpp:84-92)
    u = cam.left + jnp.arange(nx) * pw                      # [nx]
    v = cam.top - (row0 + jnp.arange(ny) + 1) * ph          # [band rows]
    ub = jnp.broadcast_to(u[None, :, None], (ny, nx, S))
    vb = jnp.broadcast_to(v[:, None, None], (ny, nx, S))

    s = base + jnp.arange(S)
    si = (s % g).astype(jnp.float32)                        # [S]
    sj = (s // g).astype(jnp.float32)

    chi = jax.random.uniform(key, (5, ny, nx, S))
    ju = ub + (si[None, None, :] + chi[0]) * sw             # [ny, nx, S]
    jv = vb + (sj[None, None, :] + chi[1]) * sh
    m = Vec3(pos[0] + gaze[0] * cam.near_distance + ju * right[0] + jv * up[0],
             pos[1] + gaze[1] * cam.near_distance + ju * right[1] + jv * up[1],
             pos[2] + gaze[2] * cam.near_distance + ju * right[2] + jv * up[2])
    posv = Vec3(pos[0], pos[1], pos[2])
    d = vnormalize(m - posv)                                # [ny, nx, S] x3

    if cam.is_dof:
        lu = cam.aperture_size * (chi[2] - 0.5)
        lv = cam.aperture_size * (chi[3] - 0.5)
        q = Vec3(pos[0] + lu * right[0] + lv * up[0],
                 pos[1] + lu * right[1] + lv * up[1],
                 pos[2] + lu * right[2] + lv * up[2])
        gz = Vec3(gaze[0], gaze[1], gaze[2])
        t_fd = cam.focus_distance / vdot(d, gz)
        p = posv + d * t_fd
        d = vnormalize(p - q)
        o = q
        time = jnp.zeros((ny, nx, S))
    else:
        o = Vec3(jnp.broadcast_to(pos[0], d.shape),
                 jnp.broadcast_to(pos[1], d.shape),
                 jnp.broadcast_to(pos[2], d.shape))
        time = chi[4]

    n = ny * nx * S
    flat = lambda a: a.reshape(n)
    return Rays(o=Vec3(flat(o.x), flat(o.y), flat(o.z)),
                d=Vec3(flat(d.x), flat(d.y), flat(d.z)),
                time=time.reshape(n))
