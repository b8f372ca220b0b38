"""Texture sampling and decal application.

Sampling contract (src/Texture.cpp:41-131): wrap uv by u-floor(u), scale by
width/height, clamp pixel fetches to the image, nearest = int truncation,
bilinear = 4-tap with fractional weights. Images store raw source values
(bytes 0..255 for LDR, radiance floats for EXR).

Decal application (src/Shape.cpp:400-616): per hit, the object's (up to two)
textures apply in order; replace_kd/blend_kd/replace_all set the hit's
diffuse-replacement color + normalizer, replace_normal/bump_normal rewrite
the shading normal via TBN / derivative math, perlin variants use the noise
field at the local hit point.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from raytracer795_tpu.ops import perlin as perlin_ops
from raytracer795_tpu.ops.intersect import HitDetails
from raytracer795_tpu.scene import types as T
from raytracer795_tpu.utils.vecmath import (dot, masked_normalize, mat3_apply,
                                            normalize)


class TexturedHit(NamedTuple):
    dm: jnp.ndarray             # [N] int32 decal mode for diffuse (DECAL_*)
    tex_color: jnp.ndarray      # [N, 3]
    tex_normalizer: jnp.ndarray  # [N]
    normal: jnp.ndarray         # [N, 3] possibly rewritten by normal maps


def sample_image(tex: T.Texture, uv: jnp.ndarray) -> jnp.ndarray:
    """GetColorAtCoordinates (src/Texture.cpp:111-131). uv [N,2] -> [N,3]."""
    img = tex.image
    h, w = img.shape[0], img.shape[1]
    u = uv[:, 0] - jnp.floor(uv[:, 0])
    v = uv[:, 1] - jnp.floor(uv[:, 1])
    i = u * w
    j = v * h

    def fetch(ii, jj):
        ii = jnp.clip(ii, 0, w - 1)
        jj = jnp.clip(jj, 0, h - 1)
        return img[jj, ii]

    if tex.interp == T.INTERP_NN:
        return fetch(i.astype(jnp.int32), j.astype(jnp.int32))
    i0 = jnp.floor(i).astype(jnp.int32)
    j0 = jnp.floor(j).astype(jnp.int32)
    a = (i - i0)[:, None]
    b = (j - j0)[:, None]
    return ((1 - a) * (1 - b) * fetch(i0, j0)
            + (1 - a) * b * fetch(i0, j0 + 1)
            + a * (1 - b) * fetch(i0 + 1, j0)
            + a * b * fetch(i0 + 1, j0 + 1))


def sample_gradient(tex: T.Texture, uv: jnp.ndarray) -> jnp.ndarray:
    """GetChangeAtCoordinates (src/Texture.cpp:76-109): (du, dv) [N,2]."""
    img = tex.image
    h, w = img.shape[0], img.shape[1]
    u = uv[:, 0] - jnp.floor(uv[:, 0])
    v = uv[:, 1] - jnp.floor(uv[:, 1])
    i = jnp.clip((u * w).astype(jnp.int32), 0, w - 2)
    j = jnp.clip((v * h).astype(jnp.int32), 0, h - 2)

    def fetch(ii, jj):
        ii = jnp.clip(ii, 0, w - 1)
        jj = jnp.clip(jj, 0, h - 1)
        return img[jj, ii]

    c00 = fetch(i, j)
    du = jnp.mean(fetch(i + 1, j), axis=-1) - jnp.mean(c00, axis=-1)
    dv = jnp.mean(fetch(i, j + 1) - c00, axis=-1)
    return jnp.stack([du, dv], axis=-1)


def _sphere_dp(det: HitDetails):
    """Sphere dpdu/dpdv at the hit (src/Shape.cpp:430-433)."""
    lc = det.local_point - det.local_center
    pi = jnp.pi
    sel = det.valid & det.is_sphere
    cos_t = jnp.clip(lc[:, 1] / jnp.where(det.radius > 0, det.radius, 1.0),
                     -1.0, 1.0)
    # double-where: dead lanes clip to +/-1 where arccos' grad is infinite
    theta = jnp.arccos(jnp.where(sel, cos_t, 0.0))
    phi = jnp.arctan2(lc[:, 2], jnp.where(sel, lc[:, 0], 1.0))
    dpdu = jnp.stack([lc[:, 2] * 2 * pi,
                      jnp.zeros_like(phi),
                      lc[:, 0] * (-2) * pi], axis=-1)
    dpdv = jnp.stack([lc[:, 1] * jnp.cos(phi) * pi,
                      (-1.0) * det.radius * jnp.sin(theta) * pi,
                      lc[:, 1] * jnp.sin(phi) * pi], axis=-1)
    return dpdu, dpdv


def _tri_tb(det: HitDetails):
    """Triangle tangent/bitangent from the edge/UV system (src/Shape.cpp:535-543).

    Solves A @ TB = E with A = [[du1, dv1], [du2, dv2]], E = [e1; e2].
    """
    duv1 = det.tri_uv1 - det.tri_uv0
    duv2 = det.tri_uv2 - det.tri_uv0
    det_a = duv1[:, 0] * duv2[:, 1] - duv1[:, 1] * duv2[:, 0]
    # safe-div form (1/0 before the where would NaN the backward pass)
    ok = det_a != 0
    inv = jnp.where(ok, 1.0 / jnp.where(ok, det_a, 1.0), 0.0)[:, None]
    t_vec = (duv2[:, 1:2] * det.tri_e1 - duv1[:, 1:2] * det.tri_e2) * inv
    b_vec = (-duv2[:, 0:1] * det.tri_e1 + duv1[:, 0:1] * det.tri_e2) * inv
    return t_vec, b_vec


def apply_textures(scene: T.Scene, det: HitDetails) -> TexturedHit:
    """Run the hit's texture list, producing decal state + final normal.

    Statically loops over the scene's textures; each lane applies a texture
    iff its tex0/tex1 slot references it, mirroring the per-object texture
    loop of src/Shape.cpp:400-616 (slot order preserved: tex0 then tex1).
    Normal-map math operates on the LOCAL-space normal exactly as the
    reference does (its texture step runs inside the BVH, pre-transform);
    the world transform by (M^-1)^T is applied once at the end, matching
    src/Helper.cpp:75-78.
    """
    N = det.normal.shape[0]
    dm = jnp.full((N,), T.DECAL_NONE, jnp.int32)
    tex_color = jnp.zeros((N, 3))
    tex_norm = jnp.ones((N,))

    # All math below runs on the LOCAL-space normal; the reference textures
    # inside the per-object BVH step (src/Shape.cpp bvhIntersect) before the
    # world transform of the normal (src/Helper.cpp:75-78).
    cur_n = det.normal

    for slot in range(2):
        slot_ids = det.tex0 if slot == 0 else det.tex1
        for ti, tex in enumerate(scene.textures):
            decal, interp, ttype, nc = scene.texture_statics[ti]
            use = det.valid & (slot_ids == ti)
            if decal in (T.DECAL_NONE, T.DECAL_REPLACE_BACKGROUND):
                continue
            if ttype == T.TEX_IMAGE:
                if decal in (T.DECAL_REPLACE_KD, T.DECAL_BLEND_KD, T.DECAL_REPLACE_ALL):
                    color = sample_image(tex, det.uv)
                    dm = jnp.where(use, decal, dm)
                    tex_color = jnp.where(use[:, None], color, tex_color)
                    tex_norm = jnp.where(use, tex.normalizer, tex_norm)
                elif decal == T.DECAL_REPLACE_NORMAL:
                    rn = sample_image(tex, det.uv) / 255.0
                    rn = normalize(rn - 0.5)
                    dpdu_s, dpdv_s = _sphere_dp(det)
                    t_vec, b_vec = _tri_tb(det)
                    tt = jnp.where(det.is_sphere[:, None],
                                   normalize(dpdu_s), t_vec)
                    bb = jnp.where(det.is_sphere[:, None],
                                   normalize(dpdv_s), b_vec)
                    # TBN columns: T, B, N (src/Shape.cpp:438-443,548-553);
                    # sphere T/B are normalized, triangle T/B are NOT.
                    newn = (tt * rn[:, 0:1] + bb * rn[:, 1:2]
                            + cur_n * rn[:, 2:3])
                    cur_n = jnp.where(use[:, None], newn, cur_n)
                elif decal == T.DECAL_BUMP_NORMAL:
                    deriv = sample_gradient(tex, det.uv) * tex.bump_factor
                    dpdu_s, dpdv_s = _sphere_dp(det)
                    t_vec, b_vec = _tri_tb(det)
                    tt = jnp.where(det.is_sphere[:, None], dpdu_s, t_vec)
                    bb = jnp.where(det.is_sphere[:, None], dpdv_s, b_vec)
                    dpu = tt + deriv[:, 0:1] * cur_n
                    dpv = bb + deriv[:, 1:2] * cur_n
                    newn = normalize(jnp.cross(dpv, dpu))
                    # orient along the old normal (src/Shape.cpp:464-471)
                    flip = dot(cur_n, newn) < 0
                    newn = jnp.where(flip[:, None], -newn, newn)
                    cur_n = jnp.where(use[:, None], newn, cur_n)
            else:  # Perlin
                if decal == T.DECAL_REPLACE_KD:
                    val = perlin_ops.perlin(det.local_point, tex.noise_scale, nc)
                    dm = jnp.where(use, T.DECAL_REPLACE_KD, dm)
                    tex_color = jnp.where(use[:, None],
                                          jnp.stack([val] * 3, -1), tex_color)
                    tex_norm = jnp.where(use, 1.0, tex_norm)
                elif decal == T.DECAL_BUMP_NORMAL:
                    g = perlin_ops.perlin_gradient(det.local_point,
                                                   tex.noise_scale, nc)
                    g_par = dot(g, cur_n)[:, None] * cur_n
                    newn = cur_n - (g - g_par) * tex.bump_factor
                    flip = dot(cur_n, newn) < 0
                    newn = jnp.where(flip[:, None], -newn, newn)
                    newn = normalize(newn)
                    cur_n = jnp.where(use[:, None], newn, cur_n)

    # world transform of the (possibly rewritten) local normal:
    # n_world = normalize((M^-1)^T n) once per hit (src/Helper.cpp:75-78).
    # Miss lanes carry a zero local normal whose normalize() is NaN — safe
    # under the forward masks, fatal in reverse mode; substitute a unit
    # vector there (masked_normalize) so dead lanes stay finite end to end.
    world_n = masked_normalize(
        det.valid, jnp.sum(det.minv_t * cur_n[:, None, :], axis=-1))

    return TexturedHit(dm=dm, tex_color=tex_color, tex_normalizer=tex_norm,
                       normal=world_n)
