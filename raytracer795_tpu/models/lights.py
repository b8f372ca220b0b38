"""Direct lighting: ambient + per-light diffuse/specular/BRDF with shadows.

Contract: Light::BasicShading per type (src/Light.cpp:238-250, 309-321,
409-436, 522-545, 628-660) and Scene::BasicShading/ambient
(src/Scene.cpp:22-30, 243-267). Shadow rays re-enter the same wavefront
trace (one batched occlusion query per light).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from raytracer795_tpu.models.brdf import brdf_radiance
from raytracer795_tpu.ops import intersect
from raytracer795_tpu.ops.texture import sample_image
from raytracer795_tpu.scene import types as T
from raytracer795_tpu.utils.vecmath import (dot, norm, normalize,
                                            orthonormal_u, safe_normalize,
                                            safe_pow)

_sg = jax.lax.stop_gradient


class ShadePoint(NamedTuple):
    """Per-lane inputs to direct lighting."""
    point: jnp.ndarray      # [N, 3] world hit point
    normal: jnp.ndarray     # [N, 3] world shading normal (post-texture)
    wo: jnp.ndarray         # [N, 3] unit vector toward the viewer
    mat: jnp.ndarray        # [N] int32
    dm: jnp.ndarray         # [N] int32 decal mode
    tex_color: jnp.ndarray  # [N, 3]
    tex_norm: jnp.ndarray   # [N]
    time: jnp.ndarray       # [N] ray time (shadow rays inherit it)
    valid: jnp.ndarray      # [N] bool


def _effective_kd(sp: ShadePoint, mats: T.Materials) -> jnp.ndarray:
    """Diffuse coefficient after decal modes (src/Light.cpp:206-223)."""
    kd = mats.diffuse[sp.mat]
    tex = sp.tex_color / sp.tex_norm[:, None]
    kd = jnp.where((sp.dm == T.DECAL_REPLACE_KD)[:, None], tex, kd)
    kd = jnp.where((sp.dm == T.DECAL_BLEND_KD)[:, None],
                   (mats.diffuse[sp.mat] + tex) * 0.5, kd)
    return kd


def _diffuse_specular(sp: ShadePoint, mats: T.Materials, wi, contribution):
    """Blinn-Phong diffuse + specular for non-BRDF materials."""
    kd = _effective_kd(sp, mats)
    cos_i = jnp.maximum(0.0, dot(sp.normal, wi))
    diffuse = contribution * kd * cos_i[:, None]
    h = safe_normalize(sp.wo + wi)  # wi == -wo on dead lanes
    cos_h = jnp.maximum(0.0, dot(sp.normal, h))
    ks = mats.specular[sp.mat]
    p = mats.phong[sp.mat]
    specular = contribution * ks * safe_pow(cos_h[:, None], p[:, None])
    return diffuse + specular


def _lit_color(sp: ShadePoint, mats: T.Materials, wi, contribution):
    """Select BRDF vs diffuse+specular per lane (src/Light.cpp:243-249)."""
    has_brdf = (mats.brdf[sp.mat] != T.BRDF_NONE)[:, None]
    via_brdf = brdf_radiance(wi, sp.wo, sp.normal, contribution, mats, sp.mat)
    via_ds = _diffuse_specular(sp, mats, wi, contribution)
    return jnp.where(has_brdf, via_brdf, via_ds)


def _occluded(scene: T.Scene, sp: ShadePoint, direction, d_light=None):
    """Shadow test via the any-hit query.

    Origin offset along the surface normal (src/Light.cpp:192; the
    pages/Page2.md:87 bugfix). The reference compares the occluder's
    distance FROM THE HIT POINT against the light distance
    (src/Light.cpp:197-200): with o = p + eps*n that is
    |eps*n + t*d| < d_light, i.e. t < t_cap for
    t_cap = -eps*c + sqrt(eps^2*(c^2 - 1) + d_light^2), c = n.d —
    solved exactly so the any-hit reproduces the distance-compare
    semantics. ``d_light=None`` means any hit occludes (directional).
    """
    eps = scene.shadow_eps
    o = _sg(sp.point + sp.normal * eps)
    if d_light is None:
        t_cap = jnp.float32(3.0e38)
    else:
        c = _sg(dot(sp.normal, direction))
        d2 = _sg(d_light * d_light)
        rad = jnp.maximum(eps * eps * (c * c - 1.0) + d2, 0.0)
        t_cap = -eps * c + jnp.sqrt(rad)
    rays = intersect.Rays(o=o, d=direction, time=sp.time)
    return intersect.trace_anyhit(scene, rays, t_cap)


def direct_lighting(scene: T.Scene, sp: ShadePoint, key: jax.Array
                    ) -> jnp.ndarray:
    """Ambient + sum over all lights (Scene::BasicShading)."""
    mats = scene.materials
    out = scene.lights.ambient[None, :] * mats.ambient[sp.mat]  # src/Scene.cpp:22-30

    lights = scene.lights

    # ---- point lights (src/Light.cpp:166-250) ----
    for i in range(lights.point_pos.shape[0]):
        pos = lights.point_pos[i]
        topoint = pos[None, :] - sp.point
        d_light = norm(topoint)
        wi = topoint / d_light[:, None]
        shadowed = _occluded(scene, sp, wi, d_light)  # src/Light.cpp:197-200
        contribution = lights.point_intensity[i][None, :] / (d_light * d_light)[:, None]
        lit = _lit_color(sp, mats, wi, contribution)
        out = out + jnp.where((sp.valid & ~shadowed)[:, None], lit, 0.0)

    # ---- directional lights (src/Light.cpp:256-321) ----
    for i in range(lights.dir_dir.shape[0]):
        wi = jnp.broadcast_to(-lights.dir_dir[i], sp.point.shape)
        occ = _occluded(scene, sp, wi, None)
        contribution = jnp.broadcast_to(lights.dir_radiance[i], sp.point.shape)
        lit = _lit_color(sp, mats, wi, contribution)
        out = out + jnp.where((sp.valid & ~occ)[:, None], lit, 0.0)

    # ---- spot lights (src/Light.cpp:327-436) ----
    for i in range(lights.spot_pos.shape[0]):
        pos = lights.spot_pos[i]
        topoint = pos[None, :] - sp.point
        d_light = norm(topoint)
        wi = topoint / d_light[:, None]
        shadowed = _occluded(scene, sp, wi, d_light)
        contribution = lights.spot_intensity[i][None, :] / (d_light * d_light)[:, None]
        lit = _lit_color(sp, mats, wi, contribution)
        # falloff (src/Light.cpp:338-348, 409-436); double-where: dead lanes
        # clip to +/-1 where arccos' derivative is infinite
        cos_a = jnp.clip(dot(-wi, lights.spot_dir[i][None, :]), -1.0, 1.0)
        angle = jnp.arccos(jnp.where(sp.valid, cos_a, 0.0))
        cf = jnp.cos(lights.spot_falloff[i])
        cc = jnp.cos(lights.spot_coverage[i])
        factor = ((jnp.cos(angle) - cc) / (cf - cc)) ** 4
        scale = jnp.where(angle < lights.spot_falloff[i], 1.0,
                          jnp.where(angle < lights.spot_coverage[i], factor, 0.0))
        out = out + jnp.where((sp.valid & ~shadowed)[:, None],
                              lit * scale[:, None], 0.0)

    # ---- area lights (src/Light.cpp:442-545) ----
    for i in range(lights.area_pos.shape[0]):
        k = jax.random.fold_in(key, 1000 + i)
        chi = jax.random.uniform(k, (sp.point.shape[0], 2)) - 0.5
        size = lights.area_size[i]
        sample = (lights.area_pos[i][None, :]
                  + lights.area_u[i][None, :] * size * chi[:, 0:1]
                  + lights.area_v[i][None, :] * size * chi[:, 1:2])
        tosample = sample - sp.point
        d_light = norm(tosample)
        wi = tosample / d_light[:, None]
        shadowed = _occluded(scene, sp, wi, d_light)
        # factor = size^2 cos/d^2 (src/Light.cpp:457-463)
        cos_l = jnp.abs(dot(-wi, lights.area_normal[i][None, :]))
        factor = (size * size) * cos_l / (d_light * d_light)
        contribution = lights.area_radiance[i][None, :] * factor[:, None]
        lit = _lit_color(sp, mats, wi, contribution)
        out = out + jnp.where((sp.valid & ~shadowed)[:, None], lit, 0.0)

    # ---- environment light (src/Light.cpp:551-660) ----
    if scene.env_texture >= 0:
        k = jax.random.fold_in(key, 2000)
        n = sp.normal
        u = orthonormal_u(n)
        w = jnp.cross(n, u)
        chi = jax.random.uniform(k, (sp.point.shape[0], 2))
        # The reference rejection-samples uniform directions in the normal
        # hemisphere (src/Light.cpp:634-648); sample the same distribution
        # directly: z ~ U(0,1), phi ~ U(0,2pi), pdf = 1/(2pi).
        z = chi[:, 0]
        phi = chi[:, 1] * 2.0 * jnp.pi
        r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
        wi = (u * (r * jnp.cos(phi))[:, None] + n * z[:, None]
              + w * (r * jnp.sin(phi))[:, None])
        wi = normalize(wi)
        occ = _occluded(scene, sp, wi, None)
        radiance = env_radiance(scene, wi) * (2.0 * jnp.pi)
        lit = _lit_color(sp, mats, wi, radiance)
        out = out + jnp.where((sp.valid & ~occ)[:, None], lit, 0.0)

    return out


def env_radiance(scene: T.Scene, direction: jnp.ndarray) -> jnp.ndarray:
    """Lat-long environment lookup (src/Light.cpp:563-575): [N,3]."""
    theta = jnp.arccos(jnp.clip(direction[:, 1], -1.0, 1.0))
    phi = jnp.arctan2(direction[:, 2], direction[:, 0])
    u = (-phi + jnp.pi) / (2.0 * jnp.pi)
    v = theta / jnp.pi
    tex = scene.textures[scene.env_texture]
    return sample_image(tex, jnp.stack([u, v], axis=-1))
