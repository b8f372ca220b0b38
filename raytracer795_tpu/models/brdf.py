"""The 8 analytic BRDF models, vectorized with per-lane selection.

Dispatch contract: Light::TermBRDF (src/Light.cpp:62-155); radiance
composition L * f * max(0, n.wi): Light::BRDF (src/Light.cpp:157-162).
All eight terms are computed for every lane and blended by brdf-type masks —
cheap VPU work that avoids divergent control flow on TPU.
"""

from __future__ import annotations

import jax.numpy as jnp

from raytracer795_tpu.scene import types as T
from raytracer795_tpu.utils.vecmath import (dot, safe_div,
                                            safe_normalize, safe_pow)

_EPS = 1e-3  # Light::_epsilon (src/Light.h:16)


def _conductor_fresnel(n_t, k_t, d, normal):
    """Fresnel for conductors (src/Light.cpp:18-28); d = incoming direction.

    Denominators guarded: the lanes evaluating this with a non-conductor
    material row (n=k=0, grazing cos) would divide 0/0 and poison reverse
    mode through the downstream masks.
    """
    cos_t = -dot(d, normal)
    two = 2.0 * n_t * cos_t
    cos2 = cos_t * cos_t
    nk2 = n_t * n_t + k_t * k_t
    rs = safe_div(nk2 - two + cos2, nk2 + two + cos2)
    rp = safe_div(nk2 * cos2 - two + 1.0, nk2 * cos2 + two + 1.0)
    return 0.5 * (rs + rp)


def term_brdf(wi, wo, normal, mats, mat_idx):
    """f(wi, wo) per lane [N, 3] given per-lane material rows."""
    kd = mats.diffuse[mat_idx]          # [N, 3]
    ks = mats.specular[mat_idx]
    p = mats.phong[mat_idx]             # [N]
    btype = mats.brdf[mat_idx]          # [N]

    n_wi = dot(normal, wi)
    wr = safe_normalize(-wi + 2.0 * n_wi[:, None] * normal)
    cos_r = jnp.maximum(0.0, dot(wr, wo))           # Phong lobes
    h = safe_normalize(wo + wi)     # wi == -wo on dead lanes => |h| == 0
    cos_h = jnp.maximum(0.0, dot(normal, h))        # Blinn lobes
    cos_i = jnp.maximum(0.0, dot(wi, normal))
    pi = jnp.pi

    pow_r = safe_pow(cos_r[:, None], p[:, None])
    pow_h = safe_pow(cos_h[:, None], p[:, None])

    # Phong family (src/Light.cpp:63-93)
    f_mp = kd + ks * pow_r
    guard = (cos_i >= _EPS)[:, None]
    f_op = jnp.where(guard, kd + ks * pow_r / jnp.maximum(cos_i, _EPS)[:, None], 0.0)
    f_mpn = kd / pi + ks * ((p[:, None] + 2.0) / (2.0 * pi)) * pow_r

    # Blinn-Phong family (src/Light.cpp:94-121)
    f_mbp = kd + ks * pow_h
    f_obp = jnp.where(guard, kd + ks * pow_h / jnp.maximum(cos_i, _EPS)[:, None], 0.0)
    f_mbpn = kd / pi + ks * ((p[:, None] + 8.0) / (8.0 * pi)) * pow_h

    # Torrance-Sparrow (src/Light.cpp:122-154)
    # cos_alpha clamped at 0: the reference raises it to an int exponent so
    # negative bases stay finite; float pow would NaN (only reachable when
    # n.wi <= 0, where the final cos term zeroes the lobe anyway).
    cos_alpha = jnp.maximum(0.0, dot(h, normal))
    cos_theta = dot(wi, normal)
    cos_phi = dot(wo, normal)
    d_ts = ((p + 2.0) / (2.0 * pi)) * safe_pow(cos_alpha, p)  # DistributionTS
    g_left = safe_div(2.0 * dot(normal, h) * dot(normal, wo), dot(wo, h))
    g_right = safe_div(2.0 * dot(normal, h) * dot(normal, wi), dot(wi, h))
    g_ts = jnp.minimum(1.0, jnp.minimum(g_left, g_right))  # GeometryTS
    spec_ts = ks * safe_div(g_ts * d_ts, 4.0 * cos_phi * cos_theta)[:, None]
    f_ts = kd / pi + spec_ts
    fr = _conductor_fresnel(mats.refraction[mat_idx],
                            mats.absorption_index[mat_idx], -wo, normal)
    f_tsf = (kd / pi) * (1.0 - fr)[:, None] + spec_ts * fr[:, None]

    out = f_mbp  # default arbitrary; every lane with a BRDF gets overwritten
    for code, f in ((T.BRDF_MP, f_mp), (T.BRDF_OP, f_op), (T.BRDF_MPN, f_mpn),
                    (T.BRDF_MBP, f_mbp), (T.BRDF_OBP, f_obp),
                    (T.BRDF_MBPN, f_mbpn), (T.BRDF_TS, f_ts),
                    (T.BRDF_TSF, f_tsf)):
        out = jnp.where((btype == code)[:, None], f, out)
    return out


def brdf_radiance(wi, wo, normal, radiance, mats, mat_idx):
    """L * f * max(0, n.wi) (src/Light.cpp:157-162)."""
    f = term_brdf(wi, wo, normal, mats, mat_idx)
    cos_i = jnp.maximum(0.0, dot(wi, normal))
    return radiance * f * cos_i[:, None]
