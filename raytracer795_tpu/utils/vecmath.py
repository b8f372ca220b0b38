"""Small vector helpers shared across the compute path.

All functions are pure jnp, operate on [..., 3] batches, and are safe under
jit/vmap/grad. Behavior contracts follow the reference helpers
(src/Helper.cpp:320-343 orthonormal basis, src/Scene.cpp:221-228 NaN scrub).
"""

from __future__ import annotations

import jax.numpy as jnp


def dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched dot product over the trailing axis, keepdims dropped."""
    return jnp.sum(a * b, axis=-1)


def norm(v: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(jnp.sum(v * v, axis=-1))


def normalize(v: jnp.ndarray) -> jnp.ndarray:
    """v / |v| (no epsilon: mirrors the reference's raw divisions)."""
    return v / norm(v)[..., None]


def safe_normalize(v: jnp.ndarray, eps: float = 1e-20) -> jnp.ndarray:
    n = jnp.maximum(norm(v)[..., None], eps)
    return v / n


def masked_normalize(mask: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """normalize(v) on lanes where ``mask``; a safe unit vector elsewhere.

    Gradient hygiene for wavefront lanes: masked-out lanes may carry garbage
    (zero vectors, inf) whose normalize() primal is NaN. Even when a later
    ``jnp.where`` masks the primal, the VJP of normalize multiplies the
    (zero) cotangent by 1/|v| of the primal — 0 * inf = NaN — poisoning the
    whole backward pass. Substituting a unit vector on dead lanes keeps the
    forward bits identical on live lanes and the backward finite everywhere.
    """
    fallback = jnp.zeros_like(v).at[..., 0].set(1.0)
    v = jnp.where(mask[..., None], v, fallback)
    return v / norm(v)[..., None]


def safe_pow(base: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """base ** p for base >= 0 with a finite VJP at base == 0.

    Specular lobes clamp cosines to 0, and pow's derivative there is
    p * 0^(p-1): inf for p < 1 and NaN-producing (0 * inf) under masked
    cotangents for p == 0. Forward is exact (0^0 == 1, 0^p == 0); the
    gradient at base == 0 is defined as 0.
    """
    pos = base > 0
    safe = jnp.where(pos, base, 1.0) ** p
    return jnp.where(pos, safe, jnp.where(p == 0, 1.0, 0.0))


def safe_div(num: jnp.ndarray, den: jnp.ndarray, mask=None) -> jnp.ndarray:
    """num / den with zero (or masked-out) denominators replaced by 1.

    Forward: identical wherever ``den != 0`` (and mask holds); 0-denominator
    lanes return ``num`` instead of inf/NaN — callers mask those out.
    Backward: finite everywhere (no 1/0 in the VJP).
    """
    ok = den != 0 if mask is None else (den != 0) & mask
    return num / jnp.where(ok, den, jnp.ones_like(den))


def cross(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.cross(a, b)


def orthonormal_u(v: jnp.ndarray) -> jnp.ndarray:
    """Orthonormal vector via the smallest-|component| trick.

    Mirrors GeometryHelpers::GetOrthonormalUVector (src/Helper.cpp:337-343):
    copy v, set its absolute-smallest component to 1, return normalize(v x v').
    Branchless via one-hot of argmin(|v|).
    """
    av = jnp.abs(v)
    # Reference tie-breaking: index 0 wins ties vs 1 and 2; 1 wins vs 2.
    idx = jnp.argmin(av, axis=-1)
    onehot = jnp.eye(3, dtype=v.dtype)[idx]
    nonlinear = jnp.where(onehot > 0, jnp.ones_like(v), v)
    return normalize(jnp.cross(v, nonlinear))


def scrub_nan(v: jnp.ndarray) -> jnp.ndarray:
    """Zero out vectors containing NaN (src/Scene.cpp:221-228 NanCheck)."""
    bad = jnp.any(jnp.isnan(v), axis=-1, keepdims=True)
    return jnp.where(bad, jnp.zeros_like(v), v)


def reflect(d: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """Mirror direction for incoming d against normal n (normalized output).

    Matches Scene::MirrorReflectance's wr = -wo + 2 n (n.wo), wo = -d
    (src/Scene.cpp:35-38).
    """
    wo = -d
    wr = -wo + 2.0 * dot(n, wo)[..., None] * n
    return normalize(wr)


def mat3_apply(m: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Apply a 3x3 matrix to [..., 3] vectors WITHOUT a matmul.

    Written as broadcast-multiply + reduce so XLA keeps it on the TPU VPU in
    full float32; a jnp.dot would route through the MXU whose default bf16
    inputs lose ~3 decimal digits — fatal for ray-transform precision.
    """
    return jnp.sum(m * v[..., None, :], axis=-1)


def affine_apply(m4: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Apply the affine 4x4 (rotation+translation rows) to points [..., 3]."""
    return mat3_apply(m4[:3, :3], p) + m4[:3, 3]
