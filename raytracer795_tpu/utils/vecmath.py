"""Gradient-hygiene scalar helpers shared across the compute path.

All functions are pure jnp, elementwise, and safe under jit/vmap/grad. The
lane-major 3-vector math lives in utils/vec3.py; these are the scalar
companions for masked-lane gradient hygiene.
"""

from __future__ import annotations

import jax.numpy as jnp


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
