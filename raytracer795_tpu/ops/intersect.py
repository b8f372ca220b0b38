"""Wavefront intersection: ray batches vs the scene's trace groups.

The reference's hot path (src/Helper.cpp:18-80 world dispatch →
src/BVH.cpp:112-210 per-object BVH → src/Shape.cpp:113-155,347-398 primitive
tests) becomes a two-phase vectorized pass per group:

phase 1 (``trace``): t-only candidates for every (ray, primitive) pair,
    reduced to the per-group and then global nearest hit. Pure VPU work.
phase 2 (``hit_details``): geometric attributes (point, normal, bary, uv
    inputs) recomputed only for each ray's single winning primitive.

Semantics preserved from the reference:
- triangle test accepts t >= -int_eps, beta/gamma >= -int_eps,
  beta+gamma <= 1 (src/Shape.cpp:146-147);
- sphere test requires discriminant >= int_eps (src/Shape.cpp:355-356) and
  picks among the t1/t2 sign cases (src/Shape.cpp:365-388);
- within an object the nearest hit is chosen by |local point - origin|
  (src/BVH.cpp:165-171), i.e. by |t|; across objects world t must be > 0
  (src/Helper.cpp:43);
- rays containing NaN match nothing (src/Helper.cpp:28-30) — all comparisons
  with NaN are False, so this falls out naturally;
- transformed groups intersect in local space via M^-1 with the motion-blur
  offset ``origin -= blur * time`` applied first (src/Helper.cpp:110-133);
  the local-space ray is intentionally NOT renormalized so t is a shared
  world/local parameter (src/Ray.cpp:21-40 gett recovers exactly this t).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from raytracer795_tpu.scene import types as T
from raytracer795_tpu.utils.vecmath import (affine_apply, dot,
                                            masked_normalize, mat3_apply,
                                            normalize)

_BIG = jnp.float32(3.0e38)

# Primitive-chunk size for the t-pass: bounds the [N, CHUNK, 3] temporaries.
_PRIM_CHUNK = 512


class Rays(NamedTuple):
    o: jnp.ndarray      # [N, 3]
    d: jnp.ndarray      # [N, 3]
    time: jnp.ndarray   # [N]


class Hit(NamedTuple):
    valid: jnp.ndarray      # [N] bool
    t: jnp.ndarray          # [N] world-space ray parameter
    group: jnp.ndarray      # [N] int32 index into scene.groups
    prim: jnp.ndarray       # [N] int32 index within the group's prim kind
    is_sphere: jnp.ndarray  # [N] bool


class HitDetails(NamedTuple):
    valid: jnp.ndarray
    point: jnp.ndarray      # [N, 3] world
    normal: jnp.ndarray     # [N, 3] LOCAL-space normal, normalized. Texture
    #                           normal math runs in local space (the reference
    #                           textures inside the BVH step, pre-transform);
    #                           the world transform by (M^-1)^T is applied once
    #                           after texturing (src/Helper.cpp:75-78).
    mat: jnp.ndarray        # [N] int32
    t: jnp.ndarray          # [N]
    tex0: jnp.ndarray       # [N] int32 (-1 none)
    tex1: jnp.ndarray       # [N] int32
    uv: jnp.ndarray         # [N, 2] texture coordinates (tri bary / sphere)
    # sphere-local quantities for texture TBN math (src/Shape.cpp:400-472)
    local_point: jnp.ndarray    # [N, 3] hit point in group-local space
    local_center: jnp.ndarray   # [N, 3] sphere center (local) or zeros
    radius: jnp.ndarray         # [N]
    # triangle quantities for TBN math (src/Shape.cpp:505-616)
    tri_e1: jnp.ndarray     # [N, 3] b - a (local)
    tri_e2: jnp.ndarray     # [N, 3] c - a (local)
    tri_uv0: jnp.ndarray    # [N, 2]
    tri_uv1: jnp.ndarray    # [N, 2]
    tri_uv2: jnp.ndarray    # [N, 2]
    is_sphere: jnp.ndarray  # [N] bool
    minv_t: jnp.ndarray     # [N, 3, 3] normal transform of the hit group
    emission: jnp.ndarray   # [N, 3] object-light radiance of the hit prim


def _transform_rays(group: T.TraceGroup, rays: Rays) -> Rays:
    """World ray -> group-local ray (src/Helper.cpp:110-133)."""
    o = rays.o - group.blur[None, :] * rays.time[:, None]
    if group.has_xform:
        m = group.minv
        o = affine_apply(m, o)
        d = mat3_apply(m[:3, :3], rays.d)
    else:
        d = rays.d
    return Rays(o=o, d=d, time=rays.time)


def _bbox_pass(group: T.TraceGroup, local: Rays) -> jnp.ndarray:
    """Slab test of each source object's root bbox: [N, O+1] bool.

    Exact semantics of BVH::RayBBoxIntersection (src/BVH.cpp:212-266): per
    axis, entry/exit picked by the sign of d (d == 0 falls into the negative
    branch, producing +/-inf and rejecting the box — a reference quirk kept);
    hit iff min(exits) >= max(entries). Column O is an always-true slot for
    exempt primitives (single-leaf BVHs are never bbox-tested).
    """
    n_obj = group.obj_bbox.shape[0]
    N = local.o.shape[0]
    if n_obj == 0:
        return jnp.ones((N, 1), bool)
    bmin = group.obj_bbox[:, 0]                     # [O, 3]
    bmax = group.obj_bbox[:, 1]
    o = local.o[:, None, :]                         # [N, 1, 3]
    d = local.d[:, None, :]
    pos = d > 0
    t_e = jnp.where(pos, (bmin[None] - o) / d, (bmax[None] - o) / d)
    t_l = jnp.where(pos, (bmax[None] - o) / d, (bmin[None] - o) / d)
    smallest_l = jnp.min(t_l, axis=-1)              # [N, O]
    largest_e = jnp.max(t_e, axis=-1)
    ok = ~(smallest_l < largest_e)
    return jnp.concatenate([ok, jnp.ones((N, 1), bool)], axis=1)


# Below this many primitives, the brute sweep unrolls a per-primitive Python
# loop of flat [N] ops instead of materializing [N, C(,3)] temporaries: a
# [N, 26]-shaped array pads the TPU's 128-wide lane axis ~5x and burns HBM
# bandwidth on padding, while [N]-shaped chains tile perfectly and fuse into
# a handful of passes over the ray batch.
_UNROLL_PRIMS = 96


def _tri_candidates_unrolled(scene: T.Scene, group: T.TraceGroup, local: Rays,
                             bbox_ok: jnp.ndarray):
    """Per-prim unrolled nearest-triangle sweep (small groups, lane-shaped).

    Same math and accept/ranking semantics as ``_tri_candidates`` — Cramer
    solve of src/Shape.cpp:120-132 with the |t| ranking of
    src/BVH.cpp:165-171 — but every intermediate is [N], so XLA emits
    full-width VPU code with no primitive-axis padding.
    """
    verts = scene.vertices
    a_all = verts[group.tri_vidx[:, 0]]     # [T, 3] one-time gathers
    b_all = verts[group.tri_vidx[:, 1]]
    c_all = verts[group.tri_vidx[:, 2]]
    int_eps = scene.int_eps
    o, d = local.o, local.d
    N = o.shape[0]

    best_key = jnp.full((N,), _BIG)
    best_t = jnp.zeros((N,))
    best_idx = jnp.zeros((N,), jnp.int32)
    n_obj = bbox_ok.shape[1] - 1

    for ti in range(group.n_tris):
        a, b, c = a_all[ti], b_all[ti], c_all[ti]   # static slices
        e1 = a - b
        e2 = a - c
        n_geo = jnp.cross(e1, e2)
        ao = a[None, :] - o                         # [N, 3]
        e2xd = jnp.cross(e2[None, :], d)
        det = jnp.sum(e1[None, :] * e2xd, axis=-1)  # [N]
        inv_det = 1.0 / det
        beta = jnp.sum(ao * e2xd, axis=-1) * inv_det
        e1xd = jnp.cross(e1[None, :], d)
        gamma = -jnp.sum(ao * e1xd, axis=-1) * inv_det
        t = jnp.sum(n_geo[None, :] * ao, axis=-1) * inv_det
        ok = ((t >= -int_eps) & (beta >= -int_eps) & (gamma >= -int_eps)
              & (beta + gamma <= 1.0))
        obj = jnp.where(group.tri_obj[ti] < 0, n_obj, group.tri_obj[ti])
        ok = ok & jnp.take(bbox_ok, obj, axis=1)
        key = jnp.where(ok, jnp.abs(t), _BIG)
        upd = key < best_key
        best_t = jnp.where(upd, t, best_t)
        best_idx = jnp.where(upd, ti, best_idx)
        best_key = jnp.minimum(best_key, key)

    return best_key, best_t, best_idx


def _tri_candidates(scene: T.Scene, group: T.TraceGroup, local: Rays,
                    bbox_ok: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Nearest triangle per ray: (|t|-ranked best t, prim index)."""
    if group.n_tris <= _UNROLL_PRIMS:
        return _tri_candidates_unrolled(scene, group, local, bbox_ok)
    verts = scene.vertices
    a = verts[group.tri_vidx[:, 0]]     # [T, 3]
    b = verts[group.tri_vidx[:, 1]]
    c = verts[group.tri_vidx[:, 2]]
    e1 = a - b                          # [T, 3] (reference column a-b)
    e2 = a - c
    n_tris = group.n_tris
    int_eps = scene.int_eps

    o, d = local.o, local.d             # [N, 3]
    N = o.shape[0]
    best_key = jnp.full((N,), _BIG)
    best_t = jnp.zeros((N,))
    best_idx = jnp.zeros((N,), jnp.int32)

    for start in range(0, n_tris, _PRIM_CHUNK):
        end = min(start + _PRIM_CHUNK, n_tris)
        ac, e1c, e2c = a[start:end], e1[start:end], e2[start:end]
        # Solve [e1 e2 d] [beta gamma t]^T = a - o via Cramer's rule
        # (src/Shape.cpp:120-132). Triple products with [N, C, 3] temps.
        n_geo = jnp.cross(e1c, e2c)[None, :, :]            # [1, C, 3]
        ao = ac[None, :, :] - o[:, None, :]                 # [N, C, 3]
        d_b = d[:, None, :]                                 # [N, 1, 3]
        e2xd = jnp.cross(e2c[None, :, :], d_b)              # [N, C, 3]
        det = jnp.sum(e1c[None, :, :] * e2xd, axis=-1)      # [N, C]
        inv_det = 1.0 / det
        beta = jnp.sum(ao * e2xd, axis=-1) * inv_det
        e1xd = jnp.cross(e1c[None, :, :], d_b)
        gamma = -jnp.sum(ao * e1xd, axis=-1) * inv_det
        t = jnp.sum(n_geo * ao, axis=-1) * inv_det
        ok = ((t >= -int_eps) & (beta >= -int_eps) & (gamma >= -int_eps)
              & (beta + gamma <= 1.0))
        n_obj = bbox_ok.shape[1] - 1
        obj = jnp.where(group.tri_obj[start:end] < 0, n_obj,
                        group.tri_obj[start:end])
        ok = ok & bbox_ok[:, obj]
        key = jnp.where(ok, jnp.abs(t), _BIG)
        ci = jnp.argmin(key, axis=-1)                        # [N]
        ckey = jnp.take_along_axis(key, ci[:, None], axis=-1)[:, 0]
        ct = jnp.take_along_axis(t, ci[:, None], axis=-1)[:, 0]
        upd = ckey < best_key
        best_t = jnp.where(upd, ct, best_t)
        best_idx = jnp.where(upd, ci.astype(jnp.int32) + start, best_idx)
        best_key = jnp.minimum(best_key, ckey)

    return best_key, best_t, best_idx


def _sphere_candidates_unrolled(scene: T.Scene, group: T.TraceGroup,
                                local: Rays):
    """Per-prim unrolled sphere sweep (lane-shaped, see _UNROLL_PRIMS)."""
    centers = scene.vertices[group.sph_cidx]        # [S, 3]
    radii = group.sph_radius
    int_eps = scene.int_eps
    o, d = local.o, local.d
    N = o.shape[0]
    dd = jnp.sum(d * d, axis=-1)                    # [N]

    best_key = jnp.full((N,), _BIG)
    best_t = jnp.zeros((N,))
    best_idx = jnp.zeros((N,), jnp.int32)

    for si in range(group.n_spheres):
        center, r = centers[si], radii[si]
        oc = o - center[None, :]
        b = jnp.sum(d * oc, axis=-1)
        cq = jnp.sum(oc * oc, axis=-1) - r * r
        disc = b * b - dd * cq
        ok = disc >= int_eps
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t1 = (-b + sq) / dd
        t2 = (-b - sq) / dd
        t = jnp.where((t1 >= 0) & (t2 < 0), t1,
                      jnp.where((t2 >= 0) & (t1 < 0), t2,
                                jnp.minimum(t1, t2)))
        ok = ok & ~((t1 < 0) & (t2 < 0))
        key = jnp.where(ok, jnp.abs(t), _BIG)
        upd = key < best_key
        best_t = jnp.where(upd, t, best_t)
        best_idx = jnp.where(upd, si, best_idx)
        best_key = jnp.minimum(best_key, key)

    return best_key, best_t, best_idx


def _sphere_candidates(scene: T.Scene, group: T.TraceGroup, local: Rays
                       ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Nearest sphere per ray (quadratic, src/Shape.cpp:347-388)."""
    if group.n_spheres <= _UNROLL_PRIMS:
        return _sphere_candidates_unrolled(scene, group, local)
    centers = scene.vertices[group.sph_cidx]        # [S, 3]
    r = group.sph_radius                            # [S]
    int_eps = scene.int_eps

    o, d = local.o, local.d
    oc = o[:, None, :] - centers[None, :, :]        # [N, S, 3]
    dd = jnp.sum(d * d, axis=-1)[:, None]           # [N, 1]
    b = jnp.sum(d[:, None, :] * oc, axis=-1)        # [N, S] = d.(o-c)
    cq = jnp.sum(oc * oc, axis=-1) - (r * r)[None, :]
    disc = b * b - dd * cq
    ok = disc >= int_eps
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t1 = (-b + sq) / dd
    t2 = (-b - sq) / dd
    # sign cases (src/Shape.cpp:365-388)
    t = jnp.where((t1 >= 0) & (t2 < 0), t1,
                  jnp.where((t2 >= 0) & (t1 < 0), t2, jnp.minimum(t1, t2)))
    ok = ok & ~((t1 < 0) & (t2 < 0))
    key = jnp.where(ok, jnp.abs(t), _BIG)
    si = jnp.argmin(key, axis=-1)
    skey = jnp.take_along_axis(key, si[:, None], axis=-1)[:, 0]
    st = jnp.take_along_axis(t, si[:, None], axis=-1)[:, 0]
    return skey, st, si.astype(jnp.int32)


def _tri_bvh_candidates(scene: T.Scene, group: T.TraceGroup, local: Rays
                        ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Nearest triangle per ray via the group's flat BVH.

    Stackless skip-link walk (see ops/bvh.py): every lane advances through
    the DFS node order — hit an inner node -> next node; miss, or finish a
    leaf's primitive block -> the node's skip link. All lanes run in lockstep
    inside one ``lax.while_loop``; finished lanes idle at node == n_nodes.

    Semantics match the brute-force `_tri_candidates` path exactly:
    - the slab test keeps the reference quirk that a zero direction component
      rejects the box via inf/NaN arithmetic (src/BVH.cpp:212-266), and boxes
      fully behind the origin still traverse (no exit >= 0 test);
    - pruning skips a node only when its entry distance exceeds the current
      best |t| and the entry is ahead of the origin — exactly the hits the
      |t| ranking (src/BVH.cpp:165-171) could still accept;
    - triangle accept tests and |t| ranking as in src/Shape.cpp:113-155.
    """
    bvh: T.FlatBVH = jax.tree_util.tree_map(jnp.asarray, group.bvh)
    n_nodes = bvh.bmin.shape[0]
    n_tris = group.n_tris
    K = bvh.max_leaf
    int_eps = scene.int_eps

    verts = jnp.asarray(scene.vertices)
    a = verts[group.tri_vidx[:, 0]]     # [T, 3] leaf-contiguous order
    b = verts[group.tri_vidx[:, 1]]
    c = verts[group.tri_vidx[:, 2]]
    e1 = a - b                          # reference column a-b
    e2 = a - c

    o, d = local.o, local.d             # [N, 3]
    N = o.shape[0]
    inv_d = 1.0 / d                     # inf where d == 0 (quirk preserved)

    # Lanes that can never hit (NaN ray or all-zero direction) start done:
    # they'd otherwise accept every bbox through NaN comparisons and walk the
    # whole tree (the brute path rejects them per-prim, src/Helper.cpp:28-30).
    dead = (jnp.any(jnp.isnan(o) | jnp.isnan(d), axis=-1)
            | jnp.all(d == 0.0, axis=-1))
    node0 = jnp.where(dead, n_nodes, 0).astype(jnp.int32)

    def cond(state):
        node = state[0]
        return jnp.any(node < n_nodes)

    def body(state):
        node, best_key, best_t, best_idx = state
        active = node < n_nodes
        ni = jnp.minimum(node, n_nodes - 1)
        bmin = bvh.bmin[ni]             # [N, 3]
        bmax = bvh.bmax[ni]
        pos = d > 0
        t_e = jnp.where(pos, (bmin - o) * inv_d, (bmax - o) * inv_d)
        t_l = jnp.where(pos, (bmax - o) * inv_d, (bmin - o) * inv_d)
        entry = jnp.max(t_e, axis=-1)
        exit_ = jnp.min(t_l, axis=-1)
        box_hit = ~(exit_ < entry)                     # reference slab accept
        box_hit = box_hit & ~(entry > best_key)        # safe |t| prune
        cnt = bvh.count[ni]
        is_leaf = cnt > 0
        first = bvh.first[ni]

        do_leaf = active & box_hit & is_leaf
        for j in range(K):
            pi = jnp.clip(first + j, 0, n_tris - 1)
            ok_j = do_leaf & (j < cnt)
            ac, e1c, e2c = a[pi], e1[pi], e2[pi]       # [N, 3] gathers
            ao = ac - o
            e2xd = jnp.cross(e2c, d)
            det = jnp.sum(e1c * e2xd, axis=-1)
            inv_det = 1.0 / det
            beta = jnp.sum(ao * e2xd, axis=-1) * inv_det
            e1xd = jnp.cross(e1c, d)
            gamma = -jnp.sum(ao * e1xd, axis=-1) * inv_det
            t = jnp.sum(jnp.cross(e1c, e2c) * ao, axis=-1) * inv_det
            ok = (ok_j & (t >= -int_eps) & (beta >= -int_eps)
                  & (gamma >= -int_eps) & (beta + gamma <= 1.0))
            key = jnp.where(ok, jnp.abs(t), _BIG)
            upd = key < best_key
            best_t = jnp.where(upd, t, best_t)
            best_idx = jnp.where(upd, pi.astype(jnp.int32), best_idx)
            best_key = jnp.minimum(best_key, key)

        nxt = jnp.where(box_hit & ~is_leaf, node + 1, bvh.miss[ni])
        node = jnp.where(active, nxt, node).astype(jnp.int32)
        return node, best_key, best_t, best_idx

    state = (node0, jnp.full((N,), _BIG), jnp.zeros((N,)),
             jnp.zeros((N,), jnp.int32))
    _, best_key, best_t, best_idx = jax.lax.while_loop(cond, body, state)
    return best_key, best_t, best_idx


def trace(scene: T.Scene, rays: Rays) -> Hit:
    """Nearest hit over all groups (world dispatch, src/Helper.cpp:18-80).

    The whole query is wrapped in ``stop_gradient``: which primitive a ray
    hits is a discrete decision (piecewise-constant in every parameter), and
    the candidate sweep divides/sqrt-s over ALL primitives — garbage on the
    non-winning ones — which poisons reverse-mode AD. ``hit_details``
    recomputes the winner's t (and every other geometric quantity)
    differentiably, so gradients flow through the implicit hit point exactly
    as SURVEY phase 8 prescribes, and the BVH walk's ``lax.while_loop``
    never appears on the AD tape at all.
    """
    sg = jax.lax.stop_gradient
    scene = jax.tree_util.tree_map(sg, scene)
    rays = jax.tree_util.tree_map(sg, rays)
    N = rays.o.shape[0]
    best_t = jnp.full((N,), _BIG)
    best_group = jnp.zeros((N,), jnp.int32)
    best_prim = jnp.zeros((N,), jnp.int32)
    best_sph = jnp.zeros((N,), bool)
    valid = jnp.zeros((N,), bool)

    for gi, group in enumerate(scene.groups):
        local = _transform_rays(group, rays)
        g_key = jnp.full((N,), _BIG)
        g_t = jnp.zeros((N,))
        g_prim = jnp.zeros((N,), jnp.int32)
        g_sph = jnp.zeros((N,), bool)
        if group.n_tris:
            if group.bvh is not None:
                tk, tt, tidx = _tri_bvh_candidates(scene, group, local)
            else:
                bbox_ok = _bbox_pass(group, local)
                tk, tt, tidx = _tri_candidates(scene, group, local, bbox_ok)
            g_key, g_t, g_prim = tk, tt, tidx
        if group.n_spheres:
            sk, st, sidx = _sphere_candidates(scene, group, local)
            upd = sk < g_key
            g_t = jnp.where(upd, st, g_t)
            g_prim = jnp.where(upd, sidx, g_prim)
            g_sph = upd | (group.n_tris == 0)
            g_key = jnp.minimum(g_key, sk)
        # world-level accept: t > 0 and nearer (src/Helper.cpp:43)
        ok = (g_key < _BIG) & (g_t > 0) & (g_t < best_t)
        best_t = jnp.where(ok, g_t, best_t)
        best_group = jnp.where(ok, gi, best_group)
        best_prim = jnp.where(ok, g_prim, best_prim)
        best_sph = jnp.where(ok, g_sph, best_sph)
        valid = valid | ok

    return Hit(valid=valid, t=best_t, group=best_group, prim=best_prim,
               is_sphere=best_sph)


def _tri_bvh_anyhit(scene: T.Scene, group: T.TraceGroup, local: Rays,
                    t_cap: jnp.ndarray) -> jnp.ndarray:
    """Any accepted triangle with t in (0, t_cap)? Early-exit BVH walk.

    Same skip-link lockstep walk as ``_tri_bvh_candidates`` with two shadow
    optimizations: nodes whose entry distance exceeds t_cap are pruned, and
    a lane retires the moment it finds any qualifying hit (the reference
    runs full nearest-hit for shadows, src/Light.cpp:188-204 — an any-hit
    needs none of that bookkeeping).
    """
    bvh: T.FlatBVH = jax.tree_util.tree_map(jnp.asarray, group.bvh)
    n_nodes = bvh.bmin.shape[0]
    n_tris = group.n_tris
    K = bvh.max_leaf
    int_eps = scene.int_eps

    verts = jnp.asarray(scene.vertices)
    a = verts[group.tri_vidx[:, 0]]
    b = verts[group.tri_vidx[:, 1]]
    c = verts[group.tri_vidx[:, 2]]
    e1 = a - b
    e2 = a - c

    o, d = local.o, local.d
    N = o.shape[0]
    inv_d = 1.0 / d

    dead = (jnp.any(jnp.isnan(o) | jnp.isnan(d), axis=-1)
            | jnp.all(d == 0.0, axis=-1))
    node0 = jnp.where(dead, n_nodes, 0).astype(jnp.int32)

    def cond(state):
        return jnp.any(state[0] < n_nodes)

    def body(state):
        node, found = state
        active = node < n_nodes
        ni = jnp.minimum(node, n_nodes - 1)
        bmin = bvh.bmin[ni]
        bmax = bvh.bmax[ni]
        pos = d > 0
        t_e = jnp.where(pos, (bmin - o) * inv_d, (bmax - o) * inv_d)
        t_l = jnp.where(pos, (bmax - o) * inv_d, (bmin - o) * inv_d)
        entry = jnp.max(t_e, axis=-1)
        exit_ = jnp.min(t_l, axis=-1)
        box_hit = ~(exit_ < entry) & ~(entry > t_cap)
        cnt = bvh.count[ni]
        is_leaf = cnt > 0
        first = bvh.first[ni]

        do_leaf = active & box_hit & is_leaf
        for j in range(K):
            pi = jnp.clip(first + j, 0, n_tris - 1)
            ok_j = do_leaf & (j < cnt)
            ac, e1c, e2c = a[pi], e1[pi], e2[pi]
            ao = ac - o
            e2xd = jnp.cross(e2c, d)
            det = jnp.sum(e1c * e2xd, axis=-1)
            inv_det = 1.0 / det
            beta = jnp.sum(ao * e2xd, axis=-1) * inv_det
            e1xd = jnp.cross(e1c, d)
            gamma = -jnp.sum(ao * e1xd, axis=-1) * inv_det
            t = jnp.sum(jnp.cross(e1c, e2c) * ao, axis=-1) * inv_det
            ok = (ok_j & (t >= -int_eps) & (beta >= -int_eps)
                  & (gamma >= -int_eps) & (beta + gamma <= 1.0)
                  & (t > 0) & (t < t_cap))
            found = found | ok

        nxt = jnp.where(box_hit & ~is_leaf, node + 1, bvh.miss[ni])
        nxt = jnp.where(found, n_nodes, nxt)        # early exit
        node = jnp.where(active, nxt, node).astype(jnp.int32)
        return node, found

    _, found = jax.lax.while_loop(cond, body, (node0, jnp.zeros((N,), bool)))
    return found


def trace_anyhit(scene: T.Scene, rays: Rays, t_cap) -> jnp.ndarray:
    """Occlusion query: any primitive with world t in (0, t_cap)? [N] bool.

    Cheaper than ``trace`` for shadows: no |t| ranking, no argmin winner
    bookkeeping, early-exit BVH walk. Semantics deviation (documented): the
    reference shadows via the full nearest-hit dispatch, whose per-object
    |t| ranking can let a *backface at negative t* mask a real positive-t
    occluder (src/BVH.cpp:165-171); the any-hit reports the physically
    correct answer in that corner case. Everything is stop-gradient —
    visibility is discrete.
    """
    sg = jax.lax.stop_gradient
    scene = jax.tree_util.tree_map(sg, scene)
    rays = jax.tree_util.tree_map(sg, rays)
    t_cap = sg(jnp.broadcast_to(jnp.asarray(t_cap, jnp.float32),
                                rays.o.shape[:1]))
    N = rays.o.shape[0]
    found = jnp.zeros((N,), bool)

    for group in scene.groups:
        local = _transform_rays(group, rays)
        if group.n_tris:
            if group.bvh is not None:
                found = found | _tri_bvh_anyhit(scene, group, local, t_cap)
            else:
                bbox_ok = _bbox_pass(group, local)
                k, t, _ = _tri_candidates(scene, group, local, bbox_ok)
                found = found | ((k < _BIG) & (t > 0) & (t < t_cap))
        if group.n_spheres:
            k, t, _ = _sphere_candidates(scene, group, local)
            found = found | ((k < _BIG) & (t > 0) & (t < t_cap))

    return found


def trace_occlusion(scene: T.Scene, rays: Rays) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Shadow query: (any hit, world hit point).

    The reference runs the full nearest-hit dispatch for shadows too
    (src/Light.cpp:188-204) and compares distances to the light; we return
    the nearest hit point for the same comparison. Everything here is
    stop-gradient: visibility is a discrete (piecewise-constant) decision,
    and the miss-lane hit point is o + 3e38*d = inf, which must never touch
    the AD tape.
    """
    sg = jax.lax.stop_gradient
    rays = jax.tree_util.tree_map(sg, rays)
    hit = trace(scene, rays)
    point = rays.o + hit.t[:, None] * rays.d
    return hit.valid, point


def compute_vertex_normals(scene: T.Scene) -> jnp.ndarray:
    """Accumulate flat normals of smooth triangles onto vertices.

    Mirrors Scene::renderScene's vertex-normal pass (src/Scene.cpp:302-318,
    src/Shape.cpp:262-276): per smooth triangle add normalize((c-b)x(a-b)) to
    its three vertices, then normalize per vertex. Runs in-graph so vertex
    gradients flow through shading normals.
    """
    verts = scene.vertices
    acc = jnp.zeros_like(verts)
    for group in scene.groups:
        if not group.n_tris:
            continue
        vidx = group.tri_vidx
        a = verts[vidx[:, 0]]
        b = verts[vidx[:, 1]]
        c = verts[vidx[:, 2]]
        n = jnp.cross(c - b, a - b)
        # safe divisor: a degenerate (zero-area) triangle contributes NaN in
        # the reference too, but its 1/0 would also NaN the *gradients* of
        # every healthy triangle through the scatter-add — guard it.
        sq = jnp.sum(n * n, axis=-1, keepdims=True)
        n = n / jnp.sqrt(jnp.where(sq > 0, sq, 1.0))
        w = (group.tri_smooth & (sq[:, 0] > 0)).astype(verts.dtype)[:, None]
        n = n * w
        for k in range(3):
            acc = acc.at[vidx[:, k]].add(n)
    # vertices used by no smooth triangle (sphere centers!) have acc == 0;
    # jnp.linalg.norm's VJP at 0 is 0/0 — use the squared-sum guard instead.
    sq = jnp.sum(acc * acc, axis=-1, keepdims=True)
    return acc / jnp.sqrt(jnp.where(sq > 0, sq, 1.0))


def hit_details(scene: T.Scene, rays: Rays, hit: Hit,
                vertex_normals: jnp.ndarray) -> HitDetails:
    """Phase 2: full geometric attributes for each ray's winning primitive.

    ONE gather pass regardless of group count: the per-group primitive
    tables are concatenated (under jit — XLA materializes them once per
    compiled program) and every lane gathers its winner through a global id
    ``offset[group] + prim``. Per-group transforms are gathered the same way
    ([G, 4, 4] stack indexed by the winning group), so instance-heavy scenes
    (the reference's metal_glass/instanced scenes, src/Helper.cpp:53-73)
    cost the same as single-object ones — unlike the reference's per-object
    dispatch loop (src/Helper.cpp:18-80).

    This is also the ONLY differentiable geometry path: ``trace`` is
    stop-gradient, and the winner's t / bary / quadratic are recomputed here
    (same op order as the trace, so forward bits are identical) with
    masked-lane guards everywhere a dead lane's garbage would NaN the VJP.
    """
    import numpy as np

    N = rays.o.shape[0]
    zeros3 = jnp.zeros((N, 3))
    zeros2 = jnp.zeros((N, 2))
    # Miss lanes carry t = _BIG whose o + t*d overflows to inf and poisons
    # reverse mode through every downstream op; give them a finite dummy t.
    # Valid lanes are overwritten below with the differentiable recompute.
    t0 = jnp.where(hit.valid, hit.t, 1.0)
    out = HitDetails(
        valid=hit.valid,
        point=rays.o + t0[:, None] * rays.d,        # world (Helper.cpp:47)
        normal=zeros3, mat=jnp.zeros((N,), jnp.int32), t=t0,
        tex0=jnp.full((N,), -1, jnp.int32), tex1=jnp.full((N,), -1, jnp.int32),
        uv=zeros2, local_point=zeros3, local_center=zeros3,
        radius=jnp.zeros((N,)), tri_e1=zeros3, tri_e2=zeros3,
        tri_uv0=zeros2, tri_uv1=zeros2, tri_uv2=zeros2,
        is_sphere=hit.is_sphere,
        minv_t=jnp.broadcast_to(jnp.eye(3), (N, 3, 3)),
        emission=jnp.zeros((N, 3)),
    )

    verts = jnp.asarray(scene.vertices)
    groups = [jax.tree_util.tree_map(jnp.asarray, g) for g in scene.groups]
    if not groups:
        return out
    g = hit.group

    # ---- per-lane local ray via gathered group transforms ----
    minv = jnp.stack([gr.minv for gr in groups])            # [G, 4, 4]
    minv_t3 = jnp.stack([gr.minv_t[:3, :3] for gr in groups])
    blur = jnp.stack([gr.blur for gr in groups])            # [G, 3]
    mv = minv[g]                                            # [N, 4, 4]
    o_b = rays.o - blur[g] * rays.time[:, None]
    local_o = jnp.sum(mv[:, :3, :3] * o_b[:, None, :], axis=-1) + mv[:, :3, 3]
    local_d = jnp.sum(mv[:, :3, :3] * rays.d[:, None, :], axis=-1)
    lane_minv_t = minv_t3[g]                                # [N, 3, 3]

    # host-side global-id offsets from static per-group counts
    tri_offs = np.cumsum([0] + [gr.n_tris for gr in groups])
    sph_offs = np.cumsum([0] + [gr.n_spheres for gr in groups])
    n_tris_total = int(tri_offs[-1])
    n_sph_total = int(sph_offs[-1])

    def concat(field, kinds):
        arrs = [getattr(gr, field) for gr, n in kinds if n]
        return jnp.concatenate(arrs, axis=0)

    tri_kinds = [(gr, gr.n_tris) for gr in groups]
    sph_kinds = [(gr, gr.n_spheres) for gr in groups]

    if n_tris_total:
        sel = hit.valid & ~hit.is_sphere
        tid = jnp.clip(jnp.asarray(tri_offs, jnp.int32)[g] + hit.prim,
                       0, n_tris_total - 1)
        vidx = concat("tri_vidx", tri_kinds)[tid]           # [N, 3]
        a, b, c = verts[vidx[:, 0]], verts[vidx[:, 1]], verts[vidx[:, 2]]
        # Recompute bary AND t for the winner (the same Cramer system the
        # trace solved, src/Shape.cpp:120-132) — this is where gradients
        # flow. Same op order as _tri_candidates: identical forward bits.
        e1, e2 = a - b, a - c
        e2xd = jnp.cross(e2, local_d)
        det = jnp.sum(e1 * e2xd, axis=-1)
        # masked-lane hygiene: dead lanes gather a clipped garbage primitive
        # whose det may be 0; 1/0 there NaNs the backward pass even under
        # jnp.where. Winners always have det != 0.
        inv_det = 1.0 / jnp.where(det != 0, det, 1.0)
        ao = a - local_o
        beta = jnp.sum(ao * e2xd, axis=-1) * inv_det
        e1xd = jnp.cross(e1, local_d)
        gamma = -jnp.sum(ao * e1xd, axis=-1) * inv_det
        t_tri = jnp.sum(jnp.cross(e1, e2) * ao, axis=-1) * inv_det
        alpha = 1.0 - beta - gamma
        lpoint = local_o + t_tri[:, None] * local_d
        smooth = concat("tri_smooth", tri_kinds)[tid]
        n_flat = jnp.cross(c - b, a - b)
        n_smooth = (vertex_normals[vidx[:, 0]] * alpha[:, None]
                    + vertex_normals[vidx[:, 1]] * beta[:, None]
                    + vertex_normals[vidx[:, 2]] * gamma[:, None])
        n = jnp.where(smooth[:, None], n_smooth, n_flat)
        n = masked_normalize(sel, n)
        # uv rows: vidx + per-tri uv offset (src/Shape.cpp:515-517)
        uvoff = concat("tri_uvoff", tri_kinds)[tid]
        texcoords = jnp.asarray(scene.texcoords)
        ntc = texcoords.shape[0]
        uvi = jnp.clip(vidx + uvoff[:, None], 0, ntc - 1)
        uv0 = texcoords[uvi[:, 0]]
        uv1 = texcoords[uvi[:, 1]]
        uv2 = texcoords[uvi[:, 2]]
        uv = uv0 * alpha[:, None] + uv1 * beta[:, None] + uv2 * gamma[:, None]
        m = sel[:, None]
        out = out._replace(
            point=jnp.where(m, rays.o + t_tri[:, None] * rays.d, out.point),
            t=jnp.where(sel, t_tri, out.t),
            normal=jnp.where(m, n, out.normal),
            mat=jnp.where(sel, concat("tri_mat", tri_kinds)[tid], out.mat),
            tex0=jnp.where(sel, concat("tri_tex0", tri_kinds)[tid], out.tex0),
            tex1=jnp.where(sel, concat("tri_tex1", tri_kinds)[tid], out.tex1),
            uv=jnp.where(m, uv, out.uv),
            local_point=jnp.where(m, lpoint, out.local_point),
            tri_e1=jnp.where(m, b - a, out.tri_e1),
            tri_e2=jnp.where(m, c - a, out.tri_e2),
            tri_uv0=jnp.where(m, uv0, out.tri_uv0),
            tri_uv1=jnp.where(m, uv1, out.tri_uv1),
            tri_uv2=jnp.where(m, uv2, out.tri_uv2),
            minv_t=jnp.where(sel[:, None, None], lane_minv_t, out.minv_t),
            emission=jnp.where(m, concat("tri_emis", tri_kinds)[tid],
                               out.emission),
        )

    if n_sph_total:
        sel = hit.valid & hit.is_sphere
        sid = jnp.clip(jnp.asarray(sph_offs, jnp.int32)[g] + hit.prim,
                       0, n_sph_total - 1)
        center = verts[concat("sph_cidx", sph_kinds)[sid]]  # [N, 3]
        radius = concat("sph_radius", sph_kinds)[sid]
        # recompute the winner's t (quadratic of src/Shape.cpp:347-388,
        # same op order as _sphere_candidates) so center/radius/ray grads
        # flow through the implicit hit point.
        oc = local_o - center
        dd = jnp.sum(local_d * local_d, axis=-1)
        bq = jnp.sum(local_d * oc, axis=-1)
        cq = jnp.sum(oc * oc, axis=-1) - radius * radius
        disc = bq * bq - dd * cq
        # winners have disc >= int_eps > 0 and dd > 0; guard dead lanes
        sq = jnp.sqrt(jnp.where(disc > 0, disc, 1.0)) * (disc > 0)
        inv_dd = 1.0 / jnp.where(dd != 0, dd, 1.0)
        t1 = (-bq + sq) * inv_dd
        t2 = (-bq - sq) * inv_dd
        t_sph = jnp.where((t1 >= 0) & (t2 < 0), t1,
                          jnp.where((t2 >= 0) & (t1 < 0), t2,
                                    jnp.minimum(t1, t2)))
        lpoint = local_o + t_sph[:, None] * local_d
        lc = lpoint - center
        n = masked_normalize(sel, lc)       # local-space normal
        # sphere UV from local spherical coords (src/Shape.cpp:413-417);
        # double-where on the arccos input: dead lanes clip to +/-1 where
        # arccos' derivative is infinite.
        cos_theta = jnp.clip(lc[:, 1] / jnp.where(radius > 0, radius, 1.0),
                             -1.0, 1.0)
        theta = jnp.arccos(jnp.where(sel, cos_theta, 0.0))
        phi = jnp.arctan2(lc[:, 2], jnp.where(sel, lc[:, 0], 1.0))
        u = (-phi + jnp.pi) / (2.0 * jnp.pi)
        v = theta / jnp.pi
        uv = jnp.stack([u, v], axis=-1)
        m = sel[:, None]
        out = out._replace(
            point=jnp.where(m, rays.o + t_sph[:, None] * rays.d, out.point),
            t=jnp.where(sel, t_sph, out.t),
            normal=jnp.where(m, n, out.normal),
            mat=jnp.where(sel, concat("sph_mat", sph_kinds)[sid], out.mat),
            tex0=jnp.where(sel, concat("sph_tex0", sph_kinds)[sid], out.tex0),
            tex1=jnp.where(sel, concat("sph_tex1", sph_kinds)[sid], out.tex1),
            uv=jnp.where(m, uv, out.uv),
            local_point=jnp.where(m, lpoint, out.local_point),
            local_center=jnp.where(m, center, out.local_center),
            radius=jnp.where(sel, radius, out.radius),
            minv_t=jnp.where(sel[:, None, None], lane_minv_t, out.minv_t),
            emission=jnp.where(m, concat("sph_emis", sph_kinds)[sid],
                               out.emission),
        )

    return out
