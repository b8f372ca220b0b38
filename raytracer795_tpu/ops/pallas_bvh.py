"""Pallas TPU kernels: BVH traversal + triangle intersection (the hot loop).

The reference's hot loops — recursive BVH walk + per-leaf triangle tests
(src/BVH.cpp:137-210, src/Shape.cpp:113-155) — become ONE fused TPU kernel:
a block-synchronous ("packet") walk of the flat skip-link BVH (ops/bvh.py).
Each grid cell owns a block of 8x128 = 1024 rays held in vector registers;
one scalar node pointer walks the DFS order for the whole block, the slab
test and every triangle test are full-width VPU ops over all 1024 rays, and
a node descends iff ANY lane wants it. There are NO per-lane gathers
anywhere — the pattern XLA's lockstep `while_loop` formulation is bound by.

Memory layout (built host-side by ``build_pack``):
- ``node_rows`` [ceil(M/2), 128] f32 — TWO BVH nodes per VMEM row (lane
  bases 0 and 64), read with a dynamic-sublane slice (the one
  dynamic-indexing pattern Mosaic supports) + a scalar parity select per
  field: lanes +0-2 bmin, +3-5 bmax, +6 first tri row, +7 leaf row count
  (0 = inner), +8 skip link. Integers are exact in f32 (all < 2^24).
- ``tri_rows`` [R, 128] f32 — 9 triangles per row, 13 components each
  (a, e1 = a-b, e2 = a-c, ng = e1 x e2, prim id), 117 lanes used. Leaves own
  [first, first+rows) of consecutive rows; pad slots carry ng = det = 0 and
  self-reject in the Cramer test, so no count masking is needed.

Semantics are EXACTLY those of the jnp reference path
(ops/intersect.py ``_tri_bvh_candidates``/``_tri_bvh_anyhit``): the slab
test keeps the reference's d == 0 inf/NaN rejection quirk
(src/BVH.cpp:212-266), |t| ranking with strict-less updates
(src/BVH.cpp:165-171), the safe ``entry > best`` prune, NaN/zero-direction
rays dead on arrival (src/Helper.cpp:28-30). Block consensus is per-lane
EXACT: each lane carries an ancestor-validity bitmask (bit d = the lane
hit the depth-d node of the current DFS path, node depths baked into the
tables), and a lane only participates at a node where it hit EVERY
ancestor — identical to the per-lane oracle walk. This closes the
formerly-documented d == 0 NaN-entry deviation (a lane with a zero
direction component whose origin coordinate exactly equals a child-box
bound got entry = NaN -> box_hit = True at the child after cleanly
missing the parent, and could ride the block into a subtree the per-lane
oracle never visits); tests/test_pallas.py covers the axis-aligned
vertex-exact-origin construction directly.

Scope: both the node and triangle tables must fit VMEM, bounding a single
group at roughly ~140k triangles (the dragon-class meshes of
pages/Page2.md:57); larger groups fall back to the jnp path.
"""

from __future__ import annotations

import functools
import os
from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from raytracer795_tpu.scene import types as T

TRIS_PER_ROW = 9
COMPS = 13              # ax ay az e1x.. e2x.. ngx ngy ngz prim_id
NODES_PER_ROW = 2
NODE_STRIDE = 64
# rays per block = BLOCK_ROWS x 128. With tile-swizzled lanes
# (camera.band_pixels) a 64-row block covers a 64x64 pixel tile at 1 spp
# (64x32 pixels at 4 spp — sample lanes of a pixel are adjacent); measured
# on the 4spp rock100k + 1spp rock1800k benches: 64 rows beats 16/32/128
# on both (13.3M/0.95M vs 12.6/0.56, 12.9/0.84, 13.0/0.87 rays/s) — the
# scalar node walk amortizes across lanes until the block's node union
# saturates the tree. RT795_BLOCK_ROWS overrides for tuning.
# NEGATIVE RESULT (measured, not adopted): gating each 9-triangle row's
# ~270-op test block behind a ~35-op row-bbox slab made the kernel ~10%
# SLOWER on rock100k primaries+shadows (58 vs 52 ms / 106 vs 96 ms) — the
# tile-swizzled block unions are tight enough that visited rows almost
# always have a live lane, so the gate only adds overhead.
BLOCK_ROWS = int(os.environ.get("RT795_BLOCK_ROWS", "0")) or 64
# The MULTIPACK kernels prefer a smaller block: with TLAS culling the
# per-block pack list shrinks as blocks get tighter (16 rows cull to fewer
# packs AND tighter node unions than 64), and the old cost of more blocks —
# re-streaming every pack per block — is gone because culled packs never
# DMA. Measured on rock1800k primaries/shadows: 101/253 ms at 16 rows vs
# 170/387 at 64, with 8 and 32 both worse (129/319, 120/283). Single-pack
# kernels keep BLOCK_ROWS=64 (no pack list to tighten; 64 amortizes the
# scalar node walk best there). RT795_MULTI_BLOCK_ROWS overrides.
MULTI_BLOCK_ROWS = int(os.environ.get("RT795_MULTI_BLOCK_ROWS", "0")) or 16
LANES = 128
BLOCK = BLOCK_ROWS * LANES
_BIG = 3.0e38   # plain float: a jnp scalar would be a captured kernel const

# VMEM budget for the two packed tables (node + tri rows); a group whose
# pack exceeds this must use the jnp fallback. ~12 MB of the ~16 MB VMEM.
MAX_PACK_BYTES = 12 * 1024 * 1024


class BVHPack(NamedTuple):
    """Device tables for the traversal kernel (a jnp pytree).

    ``tri_rows`` holds the load-time baked triangle components; the trace
    path instead rebuilds them IN-GRAPH from the live ``scene.vertices``
    via ``slot_prim`` (fresh_tri_rows) so vertex optimization moves the
    intersected geometry. Node bounds stay load-time (same staleness class
    as the flat-BVH boxes of the jnp path: conservative for small vertex
    steps; rebuild the scene to refit after large moves).
    """

    node_rows: jnp.ndarray      # [M, 128] f32
    tri_rows: jnp.ndarray       # [R, 128] f32
    slot_prim: jnp.ndarray      # [R, 9] int32 global prim id per slot, -1 pad


def pack_nbytes(pack: "BVHPack") -> int:
    return (pack.node_rows.size + pack.tri_rows.size) * 4


def fresh_tri_rows(slot_prim, verts, tri_vidx) -> jnp.ndarray:
    """Rebuild kernel triangle rows from LIVE vertices (in-graph).

    ``slot_prim`` [..., R, 9]: global prim id per row slot (-1 pad). The
    component math mirrors _tri_comps exactly (same op order -> same bits
    as the baked tables when vertices are unchanged). [T]-sized work; XLA's
    loop-invariant code motion hoists it out of the integrator's bounce
    loop since it depends only on the (loop-invariant) scene.
    """
    verts = jnp.asarray(verts)
    tri_vidx = jnp.asarray(tri_vidx)
    a = verts[tri_vidx[:, 0]]
    b = verts[tri_vidx[:, 1]]
    c = verts[tri_vidx[:, 2]]
    e1 = a - b
    e2 = a - c
    ng = jnp.cross(e1, e2)
    comp = jnp.concatenate([a, e1, e2, ng], axis=1)     # [T, 12]
    T_ = comp.shape[0]
    lead = slot_prim.shape[:-2]
    sp = slot_prim.reshape((-1, TRIS_PER_ROW))          # [R*, 9]
    valid = sp >= 0
    vals = comp[jnp.clip(sp, 0, T_ - 1)]                # [R*, 9, 12]
    vals = jnp.where(valid[..., None], vals, 0.0)
    primf = jnp.where(valid, sp, 0).astype(jnp.float32)
    pieces = []
    for j in range(TRIS_PER_ROW):
        pieces.append(vals[:, j])
        pieces.append(primf[:, j:j + 1])
    pieces.append(jnp.zeros((sp.shape[0], LANES - TRIS_PER_ROW * COMPS),
                            jnp.float32))
    rows = jnp.concatenate(pieces, axis=1)              # [R*, 128]
    return rows.reshape(lead + (slot_prim.shape[-2], LANES))


def _tri_comps(verts: np.ndarray, tri_vidx: np.ndarray) -> np.ndarray:
    """Per-triangle packed components [T, 12]: a, e1=a-b, e2=a-c, ng=e1xe2
    (reference column convention, src/Shape.cpp:120-132)."""
    verts = np.asarray(verts, np.float32)
    tri_vidx = np.asarray(tri_vidx, np.int32)
    a = verts[tri_vidx[:, 0]]
    b = verts[tri_vidx[:, 1]]
    c = verts[tri_vidx[:, 2]]
    e1 = a - b
    e2 = a - c
    ng = np.cross(e1, e2)
    return np.concatenate([a, e1, e2, ng], axis=1)


def build_pack(flat: T.FlatBVH, verts: np.ndarray, tri_vidx: np.ndarray,
               comp: np.ndarray | None = None, as_arrays: bool = False):
    """Pack a flat BVH + its (leaf-ordered) triangles into kernel tables.

    ``tri_vidx`` must already be in the BVH's permuted (leaf-contiguous)
    order — exactly what the loader stores in the group after ``bvh.build``.
    Leaf (first, count) prim ranges are re-addressed to (first_row, n_rows)
    with per-slot prim ids, so the kernel needs no count arithmetic.
    ``flat.first`` may be globally offset (multi-pack); ``comp``/``tri_vidx``
    are then the FULL group tables indexed by those global ids.
    ``as_arrays`` returns raw numpy (node_rows, tri_rows) for multi-pack
    stacking instead of a device BVHPack.
    """
    if comp is None:
        comp = _tri_comps(verts, tri_vidx)

    first = np.asarray(flat.first)
    count = np.asarray(flat.count)
    miss = np.asarray(flat.miss)
    bmin = np.asarray(flat.bmin, np.float32)
    bmax = np.asarray(flat.bmax, np.float32)
    n_nodes = first.shape[0]

    # --- triangle rows, leaf by leaf (vectorized over rows) ---
    node_first_row = np.zeros(n_nodes, np.int32)
    node_n_rows = np.zeros(n_nodes, np.int32)
    leaf_ids = np.nonzero(count > 0)[0]
    if leaf_ids.size:
        leaf_rows = -(-count[leaf_ids] // TRIS_PER_ROW)     # rows per leaf
        row_start = np.concatenate([[0], np.cumsum(leaf_rows)])
        node_first_row[leaf_ids] = row_start[:-1]
        node_n_rows[leaf_ids] = leaf_rows
        n_rows_total = int(row_start[-1])
        row_leaf = np.repeat(np.arange(leaf_ids.size), leaf_rows)   # [R]
        row_sub = np.arange(n_rows_total) - row_start[row_leaf]     # [R]
        tri_rows = np.zeros((n_rows_total, LANES), np.float32)
        slot_prim = np.full((n_rows_total, TRIS_PER_ROW), -1, np.int32)
        r_first = first[leaf_ids][row_leaf]
        r_count = count[leaf_ids][row_leaf]
        for j in range(TRIS_PER_ROW):
            k = row_sub * TRIS_PER_ROW + j
            ok = k < r_count
            prim = np.where(ok, r_first + k, 0)
            base = j * COMPS
            tri_rows[:, base:base + 12] = np.where(ok[:, None],
                                                   comp[prim], 0.0)
            tri_rows[:, base + 12] = np.where(ok, prim, 0).astype(np.float32)
            slot_prim[:, j] = np.where(ok, prim, -1)
            # pad slots keep ng = 0 -> det = 0 -> self-rejecting
    else:
        tri_rows = np.zeros((1, LANES), np.float32)
        slot_prim = np.full((1, TRIS_PER_ROW), -1, np.int32)

    # node depth in the DFS order (for the kernel's per-lane ancestor
    # validity mask): inner node i's subtree spans [i+1, miss[i]) one
    # level deeper; a stack of (subtree end, restore depth) walks it.
    depth = np.zeros(n_nodes, np.int32)
    dstack = []
    dcur = 0
    for i in range(n_nodes):
        while dstack and dstack[-1][0] == i:
            dcur = dstack.pop()[1]
        depth[i] = dcur
        if count[i] == 0:
            dstack.append((miss[i], dcur))
            dcur += 1
    assert depth.max(initial=0) < 31, "ancestor bitmask needs depth < 31"

    fields = np.zeros((n_nodes, 10), np.float32)
    fields[:, 0:3] = bmin
    fields[:, 3:6] = bmax
    fields[:, 6] = node_first_row.astype(np.float32)
    fields[:, 7] = node_n_rows.astype(np.float32)
    fields[:, 8] = miss.astype(np.float32)
    fields[:, 9] = depth.astype(np.float32)
    n_rows_packed = -(-n_nodes // NODES_PER_ROW)
    node_rows = np.zeros((n_rows_packed, LANES), np.float32)
    for k in range(NODES_PER_ROW):
        sl = fields[k::NODES_PER_ROW]
        node_rows[:sl.shape[0], k * NODE_STRIDE:k * NODE_STRIDE + 10] = sl
    if as_arrays:
        return node_rows, tri_rows, slot_prim
    return BVHPack(node_rows=jnp.asarray(node_rows),
                   tri_rows=jnp.asarray(tri_rows),
                   slot_prim=jnp.asarray(slot_prim))


# --------------------------------------------------------------------------
# Kernels
# --------------------------------------------------------------------------

def _slab(ox, oy, oz, dx, dy, dz, ix, iy, iz, bmin, bmax):
    """Reference slab test (src/BVH.cpp:212-266) of one scalar box against
    the whole ray block; d == 0 lanes reject via inf/NaN (quirk kept).

    Returns (box_hit, entry, exit). box_hit is a LINE test (a box fully
    behind the origin still hits: entry <= exit < 0) — exactly the
    reference's semantics. The kernels' ``live`` masks additionally reject
    definitively-behind boxes (``exit < -eps`` for nearest, ``exit <= 0``
    for any-hit) as a pure optimization: every triangle inside such a box
    intersects the ray at t < -eps (resp. t <= 0) and fails the triangle
    test's t bound anyway, so culling the subtree cannot change any hit.
    Those rejections are written NaN-safely (``~(exit < c)``) so the d == 0
    inf/NaN lanes keep their exact oracle behavior."""
    entry = jnp.full_like(ox, -jnp.inf)
    exit_ = jnp.full_like(ox, jnp.inf)
    for o, d, inv, k in ((ox, dx, ix, 0), (oy, dy, iy, 1), (oz, dz, iz, 2)):
        lo, hi = bmin[k], bmax[k]
        pos = d > 0
        t_e = jnp.where(pos, (lo - o) * inv, (hi - o) * inv)
        t_l = jnp.where(pos, (hi - o) * inv, (lo - o) * inv)
        entry = jnp.maximum(entry, t_e)
        exit_ = jnp.minimum(exit_, t_l)
    return ~(exit_ < entry), entry, exit_


def _tri_block_test(row, j, ox, oy, oz, dx, dy, dz, int_eps):
    """Cramer test (src/Shape.cpp:120-132) of the row's j-th triangle
    (static lane extraction) against the block. Returns (ok, t, prim)."""
    base = j * COMPS
    ax, ay, az = row[0, base + 0], row[0, base + 1], row[0, base + 2]
    e1x, e1y, e1z = row[0, base + 3], row[0, base + 4], row[0, base + 5]
    e2x, e2y, e2z = row[0, base + 6], row[0, base + 7], row[0, base + 8]
    ngx, ngy, ngz = row[0, base + 9], row[0, base + 10], row[0, base + 11]
    prim = row[0, base + 12]

    aox, aoy, aoz = ax - ox, ay - oy, az - oz
    # e2 x d (scalar e2, vector d)
    cx = e2y * dz - e2z * dy
    cy = e2z * dx - e2x * dz
    cz = e2x * dy - e2y * dx
    det = e1x * cx + e1y * cy + e1z * cz
    inv_det = 1.0 / det
    beta = (aox * cx + aoy * cy + aoz * cz) * inv_det
    # e1 x d
    gx = e1y * dz - e1z * dy
    gy = e1z * dx - e1x * dz
    gz = e1x * dy - e1y * dx
    gamma = -(aox * gx + aoy * gy + aoz * gz) * inv_det
    t = (ngx * aox + ngy * aoy + ngz * aoz) * inv_det
    ok = ((t >= -int_eps) & (beta >= -int_eps) & (gamma >= -int_eps)
          & (beta + gamma <= 1.0))
    return ok, t, prim


def _read_node(nodes_ref, node):
    """One dynamic-sublane row read + parity selects -> node fields."""
    import jax.experimental.pallas as pl

    row = nodes_ref[pl.ds(node // NODES_PER_ROW, 1), :]
    odd = (node % NODES_PER_ROW) == 1

    def fld(k):
        return jnp.where(odd, row[0, NODE_STRIDE + k], row[0, k])

    bmin = (fld(0), fld(1), fld(2))
    bmax = (fld(3), fld(4), fld(5))
    first_row = fld(6).astype(jnp.int32)
    n_rows = fld(7).astype(jnp.int32)
    miss = fld(8).astype(jnp.int32)
    depth = fld(9).astype(jnp.int32)
    return bmin, bmax, first_row, n_rows, miss, depth


def _ray_regs(o_refs, d_refs):
    ox, oy, oz = (r[:] for r in o_refs)
    dx, dy, dz = (r[:] for r in d_refs)
    ix, iy, iz = 1.0 / dx, 1.0 / dy, 1.0 / dz
    nan = (jnp.isnan(ox) | jnp.isnan(oy) | jnp.isnan(oz)
           | jnp.isnan(dx) | jnp.isnan(dy) | jnp.isnan(dz))
    alive = ~(nan | ((dx == 0.0) & (dy == 0.0) & (dz == 0.0)))
    return ox, oy, oz, dx, dy, dz, ix, iy, iz, alive


def _nearest_kernel(max_leaf_rows, n_nodes,
                    eps_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                    nodes_ref, tris_ref,
                    key_ref, t_ref, idx_ref):
    import jax.experimental.pallas as pl

    int_eps = eps_ref[0]
    ox, oy, oz, dx, dy, dz, ix, iy, iz, alive = _ray_regs(
        (ox_ref, oy_ref, oz_ref), (dx_ref, dy_ref, dz_ref))

    key_ref[:] = jnp.full((BLOCK_ROWS, LANES), _BIG)
    t_ref[:] = jnp.zeros((BLOCK_ROWS, LANES), jnp.float32)
    idx_ref[:] = jnp.zeros((BLOCK_ROWS, LANES), jnp.int32)

    def body(state):
        node, hm = state
        bmin, bmax, first_row, n_rows, miss, dd = _read_node(nodes_ref, node)

        box_hit, entry, exit_ = _slab(ox, oy, oz, dx, dy, dz, ix, iy, iz,
                                      bmin, bmax)
        # per-lane ancestor validity (bit d of hm = lane hit the depth-d
        # node of the current DFS path): a lane only stays live where it
        # hit EVERY ancestor, exactly like the per-lane oracle walk. This
        # closes the documented d == 0 NaN-entry deviation: a lane that
        # cleanly missed a parent can no longer ride the block into the
        # subtree and accept a triangle there.
        anc_mask = (jnp.int32(1) << dd) - 1
        anc_ok = (hm & anc_mask) == anc_mask
        bit = jnp.int32(1) << dd
        hm = jnp.where(box_hit, hm | bit, hm & ~bit)
        # ~(exit < -eps): cull definitively-behind boxes (line-test quirk
        # walks them otherwise; their triangles all fail t >= -eps) — see
        # _slab. NaN-safe so d == 0 quirk lanes stay on the oracle path.
        live = (box_hit & ~(exit_ < -int_eps) & anc_ok
                & ~(entry > key_ref[:]) & alive)
        any_live = jnp.any(live)
        is_leaf = n_rows > 0

        # static row loop (leaf row counts are bounded by max_leaf_rows);
        # each row's 9 triangle tests are statically unrolled lane slots
        for r in range(max_leaf_rows):
            @pl.when(any_live & (r < n_rows))
            def _(r=r):
                row = tris_ref[pl.ds(first_row + r, 1), :]
                best_key = key_ref[:]
                best_t = t_ref[:]
                best_idx = idx_ref[:]
                for j in range(TRIS_PER_ROW):
                    ok, t, prim = _tri_block_test(
                        row, j, ox, oy, oz, dx, dy, dz, int_eps)
                    ok = ok & live
                    key = jnp.where(ok, jnp.abs(t), _BIG)
                    upd = key < best_key
                    best_t = jnp.where(upd, t, best_t)
                    best_idx = jnp.where(upd, prim.astype(jnp.int32),
                                         best_idx)
                    best_key = jnp.minimum(best_key, key)
                key_ref[:] = best_key
                t_ref[:] = best_t
                idx_ref[:] = best_idx

        descend = any_live & ~is_leaf
        return jnp.where(descend, node + 1, miss), hm

    jax.lax.while_loop(lambda s: s[0] < n_nodes, body,
                       (jnp.int32(0),
                        jnp.zeros((BLOCK_ROWS, LANES), jnp.int32)))


def _anyhit_kernel(max_leaf_rows, n_nodes,
                   eps_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                   cap_ref, nodes_ref, tris_ref, found_ref):
    import jax.experimental.pallas as pl

    int_eps = eps_ref[0]
    ox, oy, oz, dx, dy, dz, ix, iy, iz, alive = _ray_regs(
        (ox_ref, oy_ref, oz_ref), (dx_ref, dy_ref, dz_ref))
    t_cap = cap_ref[:]

    found_ref[:] = jnp.zeros((BLOCK_ROWS, LANES), jnp.int32)

    def body(state):
        node, hm = state
        bmin, bmax, first_row, n_rows, miss, dd = _read_node(nodes_ref, node)

        box_hit, entry, exit_ = _slab(ox, oy, oz, dx, dy, dz, ix, iy, iz,
                                      bmin, bmax)
        anc_mask = (jnp.int32(1) << dd) - 1
        anc_ok = (hm & anc_mask) == anc_mask
        bit = jnp.int32(1) << dd
        hm = jnp.where(box_hit, hm | bit, hm & ~bit)
        # ~(exit <= 0): any-hit accepts only t > 0, so boxes fully behind
        # (or ending at) the origin cannot contain an occluder — see _slab
        live = (box_hit & ~(exit_ <= 0.0) & anc_ok & ~(entry > t_cap)
                & alive & (found_ref[:] == 0))
        any_live = jnp.any(live)
        is_leaf = n_rows > 0

        for r in range(max_leaf_rows):
            @pl.when(any_live & (r < n_rows))
            def _(r=r):
                row = tris_ref[pl.ds(first_row + r, 1), :]
                found = found_ref[:]
                for j in range(TRIS_PER_ROW):
                    ok, t, _ = _tri_block_test(
                        row, j, ox, oy, oz, dx, dy, dz, int_eps)
                    hit = ok & live & (t > 0) & (t < t_cap)
                    found = jnp.where(hit, 1, found)
                found_ref[:] = found

        # early exit the whole block once every live lane has its answer
        done = ~jnp.any(alive & (found_ref[:] == 0))
        descend = any_live & ~is_leaf
        nxt = jnp.where(descend, node + 1, miss)
        return jnp.where(done, n_nodes, nxt), hm

    jax.lax.while_loop(lambda s: s[0] < n_nodes, body,
                       (jnp.int32(0),
                        jnp.zeros((BLOCK_ROWS, LANES), jnp.int32)))


# --------------------------------------------------------------------------
# Host wrappers
# --------------------------------------------------------------------------

def _pad_block(x, fill, rows: int = BLOCK_ROWS):
    n = x.shape[0]
    pad = (-n) % (rows * LANES)
    if pad:
        x = jnp.concatenate([x, jnp.full((pad,), fill, x.dtype)])
    return x.reshape(-1, LANES), n


def _specs():
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    block = pl.BlockSpec((BLOCK_ROWS, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem1 = pl.BlockSpec(memory_space=pltpu.SMEM)
    return block, full, smem1


@functools.partial(jax.jit,
                   static_argnames=("n_nodes", "max_leaf_rows", "interpret"))
def _nearest_call(o, d, node_rows, tri_rows, int_eps, n_nodes: int,
                  max_leaf_rows: int, interpret: bool):
    import jax.experimental.pallas as pl

    (ox, n), (oy, _), (oz, _) = (_pad_block(c, jnp.nan) for c in o)
    (dx, _), (dy, _), (dz, _) = (_pad_block(c, jnp.nan) for c in d)
    n_rows_total = ox.shape[0]
    n_blocks = n_rows_total // BLOCK_ROWS
    block, full, smem1 = _specs()
    eps = jnp.asarray(int_eps, jnp.float32).reshape(1)

    kernel = functools.partial(_nearest_kernel, max_leaf_rows, n_nodes)
    out_shape = [
        jax.ShapeDtypeStruct((n_rows_total, LANES), jnp.float32),
        jax.ShapeDtypeStruct((n_rows_total, LANES), jnp.float32),
        jax.ShapeDtypeStruct((n_rows_total, LANES), jnp.int32),
    ]
    key, t, idx = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        out_shape=out_shape,
        in_specs=[smem1] + [block] * 6 + [full, full],
        out_specs=[block] * 3,
        interpret=interpret,
    )(eps, ox, oy, oz, dx, dy, dz, node_rows, tri_rows)
    return key.reshape(-1)[:n], t.reshape(-1)[:n], idx.reshape(-1)[:n]


@functools.partial(jax.jit,
                   static_argnames=("n_nodes", "max_leaf_rows", "interpret"))
def _anyhit_call(o, d, t_cap, node_rows, tri_rows, int_eps, n_nodes: int,
                 max_leaf_rows: int, interpret: bool):
    import jax.experimental.pallas as pl

    (ox, n), (oy, _), (oz, _) = (_pad_block(c, jnp.nan) for c in o)
    (dx, _), (dy, _), (dz, _) = (_pad_block(c, jnp.nan) for c in d)
    cap, _ = _pad_block(t_cap, 0.0)
    n_rows_total = ox.shape[0]
    n_blocks = n_rows_total // BLOCK_ROWS
    block, full, smem1 = _specs()
    eps = jnp.asarray(int_eps, jnp.float32).reshape(1)

    kernel = functools.partial(_anyhit_kernel, max_leaf_rows, n_nodes)
    found = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        out_shape=jax.ShapeDtypeStruct((n_rows_total, LANES), jnp.int32),
        in_specs=[smem1] + [block] * 7 + [full, full],
        out_specs=block,
        interpret=interpret,
    )(eps, ox, oy, oz, dx, dy, dz, cap, node_rows, tri_rows)
    return found.reshape(-1)[:n] != 0


def max_leaf_rows_of(max_leaf: int) -> int:
    return -(-max_leaf // TRIS_PER_ROW)


def tri_bvh_nearest(pack: BVHPack, local_o, local_d, int_eps,
                    n_nodes: int, max_leaf: int, interpret: bool = False
                    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Nearest-hit query: (|t| key, t, permuted prim index), [N] each.

    ``n_nodes`` is the TRUE node count of the flat BVH (node rows pack two
    nodes each); it bounds the skip-link walk and is the done sentinel.
    """
    return _nearest_call(local_o, local_d, pack.node_rows, pack.tri_rows,
                         int_eps, int(n_nodes), max_leaf_rows_of(max_leaf),
                         interpret)


def tri_bvh_anyhit(pack: BVHPack, local_o, local_d, t_cap, int_eps,
                   n_nodes: int, max_leaf: int,
                   interpret: bool = False) -> jnp.ndarray:
    """Occlusion query: any accepted triangle with t in (0, t_cap)? [N]."""
    t_cap = jnp.broadcast_to(jnp.asarray(t_cap, jnp.float32),
                             local_o.x.shape)
    return _anyhit_call(local_o, local_d, t_cap, pack.node_rows,
                        pack.tri_rows, int_eps, int(n_nodes),
                        max_leaf_rows_of(max_leaf), interpret)


# --------------------------------------------------------------------------
# Multi-pack streaming traversal: beyond-VMEM meshes (the reference's
# flagship 1.8M-triangle dragon, pages/Page2.md:57)
# --------------------------------------------------------------------------
#
# A single pack is capped at ~140k triangles by VMEM. Bigger groups are
# partitioned into K packs of <= PACK_TRIS triangles by Morton order of the
# triangle centroids (spatially coherent chunks), each with its own flat
# skip-link BVH. The kernel grid is (ray_block, pack_slot) with the pack
# axis INNERMOST: the per-ray-block best-hit registers live in the output
# refs and accumulate across consecutive pack steps (legal revisiting).
#
# TLAS pack culling + front-to-back ordering (round-5: the round-4 walk
# re-fetched and re-walked ALL packs from every ray block — ~10 GB of DMA
# per wavefront at 1.8M tris and a per-block cost linear in packs): a
# cheap in-graph jnp pass slab-tests every ray block against each pack's
# ROOT bbox (the exact test the kernel would run at that pack's root) and
# builds a per-block pack list sorted by root entry distance, padded by
# repeating the last entry. The list feeds the kernel through scalar
# prefetch (PrefetchScalarGridSpec): the node/tri BlockSpec index maps
# read pack_list[i, k], so culled packs are never DMA'd at all (repeated
# consecutive indices skip the copy), touched packs stream in exactly
# once per block, and the front-to-back order makes the per-lane
# `entry > best` prune kill occluded packs at their root.

PACK_TRIS = int(os.environ.get("RT795_PACK_TRIS", "0")) or 63 * 1024
# Multipack pack builds use FATTER leaves than the default 36: the packet
# walk is latency-bound on sequential node steps (each step's vector work
# is far below VPU saturation at 16-row blocks), so halving the node count
# for 2x the per-leaf triangle rows is a straight win — measured on
# rock1800k: nearest 101 -> 90 ms, shadow anyhit 253 -> 215 ms (leaf 108
# is flat vs 72). Single-pack builds and the jnp oracle keep 36 (the
# oracle's per-leaf gather loop unrolls K and pays linearly on CPU).
PACK_LEAF = int(os.environ.get("RT795_PACK_LEAF", "0")) or 72


@T._dataclass_pytree(meta=("max_leaf",))
class MultiPack:
    """Stacked per-pack kernel tables (pytree; ``max_leaf`` static)."""

    node_rows: Any      # [K, NR, 128] f32 (row-padded per pack)
    tri_rows: Any       # [K, TR, 128] f32
    n_nodes: Any        # [K] int32 true node count per pack
    slot_prim: Any = None   # [K, TR, 9] int32 global prim per slot, -1 pad
    root_bbox: Any = None   # [K, 6] f32 pack-root (bmin, bmax) for TLAS
    max_leaf: int = 36


def multipack_nbytes(mp: "MultiPack") -> int:
    return (np.prod(mp.node_rows.shape) + np.prod(mp.tri_rows.shape)) * 4


def _morton3(q: np.ndarray) -> np.ndarray:
    """Interleave 3x10-bit quantized coords into 30-bit Morton keys."""
    out = np.zeros(q.shape[0], np.int64)
    for b in range(10):
        for ax in range(3):
            out |= ((q[:, ax].astype(np.int64) >> b) & 1) << (3 * b + ax)
    return out


def build_multipack(verts: np.ndarray, tri_vidx: np.ndarray, build_fn,
                    pack_tris: int | None = None
                    ) -> Tuple["MultiPack", np.ndarray, tuple]:
    """Partition + per-pack build for a beyond-VMEM triangle group.

    Returns (MultiPack, perm, pack_bvhs): ``perm`` is the global triangle
    permutation (Morton chunking composed with each pack's leaf order) the
    caller must apply to its SoA; ``pack_bvhs`` are the per-pack FlatBVHs
    with GLOBALLY-offset ``first`` ids — the jnp fallback walks them
    sequentially against the group's full triangle tables.
    """
    verts = np.asarray(verts, np.float32)
    tri_vidx = np.asarray(tri_vidx, np.int32)
    n = tri_vidx.shape[0]
    cent = (verts[tri_vidx[:, 0]] + verts[tri_vidx[:, 1]]
            + verts[tri_vidx[:, 2]]) / 3.0
    lo, hi = cent.min(0), cent.max(0)
    q = np.clip(((cent - lo) / np.maximum(hi - lo, 1e-30) * 1023.0), 0,
                1023).astype(np.int32)
    order = np.argsort(_morton3(q), kind="stable").astype(np.int32)

    if pack_tris is None:
        pack_tris = PACK_TRIS
    n_packs = -(-n // pack_tris)
    from concurrent.futures import ThreadPoolExecutor

    from raytracer795_tpu.ops import bvh as bvh_mod

    chunk_ids = [order[p * pack_tris:(p + 1) * pack_tris]
                 for p in range(n_packs)]

    def build_one(ids):
        pbmin, pbmax = bvh_mod.tri_bounds(verts, tri_vidx[ids])
        return build_fn(pbmin, pbmax, leaf_size=PACK_LEAF)

    # the native nth_element builder releases the GIL during the C call,
    # so pack builds overlap (1.8M-triangle load: ~17 s -> ~10 s here)
    with ThreadPoolExecutor(max_workers=min(4, n_packs)) as ex:
        built = list(ex.map(build_one, chunk_ids))

    perm_parts, flats, node_tabs, tri_tabs = [], [], [], []
    start = 0
    for ids, (flat, pperm) in zip(chunk_ids, built):
        ids = ids[pperm]                    # pack-local leaf order
        flat = T.FlatBVH(bmin=flat.bmin, bmax=flat.bmax,
                         first=np.asarray(flat.first) + start,
                         count=flat.count, miss=flat.miss,
                         max_leaf=flat.max_leaf)
        perm_parts.append(ids)
        flats.append(flat)
        start += ids.shape[0]
    perm = np.concatenate(perm_parts)
    tri_vidx_g = tri_vidx[perm]
    comp = _tri_comps(verts, tri_vidx_g)
    sp_tabs = []
    for flat in flats:
        nr, tr, sp = build_pack(flat, verts, tri_vidx_g, comp=comp,
                                as_arrays=True)
        node_tabs.append(nr)
        tri_tabs.append(tr)
        sp_tabs.append(sp)

    NR = max(t.shape[0] for t in node_tabs)
    TR = max(t.shape[0] for t in tri_tabs)
    node_rows = np.zeros((n_packs, NR, LANES), np.float32)
    tri_rows = np.zeros((n_packs, TR, LANES), np.float32)
    slot_prim = np.full((n_packs, TR, TRIS_PER_ROW), -1, np.int32)
    for p in range(n_packs):
        node_rows[p, :node_tabs[p].shape[0]] = node_tabs[p]
        tri_rows[p, :tri_tabs[p].shape[0]] = tri_tabs[p]
        slot_prim[p, :sp_tabs[p].shape[0]] = sp_tabs[p]
    root_bbox = np.stack([np.concatenate([np.asarray(f.bmin)[0],
                                          np.asarray(f.bmax)[0]])
                          for f in flats]).astype(np.float32)
    mp = MultiPack(
        node_rows=jnp.asarray(node_rows), tri_rows=jnp.asarray(tri_rows),
        n_nodes=jnp.asarray([f.first.shape[0] for f in flats], jnp.int32),
        slot_prim=jnp.asarray(slot_prim),
        root_bbox=jnp.asarray(root_bbox),
        max_leaf=max(int(f.max_leaf) for f in flats))
    return mp, perm, tuple(flats)


def _block_pack_lists(comps, root_bbox, n_blocks: int, int_eps,
                      caps=None):
    """TLAS pass: per-ray-block culled, front-to-back pack lists.

    ``comps`` = (ox, oy, oz, dx, dy, dz) in padded block layout
    [n_rows, 128]. For every (block, pack) pair this runs EXACTLY the root
    ``live`` test the traversal kernel would run at that pack's root (same
    _slab math, d == 0 quirk included, behind-box cull, and — via ``caps``,
    the per-lane any-hit t_cap in the same padded layout — the kernel's
    ``entry > t_cap`` rejection), so culling a pack only skips work the
    kernel would reject in its first node step — plus the whole table DMA.
    Returns (pack_list [n_blocks, K] int32 — root-hit packs first, sorted
    by min entry distance over the block's live lanes, then the remaining
    slots repeating the LAST touched pack so consecutive grid steps map to
    the same table block and Pallas skips the copy; pack_count [n_blocks]).
    """
    ox, oy, oz, dx, dy, dz = (c.reshape(n_blocks, -1) for c in comps)
    ix, iy, iz = 1.0 / dx, 1.0 / dy, 1.0 / dz
    nan = (jnp.isnan(ox) | jnp.isnan(oy) | jnp.isnan(oz)
           | jnp.isnan(dx) | jnp.isnan(dy) | jnp.isnan(dz))
    alive = ~(nan | ((dx == 0.0) & (dy == 0.0) & (dz == 0.0)))
    if caps is not None:
        caps = caps.reshape(n_blocks, -1)
    K = root_bbox.shape[0]
    hits, keys = [], []
    for k in range(K):
        bmin = (root_bbox[k, 0], root_bbox[k, 1], root_bbox[k, 2])
        bmax = (root_bbox[k, 3], root_bbox[k, 4], root_bbox[k, 5])
        box_hit, entry, exit_ = _slab(ox, oy, oz, dx, dy, dz, ix, iy, iz,
                                      bmin, bmax)
        if caps is None:        # nearest: kernel root rejects exit < -eps
            live = box_hit & ~(exit_ < -int_eps) & alive
        else:                   # any-hit: exit <= 0 or entry > t_cap
            live = (box_hit & ~(exit_ <= 0.0) & ~(entry > caps) & alive)
        hits.append(jnp.any(live, axis=1))
        # ordering key: nearest root entry over live lanes; NaN/-inf
        # entries (d == 0 quirk / origin-inside-box) sanitize to 0 so the
        # pack sorts by "reachable now" — ordering is a heuristic, the
        # per-lane `entry > best` prune keeps correctness either way
        ekey = jnp.where(live & jnp.isfinite(entry),
                         jnp.maximum(entry, 0.0), _BIG)
        keys.append(jnp.min(ekey, axis=1))
    hit = jnp.stack(hits, axis=1)                       # [n_blocks, K]
    key = jnp.where(hit, jnp.stack(keys, axis=1), jnp.inf)
    order = jnp.argsort(key, axis=1).astype(jnp.int32)  # hits first, f2b
    count = jnp.sum(hit, axis=1).astype(jnp.int32)
    last = jnp.take_along_axis(
        order, jnp.maximum(count - 1, 0)[:, None], axis=1)
    slot = jnp.arange(K, dtype=jnp.int32)[None, :]
    pack_list = jnp.where(slot < count[:, None], order, last)
    return pack_list, count


def _full_pack_lists(n_blocks: int, K: int):
    """No-TLAS fallback (root_bbox is None): every block walks every pack."""
    pack_list = jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32)[None, :],
                                 (n_blocks, K))
    return pack_list, jnp.full((n_blocks,), K, jnp.int32)


def _nearest_multi_kernel(max_leaf_rows, block_rows,
                          pl_ref, pc_ref, nn_ref,
                          eps_ref, ox_ref, oy_ref, oz_ref,
                          dx_ref, dy_ref, dz_ref, nodes_ref, tris_ref,
                          key_ref, t_ref, idx_ref):
    import jax.experimental.pallas as pl

    i = pl.program_id(0)
    k = pl.program_id(1)
    # culled slot: n_nodes = 0 makes the walk a no-op (the table block
    # mapped here is a repeat of the last touched pack — already in VMEM)
    n_nodes = jnp.where(k < pc_ref[i], nn_ref[pl_ref[i, k]], 0)
    int_eps = eps_ref[0]
    ox, oy, oz, dx, dy, dz, ix, iy, iz, alive = _ray_regs(
        (ox_ref, oy_ref, oz_ref), (dx_ref, dy_ref, dz_ref))
    nodes2 = nodes_ref.at[0]
    tris2 = tris_ref.at[0]

    @pl.when(k == 0)
    def _():
        key_ref[:] = jnp.full((block_rows, LANES), _BIG)
        t_ref[:] = jnp.zeros((block_rows, LANES), jnp.float32)
        idx_ref[:] = jnp.zeros((block_rows, LANES), jnp.int32)

    def body(state):
        node, hm = state
        bmin, bmax, first_row, n_rows, miss, dd = _read_node(nodes2, node)
        box_hit, entry, exit_ = _slab(ox, oy, oz, dx, dy, dz, ix, iy, iz,
                                      bmin, bmax)
        anc_mask = (jnp.int32(1) << dd) - 1
        anc_ok = (hm & anc_mask) == anc_mask
        bit = jnp.int32(1) << dd
        hm = jnp.where(box_hit, hm | bit, hm & ~bit)
        # behind-box cull (see _slab): NaN-safe, result-preserving
        live = (box_hit & ~(exit_ < -int_eps) & anc_ok
                & ~(entry > key_ref[:]) & alive)
        any_live = jnp.any(live)
        is_leaf = n_rows > 0

        for r in range(max_leaf_rows):
            @pl.when(any_live & (r < n_rows))
            def _(r=r):
                row = tris2[pl.ds(first_row + r, 1), :]
                best_key = key_ref[:]
                best_t = t_ref[:]
                best_idx = idx_ref[:]
                for j in range(TRIS_PER_ROW):
                    ok, t, prim = _tri_block_test(
                        row, j, ox, oy, oz, dx, dy, dz, int_eps)
                    ok = ok & live
                    key = jnp.where(ok, jnp.abs(t), _BIG)
                    upd = key < best_key
                    best_t = jnp.where(upd, t, best_t)
                    best_idx = jnp.where(upd, prim.astype(jnp.int32),
                                         best_idx)
                    best_key = jnp.minimum(best_key, key)
                key_ref[:] = best_key
                t_ref[:] = best_t
                idx_ref[:] = best_idx

        descend = any_live & ~is_leaf
        return jnp.where(descend, node + 1, miss), hm

    jax.lax.while_loop(lambda s: s[0] < n_nodes, body,
                       (jnp.int32(0),
                        jnp.zeros((block_rows, LANES), jnp.int32)))


def _anyhit_multi_kernel(max_leaf_rows, block_rows,
                         pl_ref, pc_ref, nn_ref,
                         eps_ref, ox_ref, oy_ref, oz_ref,
                         dx_ref, dy_ref, dz_ref, cap_ref,
                         nodes_ref, tris_ref, found_ref):
    import jax.experimental.pallas as pl

    i = pl.program_id(0)
    k = pl.program_id(1)
    n_nodes = jnp.where(k < pc_ref[i], nn_ref[pl_ref[i, k]], 0)
    int_eps = eps_ref[0]
    ox, oy, oz, dx, dy, dz, ix, iy, iz, alive = _ray_regs(
        (ox_ref, oy_ref, oz_ref), (dx_ref, dy_ref, dz_ref))
    t_cap = cap_ref[:]
    nodes2 = nodes_ref.at[0]
    tris2 = tris_ref.at[0]

    @pl.when(k == 0)
    def _():
        found_ref[:] = jnp.zeros((block_rows, LANES), jnp.int32)

    def body(state):
        node, hm = state
        bmin, bmax, first_row, n_rows, miss, dd = _read_node(nodes2, node)
        box_hit, entry, exit_ = _slab(ox, oy, oz, dx, dy, dz, ix, iy, iz,
                                      bmin, bmax)
        anc_mask = (jnp.int32(1) << dd) - 1
        anc_ok = (hm & anc_mask) == anc_mask
        bit = jnp.int32(1) << dd
        hm = jnp.where(box_hit, hm | bit, hm & ~bit)
        # behind-box cull (see _slab): NaN-safe, result-preserving
        live = (box_hit & ~(exit_ <= 0.0) & anc_ok & ~(entry > t_cap)
                & alive & (found_ref[:] == 0))
        any_live = jnp.any(live)
        is_leaf = n_rows > 0

        for r in range(max_leaf_rows):
            @pl.when(any_live & (r < n_rows))
            def _(r=r):
                row = tris2[pl.ds(first_row + r, 1), :]
                found = found_ref[:]
                for j in range(TRIS_PER_ROW):
                    ok, t, _ = _tri_block_test(
                        row, j, ox, oy, oz, dx, dy, dz, int_eps)
                    hit = ok & live & (t > 0) & (t < t_cap)
                    found = jnp.where(hit, 1, found)
                found_ref[:] = found

        done = ~jnp.any(alive & (found_ref[:] == 0))
        descend = any_live & ~is_leaf
        nxt = jnp.where(descend, node + 1, miss)
        return jnp.where(done, n_nodes, nxt), hm

    jax.lax.while_loop(lambda s: s[0] < n_nodes, body,
                       (jnp.int32(0),
                        jnp.zeros((block_rows, LANES), jnp.int32)))


def _multi_grid_spec(n_blocks, K, NR, TR, n_ray_ins, block_rows):
    """PrefetchScalarGridSpec for the multipack kernels: scalars are
    (pack_list, pack_count, n_nodes); the node/tri table index maps read
    pack_list[i, k], so culled packs never DMA and repeats are free."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rblock = pl.BlockSpec((block_rows, LANES),
                          lambda i, k, pl_, pc_, nn_: (i, 0),
                          memory_space=pltpu.VMEM)
    nblock = pl.BlockSpec((1, NR, LANES),
                          lambda i, k, pl_, pc_, nn_: (pl_[i, k], 0, 0),
                          memory_space=pltpu.VMEM)
    tblock = pl.BlockSpec((1, TR, LANES),
                          lambda i, k, pl_, pc_, nn_: (pl_[i, k], 0, 0),
                          memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    return pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_blocks, K),
        in_specs=[smem] + [rblock] * n_ray_ins + [nblock, tblock],
        out_specs=[rblock] * 3 if n_ray_ins == 6 else rblock,
    )


@functools.partial(jax.jit,
                   static_argnames=("max_leaf_rows", "interpret"))
def _nearest_multi_call(o, d, node_rows, tri_rows, n_nodes, root_bbox,
                        int_eps, max_leaf_rows: int, interpret: bool):
    import jax.experimental.pallas as pl

    BR = MULTI_BLOCK_ROWS
    (ox, n), (oy, _), (oz, _) = (_pad_block(c, jnp.nan, BR) for c in o)
    (dx, _), (dy, _), (dz, _) = (_pad_block(c, jnp.nan, BR) for c in d)
    n_rows_total = ox.shape[0]
    n_blocks = n_rows_total // BR
    K, NR = node_rows.shape[0], node_rows.shape[1]
    TR = tri_rows.shape[1]
    eps = jnp.asarray(int_eps, jnp.float32).reshape(1)
    if root_bbox is None:
        pack_list, pack_count = _full_pack_lists(n_blocks, K)
    else:
        pack_list, pack_count = _block_pack_lists(
            (ox, oy, oz, dx, dy, dz), root_bbox, n_blocks, int_eps)

    kernel = functools.partial(_nearest_multi_kernel, max_leaf_rows, BR)
    out_shape = [
        jax.ShapeDtypeStruct((n_rows_total, LANES), jnp.float32),
        jax.ShapeDtypeStruct((n_rows_total, LANES), jnp.float32),
        jax.ShapeDtypeStruct((n_rows_total, LANES), jnp.int32),
    ]
    key, t, idx = pl.pallas_call(
        kernel,
        grid_spec=_multi_grid_spec(n_blocks, K, NR, TR, 6, BR),
        out_shape=out_shape,
        interpret=interpret,
    )(pack_list, pack_count, n_nodes,
      eps, ox, oy, oz, dx, dy, dz, node_rows, tri_rows)
    return key.reshape(-1)[:n], t.reshape(-1)[:n], idx.reshape(-1)[:n]


@functools.partial(jax.jit,
                   static_argnames=("max_leaf_rows", "interpret"))
def _anyhit_multi_call(o, d, t_cap, node_rows, tri_rows, n_nodes, root_bbox,
                       int_eps, max_leaf_rows: int, interpret: bool):
    import jax.experimental.pallas as pl

    BR = MULTI_BLOCK_ROWS
    (ox, n), (oy, _), (oz, _) = (_pad_block(c, jnp.nan, BR) for c in o)
    (dx, _), (dy, _), (dz, _) = (_pad_block(c, jnp.nan, BR) for c in d)
    cap, _ = _pad_block(t_cap, 0.0, BR)
    n_rows_total = ox.shape[0]
    n_blocks = n_rows_total // BR
    K, NR = node_rows.shape[0], node_rows.shape[1]
    TR = tri_rows.shape[1]
    eps = jnp.asarray(int_eps, jnp.float32).reshape(1)
    if root_bbox is None:
        pack_list, pack_count = _full_pack_lists(n_blocks, K)
    else:
        pack_list, pack_count = _block_pack_lists(
            (ox, oy, oz, dx, dy, dz), root_bbox, n_blocks, int_eps,
            caps=cap)

    kernel = functools.partial(_anyhit_multi_kernel, max_leaf_rows, BR)
    found = pl.pallas_call(
        kernel,
        grid_spec=_multi_grid_spec(n_blocks, K, NR, TR, 7, BR),
        out_shape=jax.ShapeDtypeStruct((n_rows_total, LANES), jnp.int32),
        interpret=interpret,
    )(pack_list, pack_count, n_nodes,
      eps, ox, oy, oz, dx, dy, dz, cap, node_rows, tri_rows)
    return found.reshape(-1)[:n] != 0


def tri_bvh_nearest_multi(mp: "MultiPack", local_o, local_d, int_eps,
                          interpret: bool = False):
    """Nearest-hit over all packs: (|t| key, t, GLOBAL prim index)."""
    return _nearest_multi_call(local_o, local_d, mp.node_rows, mp.tri_rows,
                               mp.n_nodes, mp.root_bbox, int_eps,
                               max_leaf_rows_of(mp.max_leaf), interpret)


def tri_bvh_anyhit_multi(mp: "MultiPack", local_o, local_d, t_cap, int_eps,
                         interpret: bool = False):
    """Occlusion query over all packs: [N] bool."""
    t_cap = jnp.broadcast_to(jnp.asarray(t_cap, jnp.float32),
                             local_o.x.shape)
    return _anyhit_multi_call(local_o, local_d, t_cap, mp.node_rows,
                              mp.tri_rows, mp.n_nodes, mp.root_bbox, int_eps,
                              max_leaf_rows_of(mp.max_leaf), interpret)
