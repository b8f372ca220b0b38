"""Flat-BVH parity: traversal must reproduce the linear-scan intersector.

The BVH is purely an acceleration structure; on every scene the hits (t,
validity, shading result) must match the brute-force path bit-for-bit-ish.
Strategy mirrors SURVEY.md §4: exhaustive random-ray parity plus golden
renders with the BVH forced on.
"""

import os

import numpy as np
import pytest

import conftest


def _load(name, **kw):
    from raytracer795_tpu.scene.loader import load_scene

    return load_scene(os.path.join(conftest.SCENES, name + ".xml"), **kw)


def _random_rays(n, seed, lo=-2.0, hi=2.0):
    import jax.numpy as jnp

    from raytracer795_tpu.ops import intersect

    rng = np.random.default_rng(seed)
    o = rng.uniform(lo, hi, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    # a few exact-zero direction components to exercise the slab-test quirk
    d[: n // 8, 0] = 0.0
    d[n // 8: n // 4, 2] = 0.0
    from raytracer795_tpu.utils.vec3 import Vec3

    return intersect.Rays(o=Vec3.from_array(jnp.asarray(o)),
                          d=Vec3.from_array(jnp.asarray(d)),
                          time=jnp.zeros(n))


@pytest.mark.parametrize("scene_name", ["ply_smooth", "cornellbox",
                                        "instances", "transforms"])
def test_trace_parity_random_rays(scene_name):
    """BVH and linear traced hits agree on random rays through the scene."""
    from raytracer795_tpu.ops import intersect

    brute = _load(scene_name, bvh_min_tris=10**9).scene
    accel = _load(scene_name, bvh_min_tris=2).scene
    assert any(g.bvh is not None for g in accel.groups), "BVH not built"

    rays = _random_rays(4096, seed=0)
    ha = intersect.trace(brute, rays)
    hb = intersect.trace(accel, rays)
    va, vb = np.asarray(ha.valid), np.asarray(hb.valid)
    # The triangle accept test carries an int_eps slack (bary >= -int_eps,
    # src/Shape.cpp:146-147) that admits grazing hits slightly OUTSIDE the
    # true triangle; whether a bounding box culls such a phantom hit depends
    # on the box structure, so linear-scan (per-object root boxes) and BVH
    # (merged leaf boxes) may legitimately disagree on those rare rays —
    # exactly as two differently-built reference BVHs would. Require exact
    # agreement on all but a sliver of rays.
    assert (va != vb).mean() < 2e-3, f"{(va != vb).mean():%} validity diff"
    both = va & vb
    np.testing.assert_allclose(np.asarray(ha.t)[both], np.asarray(hb.t)[both],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(ha.group)[both],
                                  np.asarray(hb.group)[both])


@pytest.mark.parametrize("scene_name", ["ply_smooth", "instances"])
def test_render_parity(scene_name):
    """Full renders with and without the BVH are pixel-identical in LDR.

    112x112 (not the full 200x200): this box is 2 vCPUs and the parity
    content is per-pixel — the smaller frame keeps every code path while
    quartering the execute time (r4 verdict suite-time item)."""
    import dataclasses

    from raytracer795_tpu import render as render_mod

    brute = _load(scene_name, bvh_min_tris=10**9)
    accel = _load(scene_name, bvh_min_tris=2)
    for ld in (brute, accel):
        ld.cameras[0] = dataclasses.replace(ld.cameras[0], nx=112, ny=112)
    ia = conftest.ldr(render_mod.render_camera(brute, 0, seed=0))
    ib = conftest.ldr(render_mod.render_camera(accel, 0, seed=0))
    # identical up to float reassociation; LDR quantization absorbs it
    frac_diff = (np.abs(ia - ib) > 1).mean()
    assert frac_diff < 1e-4, f"{frac_diff:.6f} of LDR pixels differ"


def test_python_fallback_matches_native(monkeypatch):
    """The NumPy builder yields the same hits as the C++ builder."""
    from raytracer795_tpu import native
    from raytracer795_tpu.ops import intersect

    with_native = _load("ply_smooth", bvh_min_tris=2).scene
    assert native.load_native("bvh_builder") is not None, \
        "native builder failed to compile in this image"
    monkeypatch.setattr(native, "load_native", lambda name: None)
    with_python = _load("ply_smooth", bvh_min_tris=2).scene

    rays = _random_rays(2048, seed=1)
    ha = intersect.trace(with_native, rays)
    hb = intersect.trace(with_python, rays)
    np.testing.assert_array_equal(np.asarray(ha.valid), np.asarray(hb.valid))
    np.testing.assert_allclose(
        np.where(np.asarray(ha.valid), np.asarray(ha.t), 0.0),
        np.where(np.asarray(hb.valid), np.asarray(hb.t), 0.0),
        rtol=1e-5, atol=1e-6)


def test_big_mesh_bvh_structure():
    """Builder invariants on a large random soup (native path)."""
    from raytracer795_tpu.ops import bvh as bvh_mod

    rng = np.random.default_rng(7)
    n = 50_000
    lo = rng.uniform(0, 10, (n, 3)).astype(np.float32)
    hi = lo + rng.uniform(0.01, 0.1, (n, 3)).astype(np.float32)
    flat, perm = bvh_mod.build(lo, hi)
    n_nodes = flat.bmin.shape[0]
    assert n_nodes <= 2 * n
    assert sorted(perm.tolist()) == list(range(n))
    count = np.asarray(flat.count)
    first = np.asarray(flat.first)
    miss = np.asarray(flat.miss)
    leaves = count > 0
    # every primitive appears in exactly one leaf range
    cover = np.zeros(n, np.int32)
    for f, c in zip(first[leaves], count[leaves]):
        cover[f:f + c] += 1
    assert (cover == 1).all()
    assert (count <= flat.max_leaf).all()
    # skip links point strictly forward and never past the end
    assert (miss > np.arange(n_nodes)).all() and (miss <= n_nodes).all()
    # leaf ranges sit inside the leaf's bbox
    bmin, bmax = np.asarray(flat.bmin), np.asarray(flat.bmax)
    li = np.nonzero(leaves)[0]
    for i in li[:100]:
        ids = perm[first[i]:first[i] + count[i]]
        assert (lo[ids] >= bmin[i] - 1e-4).all()
        assert (hi[ids] <= bmax[i] + 1e-4).all()
