"""Tests that run on the REAL TPU chip.

The default suite pins JAX to CPU (conftest); these tests need the
compiled Pallas kernels / the TPU compiler and are selected with:

    RT795_TPU_TESTS=1 python -m pytest tests -m tpu -q

They validate what CPU interpret-mode parity cannot: the compiled kernel
artifact against reference goldens (rock100k single-pack, rock1800k
multi-pack streaming), and the normal/bump texture gradient whose backward
graph only compiles on the TPU backend (see models/whitted.py:377-386).
"""

import os

import numpy as np
import pytest

import conftest

pytestmark = pytest.mark.tpu

tpu_only = pytest.mark.skipif(
    __import__("jax").default_backend() != "tpu",
    reason="needs the real TPU backend (run with RT795_TPU_TESTS=1)")


@tpu_only
def test_golden_rock1800k_multipack():
    """1.8M-triangle multi-pack streaming traversal vs the compiled
    reference renderer (the pages/Page2.md:57 dragon scale)."""
    import sys

    sys.path.insert(0, conftest.SCENES)
    import make_assets

    make_assets.ensure_rock(
        os.path.join(conftest.SCENES, "rock1800k.ply"), 1350, 668)

    from raytracer795_tpu import render as render_mod
    from raytracer795_tpu.ops import pallas_bvh
    from raytracer795_tpu.scene.loader import load_scene

    loaded = load_scene(os.path.join(conftest.SCENES, "rock1800k.xml"))
    big = [g for g in loaded.scene.groups if g.n_tris > 1_000_000][0]
    assert isinstance(big.bvh_pack, pallas_bvh.MultiPack)
    assert big.bvh_pack.node_rows.shape[0] > 1      # really multi-pack
    img = conftest.ldr(render_mod.render_camera(loaded, 0, seed=0))
    gold = conftest.golden("rock1800k")
    frac = (np.abs(img - gold) > 1).mean()
    assert frac < 1e-4, f"{frac:.6f} of LDR pixels differ"


@tpu_only
def test_normal_bump_texture_grad_fd():
    """Gradient of the rendered image w.r.t. a BUMP texture's texels,
    validated by central finite differences ON THE CHIP.

    The bump image feeds the shading normal which feeds the continuation
    rays; XLA:CPU cannot compile this backward graph (models/whitted.py
    comment), so this is the only place it is exercised.
    """
    import jax
    import jax.numpy as jnp

    from raytracer795_tpu.models import whitted
    from raytracer795_tpu.models.camera import primary_rays
    from raytracer795_tpu.scene import types as T

    loaded = conftest.load("textures")
    scene = loaded.scene
    import dataclasses as dc

    cam = dc.replace(loaded.cameras[0], nx=24, ny=24, num_samples=1, grid=1)
    rays = primary_rays(cam)
    n = rays.o.shape[0]
    bg = jnp.broadcast_to(scene.background, (n, 3))
    key = jax.random.PRNGKey(0)
    iters = whitted.forward_iteration_count(scene, rays, bg, key) + 1

    # texture index with bump_normal decal (textures.xml: bump.png)
    bump_ti = next(i for i, st in enumerate(scene.texture_statics)
                   if st[0] == T.DECAL_BUMP_NORMAL)
    im0 = jnp.asarray(scene.textures[bump_ti].image)

    def loss_img(im):
        texs = list(scene.textures)
        texs[bump_ti] = dc.replace(texs[bump_ti], image=im)
        sc = dc.replace(scene, textures=tuple(texs))
        return jnp.mean(whitted.render_rays(sc, rays, bg, key,
                                            max_iters=iters))

    loss_jit = jax.jit(loss_img)
    g = np.asarray(jax.jit(jax.grad(loss_img))(im0))
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 0, "bump texture gradient is identically zero"

    # central FD at the two strongest texels (texel values are 0..255;
    # bump height is piecewise-linear in them via the forward-difference
    # sampling contract, but the normalize() downstream is mildly
    # nonlinear -> 5% tolerance)
    flat = np.abs(g).ravel()
    for k in np.argsort(flat)[-2:]:
        y, x, c = np.unravel_index(k, g.shape)
        eps = 2.0
        lp = float(loss_jit(im0.at[y, x, c].add(eps)))
        lm = float(loss_jit(im0.at[y, x, c].add(-eps)))
        fd = (lp - lm) / (2 * eps)
        assert abs(g[y, x, c] - fd) <= 0.05 * max(abs(fd), 1e-12), \
            (int(y), int(x), int(c), g[y, x, c], fd)
