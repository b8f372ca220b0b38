import faulthandler, time, sys
faulthandler.dump_traceback_later(90, exit=True)
import dataclasses
import jax, jax.numpy as jnp
from raytracer795_tpu.scene.loader import load_scene
from raytracer795_tpu.models import camera as camera_model
from raytracer795_tpu.ops import intersect

t0=time.time(); loaded = load_scene("tests/scenes/cornellbox_pt.xml"); print("load", time.time()-t0, flush=True)
scene = loaded.scene
cam = dataclasses.replace(loaded.cameras[0], nx=512, ny=512, num_samples=1, grid=1)
t0=time.time(); rays = jax.tree_util.tree_map(jnp.asarray, camera_model.primary_rays(cam)); jax.block_until_ready(rays); print("rays", time.time()-t0, flush=True)
t0=time.time(); vn = intersect.compute_vertex_normals(jax.tree_util.tree_map(jnp.asarray, scene)); jax.block_until_ready(vn); print("vn", time.time()-t0, flush=True)
t0=time.time(); hit = jax.jit(lambda r: intersect.trace(scene, r))(rays); jax.block_until_ready(hit); print("trace compile+run", time.time()-t0, flush=True)
t0=time.time(); hit2 = jax.jit(lambda r: intersect.trace(scene, r))(rays); jax.block_until_ready(hit2); print("trace cached", time.time()-t0, flush=True)
