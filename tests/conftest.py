"""Test harness configuration.

Pins JAX to an 8-virtual-device CPU mesh BEFORE any backend initializes:
this container's sitecustomize registers the axon TPU plugin in every
process and force-selects it, so tests must explicitly reclaim the CPU
platform (jax.config wins over the plugin's os.environ override).

TPU CI: ``RT795_TPU_TESTS=1 python -m pytest tests -m tpu -q`` keeps the
real TPU backend and runs the ``tpu``-marked subset (compiled-kernel
goldens, TPU-only gradients) on the chip. Everything else stays CPU-pinned
so the suite is deterministic and runnable anywhere.
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jaxcomp"))

TPU_TESTS = os.environ.get("RT795_TPU_TESTS") == "1"
# CPU suite runs are XLA-COMPILE-bound (big unrolled render/backward
# programs on a 2-vCPU box); backend optimization level 0 halves compile
# time and measured faster end-to-end on every test class (gradient FD
# checks 127 s -> 69 s, golden set 157 s -> 135 s). TPU runs keep full opt.
if not TPU_TESTS and "xla_backend_optimization_level" \
        not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] += " --xla_backend_optimization_level=0"

import jax  # noqa: E402

if not TPU_TESTS:
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

SCENES = os.path.join(os.path.dirname(__file__), "scenes")
GOLDENS = os.path.join(os.path.dirname(__file__), "goldens")


@pytest.fixture(scope="session")
def scene_dir():
    return SCENES


@pytest.fixture(scope="session")
def golden_dir():
    return GOLDENS


def load(name):
    from raytracer795_tpu.scene.loader import load_scene

    return load_scene(os.path.join(SCENES, name + ".xml"))


def golden(name):
    from raytracer795_tpu.utils.image_io import read_ppm

    return read_ppm(os.path.join(GOLDENS, name + ".ppm"))


def ldr(img):
    from raytracer795_tpu.utils.image_io import to_ldr

    return to_ldr(np.asarray(img)).astype(np.float32)
