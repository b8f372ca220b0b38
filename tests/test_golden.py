"""Golden-image parity vs the reference renderer's own output.

Goldens in tests/goldens/*.ppm were produced by compiling and running the
reference C++ renderer on tests/scenes/*.xml. Deterministic scenes (1 spp,
no stochastic features) must match almost pixel-exactly; residual differences
are confined to knife-edge float decisions (silhouettes, the sphere
discriminant-vs-epsilon band) where f32 op ordering legitimately differs.
"""

import numpy as np
import pytest

from tests.conftest import golden, ldr, load


def _render(name, **kw):
    from raytracer795_tpu.render import render_camera

    return render_camera(load(name), 0, **kw)


DETERMINISTIC = [
    # (name, mean_tol, frac_gt2_tol)
    ("simple", 0.01, 0.001),
    ("cornellbox", 0.01, 0.001),
    ("brdfs", 0.01, 0.001),
    ("lights", 0.01, 0.001),
    ("transforms", 0.2, 0.01),
    ("instances", 0.2, 0.01),
    ("ply_smooth", 0.2, 0.01),
    ("textures", 0.05, 0.002),
]


@pytest.mark.parametrize("name,mean_tol,frac_tol", DETERMINISTIC)
def test_deterministic_golden(name, mean_tol, frac_tol):
    img = ldr(_render(name))
    gold = golden(name)
    diff = np.abs(img - gold)
    assert diff.mean() < mean_tol, f"mean {diff.mean()}"
    assert (diff > 2).mean() < frac_tol, f"frac>2 {(diff > 2).mean()}"


STOCHASTIC = [
    # jittered-sampling scenes: compare Monte Carlo means loosely
    ("arealight", 2.0, 12.0),
    ("motionblur", 2.0, 12.0),
    ("distributed", 2.5, 14.0),
]


@pytest.mark.slow
@pytest.mark.parametrize("name,mean_tol,p99_tol", STOCHASTIC)
def test_stochastic_golden(name, mean_tol, p99_tol):
    img = ldr(_render(name))
    gold = golden(name)
    diff = np.abs(img - gold)
    assert diff.mean() < mean_tol, f"mean {diff.mean()}"
    assert np.percentile(diff, 99) < p99_tol, f"p99 {np.percentile(diff, 99)}"
