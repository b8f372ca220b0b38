"""Generate the HDR test assets (committed for provenance).

sky.exr — lat-long environment map: blue-to-white sky gradient with a bright
warm "sun" disc. Written ZIP-compressed by utils/exr.write_exr; the golden
render is produced by the reference renderer whose tinyexr reads this very
file — an independent implementation validating the ZIP codec end to end.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))
from raytracer795_tpu.utils import exr  # noqa: E402

H, W = 64, 128
v = np.linspace(0.0, 1.0, H)[:, None]           # 0 = zenith, 1 = nadir
u = np.linspace(0.0, 1.0, W)[None, :]
sky_top = np.array([14.0, 22.0, 48.0])
sky_bot = np.array([36.0, 34.0, 32.0])
img = sky_top[None, None] * (1 - v[..., None]) + sky_bot[None, None] * v[..., None]
# warm sun disc at u=0.25, v=0.3
du = (u - 0.25)
dv = (v - 0.3)
sun = np.exp(-((du / 0.03) ** 2 + (dv / 0.06) ** 2))
img = img + sun[..., None] * np.array([2400.0, 1800.0, 1000.0])[None, None]
img = img.astype(np.float32)

here = os.path.dirname(os.path.abspath(__file__))
exr.write_exr(os.path.join(here, "sky.exr"), img, compression="zip")
print("wrote sky.exr", img.shape, "max", img.max())
