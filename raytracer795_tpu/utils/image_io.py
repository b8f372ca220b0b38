"""Film output writers.

The reference's writer (src/Image.cpp:26-107) clamps to 255 and emits a
text P3 PPM when the name contains ".png" (misnamed on purpose there), else a
half-float BGR EXR (src/Helper.cpp:361-412). Here ".png" produces a real PNG
with the same clamp+truncate LDR semantics, ".ppm" the reference-compatible
text PPM, and anything else the EXR path.
"""

from __future__ import annotations

import numpy as np

from raytracer795_tpu.utils import exr


def to_ldr(image: np.ndarray) -> np.ndarray:
    """Clamp to 255 and truncate to uint8 ((unsigned char) cast semantics,
    src/Image.cpp:64-69,95)."""
    return np.clip(np.asarray(image), 0, 255).astype(np.uint8)


def write_ppm(path: str, image: np.ndarray) -> None:
    """Text P3 PPM, byte-identical layout to SavePng (src/Image.cpp:62-103)."""
    ldr = to_ldr(image)
    h, w = ldr.shape[:2]
    with open(path, "w") as f:
        f.write("P3\n")
        f.write(f"{w} {h}\n")
        f.write("255\n")
        for y in range(h):
            f.write(" ".join(str(int(v)) for v in ldr[y].reshape(-1)))
            f.write(" \n")


def read_ppm(path: str) -> np.ndarray:
    """Read a text P3 PPM into [H, W, 3] float32 (for golden comparisons)."""
    with open(path) as f:
        tok = f.read().split()
    assert tok[0] == "P3"
    w, h = int(tok[1]), int(tok[2])
    data = np.asarray(tok[4:4 + w * h * 3], dtype=np.float32)
    return data.reshape(h, w, 3)


def save_image(path: str, image: np.ndarray) -> None:
    """Name-dispatched writer mirroring Image::saveImage (src/Image.cpp:26-33)."""
    lower = path.lower()
    if lower.endswith(".ppm"):
        write_ppm(path, image)
    elif ".png" in lower:
        from PIL import Image as PILImage

        PILImage.fromarray(to_ldr(image)).save(path)
    else:
        exr.write_exr(path, np.asarray(image, np.float32))
