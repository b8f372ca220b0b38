"""Minimal OpenEXR scanline codec (tinyexr-equivalent for this framework).

The reference reads HDR textures and writes HDR renders through tinyexr
(src/Helper.cpp:345-413): reads return RGBA float32; writes emit 3-channel
half-float scanline files with B, G, R channel order. This module implements
the same capability in pure numpy:

- read: single-part scanline EXRs, NONE / ZIP / ZIPS compression, half or
  float channels, any RGB(A) subset -> [H, W, 3] float32 (RGB order).
- write: NONE-compressed half-float B/G/R scanline EXR, matching the
  reference's output contract (src/Helper.cpp:392-404).
"""

from __future__ import annotations

import struct
import zlib
from typing import Dict, Tuple

import numpy as np

_MAGIC = 20000630
_PT_UINT, _PT_HALF, _PT_FLOAT = 0, 1, 2
_COMP_NONE, _COMP_RLE, _COMP_ZIPS, _COMP_ZIP = 0, 1, 2, 3


def _read_cstr(buf: bytes, off: int) -> Tuple[str, int]:
    end = buf.index(b"\x00", off)
    return buf[off:end].decode("ascii"), end + 1


def _unpredict_and_interleave(raw: bytes) -> bytes:
    # Predictor: t[i] = t[i-1] + raw[i] - 128, t[0] = raw[0] (OpenEXR ZIP).
    d = np.frombuffer(raw, dtype=np.uint8).astype(np.int64).copy()
    d[1:] -= 128
    d = np.cumsum(d)
    d = (d & 0xFF).astype(np.uint8)
    # de-interleave: first half -> even positions, second half -> odd
    n = len(d)
    half = (n + 1) // 2
    out = np.empty(n, dtype=np.uint8)
    out[0::2] = d[:half]
    out[1::2] = d[half:]
    return out.tobytes()


def read_exr(path: str) -> np.ndarray:
    """Read an EXR image, returning [H, W, 3] float32 in RGB order."""
    with open(path, "rb") as f:
        buf = f.read()
    magic, version = struct.unpack_from("<ii", buf, 0)
    if magic != _MAGIC:
        raise ValueError(f"not an EXR file: {path}")
    if version & 0x200:
        raise ValueError("multi-part EXR not supported")
    off = 8

    channels = []  # (name, pixel_type)
    compression = _COMP_NONE
    data_window = None
    while True:
        name, off = _read_cstr(buf, off)
        if name == "":
            break
        atype, off = _read_cstr(buf, off)
        (size,) = struct.unpack_from("<i", buf, off)
        off += 4
        payload = buf[off:off + size]
        off += size
        if name == "channels" and atype == "chlist":
            p = 0
            while payload[p] != 0:
                cname, p = _read_cstr(payload, p)
                ptype, _plin = struct.unpack_from("<iB", payload, p)
                p += 4 + 1 + 3 + 4 + 4  # type, pLinear, reserved, xSamp, ySamp
                channels.append((cname, ptype))
        elif name == "compression":
            compression = payload[0]
        elif name == "dataWindow":
            data_window = struct.unpack("<4i", payload)

    if data_window is None:
        raise ValueError("EXR missing dataWindow")
    xmin, ymin, xmax, ymax = data_window
    width, height = xmax - xmin + 1, ymax - ymin + 1

    if compression == _COMP_ZIP:
        lines_per_block = 16
    elif compression in (_COMP_NONE, _COMP_ZIPS):
        lines_per_block = 1
    else:
        raise ValueError(f"unsupported EXR compression {compression}")

    n_blocks = -(-height // lines_per_block)
    offsets = struct.unpack_from(f"<{n_blocks}Q", buf, off)

    dtypes = {_PT_HALF: np.dtype("<f2"), _PT_FLOAT: np.dtype("<f4"),
              _PT_UINT: np.dtype("<u4")}
    ch_order = [c[0] for c in channels]  # stored order (alphabetical)
    planes: Dict[str, np.ndarray] = {
        c: np.zeros((height, width), np.float32) for c in ch_order
    }

    for bi, boff in enumerate(offsets):
        y, dsize = struct.unpack_from("<ii", buf, boff)
        raw = buf[boff + 8: boff + 8 + dsize]
        if compression in (_COMP_ZIP, _COMP_ZIPS):
            nlines = min(lines_per_block, ymin + height - y)
            expected = sum(
                dtypes[pt].itemsize * width for _, pt in channels
            ) * nlines
            if dsize < expected:
                raw = _unpredict_and_interleave(zlib.decompress(raw))
        p = 0
        y0 = y - ymin
        nlines = min(lines_per_block, height - y0)
        for li in range(nlines):
            for cname, ptype in channels:
                dt = dtypes[ptype]
                row = np.frombuffer(raw, dt, width, p)
                p += dt.itemsize * width
                planes[cname][y0 + li] = row.astype(np.float32)

    out = np.zeros((height, width, 3), np.float32)
    for i, c in enumerate("RGB"):
        if c in planes:
            out[..., i] = planes[c]
        elif "Y" in planes:  # luminance-only fallback
            out[..., i] = planes["Y"]
    return out


def _predict_and_deinterleave(raw: bytes) -> bytes:
    """Inverse of ``_unpredict_and_interleave`` (OpenEXR ZIP reorder+delta)."""
    d = np.frombuffer(raw, dtype=np.uint8)
    n = len(d)
    half = (n + 1) // 2
    t = np.empty(n, dtype=np.uint8)
    t[:half] = d[0::2]
    t[half:] = d[1::2]
    e = t.astype(np.int16)
    e[1:] = e[1:] - t[:-1].astype(np.int16) + 128
    return (e & 0xFF).astype(np.uint8).tobytes()


def write_exr(path: str, image: np.ndarray, compression: str = "none"
              ) -> None:
    """Write [H, W, 3] float RGB as half-float B/G/R scanline EXR.

    Mirrors the reference's ExrLibrary::SaveExr contract
    (src/Helper.cpp:361-412): 3 half channels stored B, G, R.
    ``compression``: "none" (the reference's tinyexr default) or "zip"
    (16-scanline blocks, reorder+delta predictor + zlib — the standard
    OpenEXR ZIP scheme; tinyexr and OpenEXR read it back).
    """
    img = np.asarray(image, np.float32)
    h, w = img.shape[:2]

    def attr(name: str, atype: str, payload: bytes) -> bytes:
        return name.encode() + b"\x00" + atype.encode() + b"\x00" + \
            struct.pack("<i", len(payload)) + payload

    chpay = b""
    for cname in ("B", "G", "R"):
        chpay += cname.encode() + b"\x00" + struct.pack("<iB3xii", _PT_HALF, 0, 1, 1)
    chpay += b"\x00"

    comp_id = {"none": _COMP_NONE, "zip": _COMP_ZIP}[compression]
    box = struct.pack("<4i", 0, 0, w - 1, h - 1)
    header = b"".join([
        attr("channels", "chlist", chpay),
        attr("compression", "compression", bytes([comp_id])),
        attr("dataWindow", "box2i", box),
        attr("displayWindow", "box2i", box),
        attr("lineOrder", "lineOrder", bytes([0])),
        attr("pixelAspectRatio", "float", struct.pack("<f", 1.0)),
        attr("screenWindowCenter", "v2f", struct.pack("<2f", 0, 0)),
        attr("screenWindowWidth", "float", struct.pack("<f", 1.0)),
        b"\x00",
    ])

    half = img.astype("<f2")
    bgr = half[..., ::-1]  # rows stored B, G, R
    lines_per_block = 16 if comp_id == _COMP_ZIP else 1
    n_blocks = -(-h // lines_per_block)

    # raw block payloads: per scanline, per channel (B,G,R), the row bytes
    blocks = []
    for bi in range(n_blocks):
        y0 = bi * lines_per_block
        nlines = min(lines_per_block, h - y0)
        raw = b"".join(bgr[y].transpose(1, 0).tobytes()
                       for y in range(y0, y0 + nlines))
        if comp_id == _COMP_ZIP:
            packed = zlib.compress(_predict_and_deinterleave(raw))
            if len(packed) >= len(raw):   # store raw (OpenEXR convention)
                packed = raw
        else:
            packed = raw
        blocks.append((y0, packed))

    out = bytearray()
    out += struct.pack("<ii", _MAGIC, 2)
    out += header
    data_start = len(out) + 8 * n_blocks
    off_acc = data_start
    for y0, packed in blocks:
        out += struct.pack("<Q", off_acc)
        off_acc += 8 + len(packed)
    for y0, packed in blocks:
        out += struct.pack("<ii", y0, len(packed))
        out += packed
    with open(path, "wb") as f:
        f.write(bytes(out))
