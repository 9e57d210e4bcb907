"""Pure-stdlib BMP (Windows DIB) codec — the second REAL image format
behind the multimodal decode stage, next to ``functions/png.py``.

Implements the public BMP file format (BITMAPFILEHEADER +
BITMAPINFOHEADER, bottom-up BGR scanlines padded to 4 bytes): encode
for 24-bit RGB and decode for uncompressed (BI_RGB) 24- and 32-bit
payloads.  Everything is numpy-vectorized (one ``frombuffer`` +
reshape + slice per image); no third-party imaging library is
involved, so decode results are bit-deterministic across workers.

Reference: Microsoft Windows BMP format documentation (public spec);
reference repo analogue: the media/attachment handling boundary noted
in SURVEY.md §2 (multimodal columns are opaque binaries + typed
metadata there too).
"""

from __future__ import annotations

import struct

import numpy as np

_FILE_HDR = struct.Struct("<2sIHHI")   # magic, file size, res, res, offset
_INFO_HDR = struct.Struct("<IiiHHIIiiII")


def encode_bmp_rgb24(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB (or (H, W) grayscale, replicated) ->
    24-bit bottom-up BI_RGB BMP bytes."""
    img = np.asarray(img)
    if img.ndim == 2:
        img = np.repeat(img[:, :, None], 3, axis=2)
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError("encode_bmp_rgb24 wants (H, W, 3) uint8")
    h, w = img.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    pix = rows.tobytes()
    off = _FILE_HDR.size + _INFO_HDR.size
    info = _INFO_HDR.pack(_INFO_HDR.size, w, h, 1, 24, 0, len(pix),
                          2835, 2835, 0, 0)
    head = _FILE_HDR.pack(b"BM", off + len(pix), 0, 0, off)
    return head + info + pix


def decode_bmp(data: bytes) -> np.ndarray:
    """BMP bytes -> (H, W, 3) uint8 RGB.  Supports the uncompressed
    (BI_RGB) 24- and 32-bit BITMAPINFOHEADER form, bottom-up or
    top-down; raises ValueError on anything else."""
    if len(data) < _FILE_HDR.size + _INFO_HDR.size or data[:2] != b"BM":
        raise ValueError("not a BMP payload (or truncated header)")
    _, _, _, _, off = _FILE_HDR.unpack_from(data, 0)
    hdr_size = struct.unpack_from("<I", data, _FILE_HDR.size)[0]
    if hdr_size < _INFO_HDR.size:
        raise ValueError(f"unsupported DIB header size {hdr_size}")
    (_, w, h, planes, bpp, comp, _, _, _, _, _) = _INFO_HDR.unpack_from(
        data, _FILE_HDR.size)
    if planes != 1 or comp != 0 or bpp not in (24, 32):
        raise ValueError(
            f"unsupported BMP (planes={planes} bpp={bpp} compression={comp})")
    top_down = h < 0
    h = abs(h)
    if w <= 0 or h <= 0:
        raise ValueError("bad BMP dimensions")
    nch = bpp // 8
    stride = (w * nch + 3) & ~3
    need = off + stride * h
    if len(data) < need:
        raise ValueError("truncated BMP payload")
    rows = np.frombuffer(data, dtype=np.uint8, count=stride * h,
                         offset=off).reshape(h, stride)
    img = rows[:, : w * nch].reshape(h, w, nch)
    if not top_down:
        img = img[::-1]
    # BGR(A) -> RGB
    return np.ascontiguousarray(img[:, :, 2::-1])
