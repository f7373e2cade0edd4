"""Minimal pure-stdlib PNG decoder (public spec: RFC 2083 / W3C
PNG). Exists so the REAL arm of the multimodal decode stage
(`operators/multimodal.py:_real_pixels`) is executable — and therefore
testable — in a container that ships no codec libraries: zlib is
stdlib, and the subset below (8-bit depth, color types 0/2/6, no
interlace) covers everything a test fixture or an icon-sized PNG
needs. PIL, when present, still takes precedence.

Luminance uses the ITU-R 601-2 integer transform PIL's ``convert("L")``
applies (L = (299R + 587G + 114B) // 1000), so the two backends agree
bit-for-bit on 8-bit inputs.
"""

from __future__ import annotations

import struct
import zlib

_SIGNATURE = b"\x89PNG\r\n\x1a\n"

# color type -> samples per pixel (8-bit depth only)
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _unfilter(raw: bytes, width: int, height: int, bpp: int) -> bytearray:
    """Undo per-scanline filtering (types 0-4). Returns packed sample
    bytes, width*bpp per row."""
    stride = width * bpp
    out = bytearray()
    pos = 0
    prev = bytearray(stride)
    for _ in range(height):
        ftype = raw[pos]
        pos += 1
        line = bytearray(raw[pos : pos + stride])
        pos += stride
        if ftype == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                up_left = prev[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + _paeth(left, prev[i], up_left)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unsupported PNG filter type {ftype}")
        out += line
        prev = line
    return out


def decode_png_luminance(data: bytes) -> tuple[int, int, list[list[int]]]:
    """Decode a PNG blob to (width, height, luminance rows), luminance
    as 0-255 ints per the ITU-R 601-2 integer transform. Raises
    ValueError on anything that is not a supported PNG."""
    if data[:8] != _SIGNATURE:
        raise ValueError("not a PNG")
    pos = 8
    width = height = None
    color_type = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + body + crc
        if ctype == b"IHDR":
            width, height, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or color_type not in _CHANNELS or interlace != 0:
                raise ValueError(
                    f"unsupported PNG (depth={depth}, color={color_type}, "
                    f"interlace={interlace})"
                )
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
    if width is None or not idat:
        raise ValueError("truncated PNG")
    bpp = _CHANNELS[color_type]
    # hold the documented "raises ValueError" contract even for blobs
    # that pass the signature/IHDR checks but carry corrupt or short
    # IDAT data, which would otherwise surface as zlib.error/IndexError
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as exc:
        raise ValueError(f"corrupt PNG IDAT: {exc}") from exc
    if len(raw) < height * (width * bpp + 1):
        raise ValueError("truncated PNG pixel data")
    samples = _unfilter(raw, width, height, bpp)
    # strided slices / integer numpy arithmetic — value-identical to
    # the old per-pixel loop (the 601-2 transform is exact int math),
    # ~10x cheaper on the icon-sized blobs the media stage decodes
    if color_type in (0, 4):  # grayscale (+alpha): luminance IS sample 0
        rows = [
            list(samples[y * width * bpp : (y + 1) * width * bpp : bpp])
            for y in range(height)
        ]
        return width, height, rows
    import numpy as np

    a = np.frombuffer(bytes(samples), dtype=np.uint8).astype(np.int64)
    a = a.reshape(height, width, bpp)
    lum = (299 * a[:, :, 0] + 587 * a[:, :, 1] + 114 * a[:, :, 2]) // 1000
    return width, height, lum.tolist()


def encode_png_gray(rows: list[list[int]]) -> bytes:
    """Tiny 8-bit grayscale PNG encoder (filter type 0 scanlines) —
    fixture-builder for the decoder's tests and any pipeline that needs
    a genuinely decodable blob without codec libs."""
    height = len(rows)
    width = len(rows[0])

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes(r) for r in rows)
    return (
        _SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
