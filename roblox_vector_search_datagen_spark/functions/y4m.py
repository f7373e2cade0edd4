"""Minimal pure-stdlib YUV4MPEG2 ("y4m") video codec (public spec: the
mjpegtools YUV4MPEG2 stream format — plain-text stream header
`YUV4MPEG2 W<w> H<h> F<n>:<d> ...` followed by `FRAME` records of raw
planar video data). Exists so the REAL arm of the multimodal VIDEO
decode stage is executable — and therefore testable — in a container
that ships no media libraries: y4m is the uncompressed interchange
format every ffmpeg/mjpegtools pipeline can emit, and its raw planar
payload makes the vendored decode LOSSLESS (no DCT rounding anywhere),
so per-frame pixel analysis is exactly reproducible.

Supported subset: colorspaces `Cmono` (luma-only planes) and
`C420jpeg` (4:2:0 chroma, the spec's default when no C tag is
present); any dims, any frame rate. Everything else — wrong magic,
missing W/H/F tags, other colorspaces (C422/C444/C420paldv/...),
interlacing tags other than progressive, truncated plane data — is
REFUSED with ValueError rather than mis-decoded: the same strictness
contract as `functions/png.py` / `functions/jpeg.py` /
`functions/wav.py`, so pipeline callers can degrade to the stub arm on
the exception and a silent wrong decode can never reach an oracle.
Unknown HEADER parameter tags (X metadata, A aspect) are skipped per
spec; FRAME-record parameters are accepted and ignored.

The decoder returns LUMA frames only (chroma planes are length-checked
and skipped) — the downstream analysis operators are luminance-based,
the same Y'-channel contract as the vendored JPEG decoder.
"""

from __future__ import annotations

_MAGIC = b"YUV4MPEG2"

# colorspace tag -> chroma bytes per frame as a fraction of luma bytes
# (numerator, denominator); mono carries no chroma, 4:2:0 carries two
# quarter-size planes = half the luma byte count.
_CHROMA_RATIO = {"mono": (0, 1), "420jpeg": (1, 2)}


def encode_y4m(
    frames: list[list[list[int]]],
    fps_num: int = 25,
    fps_den: int = 1,
    colorspace: str = "mono",
) -> bytes:
    """Encode 8-bit luma frame matrices as a canonical YUV4MPEG2 blob.
    `frames` is a non-empty list of [height][width] pixel matrices, all
    the same dims; for `420jpeg` the dims must be even and the two
    chroma planes are written neutral (128 = no color), the flat-chroma
    convention the vendored JPEG color encoder also uses. Raises
    ValueError on empty input, inconsistent dims, out-of-range samples,
    an unsupported colorspace, or a non-positive frame rate."""
    if colorspace not in _CHROMA_RATIO:
        raise ValueError(f"unsupported y4m colorspace {colorspace!r}")
    if fps_num <= 0 or fps_den <= 0:
        raise ValueError("frame rate must be positive")
    if not frames:
        raise ValueError("y4m stream needs at least one frame")
    h = len(frames[0])
    w = len(frames[0][0]) if h else 0
    if w < 1 or h < 1:
        raise ValueError("frame dims must be >= 1")
    if colorspace == "420jpeg" and (w % 2 or h % 2):
        raise ValueError("420jpeg dims must be even")
    out = [
        f"YUV4MPEG2 W{w} H{h} F{fps_num}:{fps_den} Ip A1:1 "
        f"C{colorspace}\n".encode("ascii")
    ]
    chroma = b"\x80" * ((w // 2) * (h // 2)) if colorspace == "420jpeg" else b""
    for fr in frames:
        if len(fr) != h or any(len(row) != w for row in fr):
            raise ValueError("inconsistent frame dims")
        plane = bytearray()
        for row in fr:
            if any(not (0 <= v <= 255) for v in row):
                raise ValueError("luma sample out of range")
            plane.extend(row)
        out.append(b"FRAME\n" + bytes(plane) + chroma + chroma)
    return b"".join(out)


def decode_y4m(
    blob: bytes,
) -> tuple[int, int, int, int, str, list[list[list[int]]]]:
    """Decode a YUV4MPEG2 blob to (width, height, fps_num, fps_den,
    colorspace, luma_frames). Supported: Cmono and C420jpeg (also the
    implied default with no C tag), progressive or untagged
    interlacing, any dims/rate; chroma planes are skipped after a
    length check. Everything else raises ValueError — see module
    docstring for the refusal list."""
    nl = blob.find(b"\n")
    if nl < 0 or not blob.startswith(_MAGIC):
        raise ValueError("not a YUV4MPEG2 stream")
    header = blob[len(_MAGIC) : nl]
    if header and not header.startswith(b" "):
        raise ValueError("malformed YUV4MPEG2 magic")
    w = h = 0
    fps_num = fps_den = 0
    colorspace = "420jpeg"  # the spec's default when no C tag appears
    def _num(s: str, tag: str) -> int:
        try:
            return int(s)
        except ValueError:
            raise ValueError(f"malformed y4m header tag {tag}") from None

    for tok in header.split():
        tag, val = chr(tok[0]), tok[1:].decode("ascii", "replace")
        if tag == "W":
            w = _num(val, tag)
        elif tag == "H":
            h = _num(val, tag)
        elif tag == "F":
            num, _, den = val.partition(":")
            fps_num, fps_den = _num(num, tag), _num(den, tag)
        elif tag == "C":
            colorspace = val
        elif tag == "I" and val not in ("p", "?"):
            raise ValueError(f"unsupported y4m interlacing I{val}")
        # A (aspect) and X (metadata) tags are skipped per spec
    if w < 1 or h < 1:
        raise ValueError("y4m header missing W/H dims")
    if fps_num <= 0 or fps_den <= 0:
        raise ValueError("y4m header missing or invalid F rate")
    if colorspace not in _CHROMA_RATIO:
        raise ValueError(f"unsupported y4m colorspace C{colorspace}")
    if colorspace == "420jpeg" and (w % 2 or h % 2):
        raise ValueError("420jpeg dims must be even")
    cn, cd = _CHROMA_RATIO[colorspace]
    luma_len = w * h
    chroma_len = luma_len * cn // cd
    frames: list[list[list[int]]] = []
    pos = nl + 1
    while pos < len(blob):
        fnl = blob.find(b"\n", pos)
        if fnl < 0 or blob[pos : pos + 5] != b"FRAME":
            raise ValueError("malformed y4m FRAME record")
        if fnl > pos + 5 and blob[pos + 5 : pos + 6] != b" ":
            raise ValueError("malformed y4m FRAME record")
        body = blob[fnl + 1 : fnl + 1 + luma_len + chroma_len]
        if len(body) < luma_len + chroma_len:
            raise ValueError("y4m frame data truncated")
        frames.append(
            [list(body[r * w : (r + 1) * w]) for r in range(h)]
        )
        pos = fnl + 1 + luma_len + chroma_len
    if not frames:
        raise ValueError("y4m stream has no frames")
    return w, h, fps_num, fps_den, colorspace, frames
