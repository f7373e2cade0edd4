"""Minimal pure-stdlib RIFF/WAVE PCM codec (public spec: the
Microsoft/IBM WAVE format as registered in RFC 2361; chunk layout per
the RIFF 1991 multimedia standard). Exists so the REAL arm of the
multimodal AUDIO decode stage is executable — and therefore testable —
in a container that ships no media libraries: the subset below
(uncompressed little-endian PCM, mono, 16-bit) covers what a synthetic
fixture or a speech-corpus probe needs, and anything else (compressed
codecs, multi-channel, other bit depths, truncated data) is REFUSED
with ValueError rather than mis-decoded — the same strictness contract
as `functions/jpeg.py` / `functions/png.py`, so pipeline callers can
degrade to the stub arm on the exception and a silent wrong decode can
never reach an oracle.

Chunk walking is real: unknown chunks (LIST, fact, cue, bext, ...) are
skipped via their declared size with the RIFF odd-size pad byte
honored, so files written by common tools decode as long as their
`fmt ` says mono PCM16.
"""

from __future__ import annotations

import struct

# WAVE_FORMAT_PCM (RFC 2361 registry)
_FORMAT_PCM = 1


def encode_wav_pcm16(samples: list[int], sample_rate: int) -> bytes:
    """Encode mono 16-bit PCM samples as a canonical RIFF/WAVE blob:
    RIFF header, `fmt ` chunk (PCM, 1 channel), `data` chunk. Samples
    must fit int16; raises ValueError otherwise (a synthetic corpus
    overflowing the sample type is a bug, not a clamping opportunity)."""
    if not all(-32768 <= s <= 32767 for s in samples):
        raise ValueError("PCM16 sample out of range")
    if sample_rate <= 0:
        raise ValueError("sample rate must be positive")
    data = struct.pack(f"<{len(samples)}h", *samples)
    byte_rate = sample_rate * 2
    fmt = struct.pack("<HHIIHH", _FORMAT_PCM, 1, sample_rate, byte_rate, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    if len(data) % 2:  # RIFF pads odd chunks; PCM16 data never is, but be canonical
        body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav_pcm16(blob: bytes) -> tuple[int, list[int]]:
    """Decode a RIFF/WAVE blob to (sample_rate, samples). Supported:
    uncompressed mono 16-bit PCM, any sample rate; unknown chunks are
    skipped (declared size + odd-size pad). Everything else raises
    ValueError: not-RIFF/not-WAVE, compressed or extensible formats,
    multi-channel, non-16-bit, fmt/data missing, or a data chunk
    shorter than declared (truncation)."""
    if len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE blob")
    pos = 12
    fmt_seen = False
    sample_rate = 0
    data: bytes | None = None
    while pos + 8 <= len(blob):
        cid = blob[pos : pos + 4]
        (size,) = struct.unpack_from("<I", blob, pos + 4)
        body = blob[pos + 8 : pos + 8 + size]
        if len(body) < size:
            # a silently-short slice would let struct.error escape on
            # fmt (self-review r12) — every truncation is ValueError
            raise ValueError(f"WAVE {cid!r} chunk truncated")
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("WAVE fmt chunk too short")
            audio_format, channels, sample_rate, _br, _ba, bits = struct.unpack_from(
                "<HHIIHH", body
            )
            if audio_format != _FORMAT_PCM:
                raise ValueError(f"unsupported WAVE format code {audio_format}")
            if channels != 1:
                raise ValueError(f"only mono supported, got {channels} channels")
            if bits != 16:
                raise ValueError(f"only 16-bit PCM supported, got {bits}")
            fmt_seen = True
        elif cid == b"data":
            data = body
        pos += 8 + size + (size % 2)  # odd chunks carry a pad byte
    if not fmt_seen:
        raise ValueError("WAVE fmt chunk missing")
    if data is None:
        raise ValueError("WAVE data chunk missing")
    if len(data) % 2:
        raise ValueError("PCM16 data length is odd")
    return sample_rate, list(struct.unpack(f"<{len(data) // 2}h", data))
