"""Minimal pure-stdlib SubRip (".srt") subtitle codec (public format:
numbered cue blocks separated by blank lines, each an index line, an
`HH:MM:SS,mmm --> HH:MM:SS,mmm` timing line, and one or more text
lines). Exists so the TEXT-TRACK arm of the multimodal pipeline is
executable — and therefore testable — without media libraries: SRT is
the interchange format every captioning/transcription tool can emit,
and cue extraction is what turns a captioned clip into (segment,
caption) training pairs.

Supported subset: well-formed cue blocks with strictly increasing
1-based indices, `,` or `.` millisecond separators (both appear in the
wild), end > start, and non-empty text. Everything else — junk index,
malformed timing line, empty cue text, out-of-order indices — is
REFUSED with ValueError rather than mis-parsed: the same strictness
contract as the PNG/JPEG/WAV/Y4M codecs, so pipeline callers can
degrade to the stub arm on the exception and a silent wrong parse can
never reach an oracle.
"""

from __future__ import annotations

import re

_TIME = r"(\d{2,}):(\d{2}):(\d{2})[,.](\d{3})"
_TIMING = re.compile(rf"^{_TIME}\s+-->\s+{_TIME}\s*$")


def _ms(h: str, m: str, s: str, ms: str) -> int:
    mi, si = int(m), int(s)
    if mi > 59 or si > 59:
        raise ValueError("SRT timestamp minutes/seconds out of range")
    return ((int(h) * 60 + mi) * 60 + si) * 1000 + int(ms)


def format_srt_time(ms: int) -> str:
    """Canonical `HH:MM:SS,mmm` rendering of a millisecond offset."""
    if ms < 0:
        raise ValueError("SRT time must be non-negative")
    s, msec = divmod(ms, 1000)
    m, sec = divmod(s, 60)
    h, minute = divmod(m, 60)
    return f"{h:02d}:{minute:02d}:{sec:02d},{msec:03d}"


def encode_srt(cues: list[tuple[int, int, str]]) -> bytes:
    """Encode (start_ms, end_ms, text) cues as a canonical SRT blob
    (1-based indices, `,` millisecond separator, one blank line
    between blocks). Raises ValueError on empty input, an empty or
    blank-line-containing text, or end <= start — a malformed cue in
    a synthetic corpus is a bug, not a formatting opportunity."""
    if not cues:
        raise ValueError("SRT needs at least one cue")
    blocks = []
    for i, (start, end, text) in enumerate(cues, 1):
        if end <= start:
            raise ValueError("SRT cue end must be after start")
        if not text or text != text.strip() or "\n\n" in text or "\r" in text:
            # leading/trailing whitespace or embedded blank lines would
            # emit a blob this module's own decoder refuses or silently
            # normalizes — refuse at encode time (strict roundtrip)
            raise ValueError(
                "SRT cue text must be non-empty, stripped, and free of "
                "blank lines"
            )
        blocks.append(
            f"{i}\n{format_srt_time(start)} --> {format_srt_time(end)}\n{text}\n"
        )
    return "\n".join(blocks).encode("utf-8")


def decode_srt(blob: bytes) -> list[tuple[int, int, str]]:
    """Decode an SRT blob to (start_ms, end_ms, text) cues in block
    order. Indices must be exactly 1..n in order (re-numbered files
    from standard tools always are); `,` and `.` millisecond
    separators both accepted; multi-line cue text joined with '\\n'.
    Everything else raises ValueError — see module docstring."""
    try:
        s = blob.decode("utf-8")
    except UnicodeDecodeError as exc:
        raise ValueError("SRT blob is not UTF-8") from exc
    if s.startswith("﻿"):  # BOM from Windows tools
        s = s[1:]
    blocks = [b for b in re.split(r"\r?\n\r?\n", s) if b.strip()]
    if not blocks:
        raise ValueError("SRT has no cue blocks")
    cues: list[tuple[int, int, str]] = []
    for expect_idx, block in enumerate(blocks, 1):
        lines = [ln.rstrip("\r") for ln in block.split("\n")]
        while lines and not lines[0].strip():
            lines.pop(0)
        if len(lines) < 3:
            raise ValueError("SRT cue block too short")
        if not lines[0].strip().isdigit() or int(lines[0]) != expect_idx:
            raise ValueError(f"SRT cue index must be {expect_idx}, got {lines[0]!r}")
        m = _TIMING.match(lines[1])
        if not m:
            raise ValueError(f"malformed SRT timing line {lines[1]!r}")
        start = _ms(*m.groups()[:4])
        end = _ms(*m.groups()[4:])
        if end <= start:
            raise ValueError("SRT cue end must be after start")
        text = "\n".join(lines[2:]).strip()
        if not text:
            raise ValueError("SRT cue text is empty")
        cues.append((start, end, text))
    return cues
