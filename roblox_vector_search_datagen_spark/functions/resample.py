"""Pure-stdlib box-filter image resampling.

The pixel kernel of the multimodal RESIZE stage
(`operators/multimodal.py:media_resized`): area-weighted box filtering
— each output pixel is the average of the exact source rectangle it
covers, with fractional edge pixels weighted by their overlap. This is
the classic area-average ("box") resampling (what PIL calls
`Image.BOX`/`reduce`), chosen over nearest/bilinear because it is the
correct anti-aliasing filter for the downscale-only contract of the
resize stage (scale = min(1, max_edge/edge)) and it degrades to
nearest-neighbour on upscale automatically (a sub-pixel box lands
inside one source pixel).

Deterministic by construction: pure float64 arithmetic in a fixed
iteration order, round-half-up to 8-bit — identical bytes on every
platform/executor, which is what lets the resized blob's digest be a
stable dedup/equality key downstream.

Reference analog: the reference treats images as opaque bytes end to
end (src/lib/commands/downloadImages.ts:42-44 writes the fetched body
verbatim); the resize stage and this kernel are part of the
beyond-reference multimodal pipeline.
"""

from __future__ import annotations


def resample_gray_box(
    rows: list[list[int]], out_w: int, out_h: int
) -> list[list[int]]:
    """Area-weighted box resample of an 8-bit grayscale image.

    `rows` is the [height][width] pixel matrix the vendored decoders
    (functions/png.py, functions/jpeg.py) emit. Output pixel (oy, ox)
    averages the source rectangle
    [ox*w/out_w, (ox+1)*w/out_w) x [oy*h/out_h, (oy+1)*h/out_h),
    fractional border pixels weighted by overlap; the weights sum to
    the rectangle's area exactly, so flat regions stay flat and the
    global mean is preserved up to rounding."""
    if out_w < 1 or out_h < 1:
        raise ValueError(f"output dims must be >= 1, got {out_w}x{out_h}")
    in_h = len(rows)
    in_w = len(rows[0])
    x_scale = in_w / out_w
    y_scale = in_h / out_h
    out: list[list[int]] = []
    for oy in range(out_h):
        y0 = oy * y_scale
        y1 = min((oy + 1) * y_scale, float(in_h))
        orow: list[int] = []
        for ox in range(out_w):
            x0 = ox * x_scale
            x1 = min((ox + 1) * x_scale, float(in_w))
            acc = 0.0
            area = 0.0
            iy = int(y0)
            while iy < y1:
                wy = min(iy + 1.0, y1) - max(float(iy), y0)
                row = rows[iy]
                ix = int(x0)
                while ix < x1:
                    wx = min(ix + 1.0, x1) - max(float(ix), x0)
                    w = wy * wx
                    acc += row[ix] * w
                    area += w
                    ix += 1
                iy += 1
            v = int(acc / area + 0.5)
            orow.append(255 if v > 255 else (0 if v < 0 else v))
        out.append(orow)
    return out
