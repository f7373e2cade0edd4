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
    # Integer-aligned boxes (e.g. an exact 2x downscale): every overlap
    # weight is exactly 1.0, so the accumulator is a float64 sum of
    # 8-bit ints — exact at ANY summation order (all partials are
    # integers far below 2^53) — and the numpy reduction below is
    # bit-identical to the original sequential loop while ~100x
    # faster. The fractional-box general path keeps the original
    # per-element accumulation ORDER untouched (r13 hoists only the
    # loop-invariant box/weight computation out of the pixel loop):
    # reordering a weighted float sum could flip the half-up rounding
    # of a pixel and break the resized blob's digest contract.
    sx, sy = in_w // out_w, in_h // out_h
    if sx >= 1 and sy >= 1 and sx * out_w == in_w and sy * out_h == in_h:
        import numpy as np

        a = np.asarray(rows, dtype=np.float64)
        sums = a.reshape(out_h, sy, out_w, sx).sum(axis=(1, 3))
        # int(acc/area + 0.5) with acc >= 0: floor of the same float ops
        v = np.floor(sums / float(sx * sy) + 0.5).astype(np.int64)
        return np.clip(v, 0, 255).tolist()
    x_scale = in_w / out_w
    y_scale = in_h / out_h
    x_boxes: list[list[tuple[int, float]]] = []
    for ox in range(out_w):
        x0 = ox * x_scale
        x1 = min((ox + 1) * x_scale, float(in_w))
        pairs: list[tuple[int, float]] = []
        ix = int(x0)
        while ix < x1:
            pairs.append((ix, min(ix + 1.0, x1) - max(float(ix), x0)))
            ix += 1
        x_boxes.append(pairs)
    out: list[list[int]] = []
    for oy in range(out_h):
        y0 = oy * y_scale
        y1 = min((oy + 1) * y_scale, float(in_h))
        y_pairs: list[tuple[int, float]] = []
        iy = int(y0)
        while iy < y1:
            y_pairs.append((iy, min(iy + 1.0, y1) - max(float(iy), y0)))
            iy += 1
        orow: list[int] = []
        for pairs in x_boxes:
            acc = 0.0
            area = 0.0
            for iy, wy in y_pairs:
                row = rows[iy]
                for ix, wx in pairs:
                    w = wy * wx
                    acc += row[ix] * w
                    area += w
            v = int(acc / area + 0.5)
            orow.append(255 if v > 255 else (0 if v < 0 else v))
        out.append(orow)
    return out
