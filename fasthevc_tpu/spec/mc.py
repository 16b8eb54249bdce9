"""Motion compensation: HEVC interpolation filters (spec 8.5.4).

Reference parity: HM TComPrediction::motionCompensation +
TComInterpolationFilter (SURVEY.md C4). Luma: 8-tap filters at quarter-pel
positions; chroma: 4-tap at eighth-pel. Uni-prediction (P slices); the
bi-prediction average is a straightforward extension for B slices.

Out-of-picture references use edge clamping (equivalent to the spec's
padded reference pictures).
"""

from __future__ import annotations

import numpy as np

# Luma quarter-pel filter coefficients (spec Table 8-11), index = frac.
LUMA_FILTERS = np.array([
    [0, 0, 0, 64, 0, 0, 0, 0],
    [-1, 4, -10, 58, 17, -5, 1, 0],
    [-1, 4, -11, 40, 40, -11, 4, -1],
    [0, 1, -5, 17, 58, -10, 4, -1],
], dtype=np.int32)

# Chroma eighth-pel filter coefficients (spec Table 8-12), index = frac.
CHROMA_FILTERS = np.array([
    [0, 64, 0, 0],
    [-2, 58, 10, -2],
    [-4, 54, 16, -2],
    [-6, 46, 28, -4],
    [-4, 36, 36, -4],
    [-4, 28, 46, -6],
    [-2, 16, 54, -4],
    [-2, 10, 58, -2],
], dtype=np.int32)


def _fetch(ref: np.ndarray, x0: int, y0: int, w: int, h: int) -> np.ndarray:
    """Fetch a w x h window at (x0, y0) with edge clamping."""
    ph, pw = ref.shape
    ys = np.clip(np.arange(y0, y0 + h), 0, ph - 1)
    xs = np.clip(np.arange(x0, x0 + w), 0, pw - 1)
    return ref[np.ix_(ys, xs)]


def mc_luma(ref: np.ndarray, x: int, y: int, w: int, h: int,
            mv_x: int, mv_y: int, bit_depth: int = 8) -> np.ndarray:
    """Motion-compensated luma block (spec 8.5.4.2.2.1).

    (x, y): block position; (mv_x, mv_y): MV in quarter-pel units.
    Returns int32 [h, w] prediction samples.
    """
    ix, iy = x + (mv_x >> 2), y + (mv_y >> 2)
    fx, fy = mv_x & 3, mv_y & 3
    shift1 = bit_depth - 8          # 0 for 8-bit
    max_val = (1 << bit_depth) - 1
    if fx == 0 and fy == 0:
        return _fetch(ref, ix, iy, w, h).astype(np.int32)
    if fy == 0:
        win = _fetch(ref, ix - 3, iy, w + 7, h).astype(np.int64)
        f = LUMA_FILTERS[fx]
        acc = sum(int(f[k]) * win[:, k:k + w] for k in range(8))
        out = (acc >> shift1) if shift1 else acc
        return np.clip((out + 32) >> 6, 0, max_val).astype(np.int32)
    if fx == 0:
        win = _fetch(ref, ix, iy - 3, w, h + 7).astype(np.int64)
        f = LUMA_FILTERS[fy]
        acc = sum(int(f[k]) * win[k:k + h, :] for k in range(8))
        return np.clip((acc + 32) >> 6, 0, max_val).astype(np.int32)
    # separable: horizontal to intermediate (14-bit), then vertical
    win = _fetch(ref, ix - 3, iy - 3, w + 7, h + 7).astype(np.int64)
    fh = LUMA_FILTERS[fx]
    tmp = sum(int(fh[k]) * win[:, k:k + w] for k in range(8))
    tmp >>= (bit_depth - 8)  # shift1; 0 for 8-bit
    fv = LUMA_FILTERS[fy]
    acc = sum(int(fv[k]) * tmp[k:k + h, :] for k in range(8))
    return np.clip((acc + (1 << 11)) >> 12, 0, max_val).astype(np.int32)


def mc_chroma(ref: np.ndarray, x: int, y: int, w: int, h: int,
              mv_x: int, mv_y: int, bit_depth: int = 8) -> np.ndarray:
    """Motion-compensated chroma block (eighth-pel; mv in luma quarter-pel
    so chroma frac = mv & 7 on the chroma grid)."""
    # chroma mv = luma mv / 2 in units of 1/8 chroma pel
    ix, iy = x + (mv_x >> 3), y + (mv_y >> 3)
    fx, fy = mv_x & 7, mv_y & 7
    max_val = (1 << bit_depth) - 1
    if fx == 0 and fy == 0:
        return _fetch(ref, ix, iy, w, h).astype(np.int32)
    if fy == 0:
        win = _fetch(ref, ix - 1, iy, w + 3, h).astype(np.int64)
        f = CHROMA_FILTERS[fx]
        acc = sum(int(f[k]) * win[:, k:k + w] for k in range(4))
        return np.clip((acc + 32) >> 6, 0, max_val).astype(np.int32)
    if fx == 0:
        win = _fetch(ref, ix, iy - 1, w, h + 3).astype(np.int64)
        f = CHROMA_FILTERS[fy]
        acc = sum(int(f[k]) * win[k:k + h, :] for k in range(4))
        return np.clip((acc + 32) >> 6, 0, max_val).astype(np.int32)
    win = _fetch(ref, ix - 1, iy - 1, w + 3, h + 3).astype(np.int64)
    fh = CHROMA_FILTERS[fx]
    tmp = sum(int(fh[k]) * win[:, k:k + w] for k in range(4))
    tmp >>= (bit_depth - 8)
    fv = CHROMA_FILTERS[fy]
    acc = sum(int(fv[k]) * tmp[k:k + h, :] for k in range(4))
    return np.clip((acc + (1 << 11)) >> 12, 0, max_val).astype(np.int32)


def mc_cu(planes_ref, x: int, y: int, size: int, mv, bit_depth: int = 8):
    """Full-CU motion compensation: returns (pred_y, pred_cb, pred_cr)."""
    mvx, mvy = int(mv[0]), int(mv[1])
    py = mc_luma(planes_ref.y, x, y, size, size, mvx, mvy, bit_depth)
    pcb = mc_chroma(planes_ref.cb, x >> 1, y >> 1, size >> 1, size >> 1,
                    mvx, mvy, bit_depth)
    pcr = mc_chroma(planes_ref.cr, x >> 1, y >> 1, size >> 1, size >> 1,
                    mvx, mvy, bit_depth)
    return py, pcb, pcr
