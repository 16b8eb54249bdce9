"""Inter prediction support: MV field, merge and AMVP candidate derivation.

Reference parity: HM TComDataCU motion field + TEncSearch AMVP/merge
(SURVEY.md E7, C1) — reimplemented from spec 8.5.3.2. Scope: P slices,
2Nx2N PUs (PU == CU), single reference picture list with one active ref,
no temporal MVP (SPS flag 0), max 5 merge candidates.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

MAX_MERGE_CAND = 5


class MotionField:
    """Per-4x4-granule motion state for one picture."""

    def __init__(self, coded_w: int, coded_h: int) -> None:
        gw, gh = coded_w >> 2, coded_h >> 2
        self.inter = np.zeros((gh, gw), dtype=bool)
        self.mv = np.zeros((gh, gw, 2), dtype=np.int32)  # quarter-pel
        self.ref_idx = np.full((gh, gw), -1, dtype=np.int32)
        self.cbf_y = np.zeros((gh, gw), dtype=bool)

    def set_cu(self, x: int, y: int, size: int, mv, ref_idx: int,
               cbf_y: bool) -> None:
        g = slice(y >> 2, (y + size) >> 2), slice(x >> 2, (x + size) >> 2)
        self.inter[g] = True
        self.mv[g] = mv
        self.ref_idx[g] = ref_idx
        self.cbf_y[g] = cbf_y

    def set_intra_cu(self, x: int, y: int, size: int, cbf_y: bool) -> None:
        g = slice(y >> 2, (y + size) >> 2), slice(x >> 2, (x + size) >> 2)
        self.inter[g] = False
        self.ref_idx[g] = -1
        self.cbf_y[g] = cbf_y


def _motion_at(maps, mf: MotionField, xn: int, yn: int, x: int, y: int):
    """Motion of the PU covering (xn, yn) if available+inter, else None.
    Availability follows z-scan decode order relative to (x, y)."""
    from .intra import sample_available

    sp = maps.sp
    if not sample_available(xn, yn, x, y, sp.coded_width, sp.coded_height,
                            sp.log2_ctu, getattr(maps, "tile_rect", None)):
        return None
    gy, gx = yn >> 2, xn >> 2
    if not mf.inter[gy, gx]:
        return None
    return (int(mf.mv[gy, gx, 0]), int(mf.mv[gy, gx, 1]),
            int(mf.ref_idx[gy, gx]))


def merge_candidates(maps, mf: MotionField, x: int, y: int,
                     size: int) -> list:
    """Merge candidate list (spec 8.5.3.2.3), spatial + zero fill.

    Returns a list of (mv_x, mv_y, ref_idx), length MAX_MERGE_CAND.
    """
    a1 = _motion_at(maps, mf, x - 1, y + size - 1, x, y)
    b1 = _motion_at(maps, mf, x + size - 1, y - 1, x, y)
    b0 = _motion_at(maps, mf, x + size, y - 1, x, y)
    a0 = _motion_at(maps, mf, x - 1, y + size, x, y)
    b2 = _motion_at(maps, mf, x - 1, y - 1, x, y)

    cands = []
    if a1 is not None:
        cands.append(a1)
    if b1 is not None and b1 != a1:
        cands.append(b1)
    if b0 is not None and b0 != b1:
        cands.append(b0)
    if a0 is not None and a0 != a1:
        cands.append(a0)
    n_spatial4 = sum(c is not None for c in (a0, a1, b0, b1))
    if (len(cands) < 4 and n_spatial4 < 4 and b2 is not None
            and b2 != a1 and b2 != b1):
        cands.append(b2)
    # no TMVP (SPS flag 0); zero-fill
    while len(cands) < MAX_MERGE_CAND:
        cands.append((0, 0, 0))
    return cands[:MAX_MERGE_CAND]


def amvp_candidates(maps, mf: MotionField, x: int, y: int,
                    size: int) -> list:
    """AMVP predictor list for L0 ref 0 (spec 8.5.3.2.5): two entries."""
    a0 = _motion_at(maps, mf, x - 1, y + size, x, y)
    a1 = _motion_at(maps, mf, x - 1, y + size - 1, x, y)
    b0 = _motion_at(maps, mf, x + size, y - 1, x, y)
    b1 = _motion_at(maps, mf, x + size - 1, y - 1, x, y)
    b2 = _motion_at(maps, mf, x - 1, y - 1, x, y)

    cand_a = next((c for c in (a0, a1) if c is not None), None)
    cand_b = next((c for c in (b0, b1, b2) if c is not None), None)
    out = []
    if cand_a is not None:
        out.append((cand_a[0], cand_a[1]))
    if cand_b is not None and (cand_a is None
                               or (cand_b[0], cand_b[1]) != (cand_a[0],
                                                             cand_a[1])):
        out.append((cand_b[0], cand_b[1]))
    while len(out) < 2:
        out.append((0, 0))
    return out[:2]


# ---------------------------------------------------------------------------
# MVD syntax (7.3.8.9 / 9.3.3.8)
# ---------------------------------------------------------------------------

def encode_mvd(coder, mvd_x: int, mvd_y: int) -> None:
    gt0 = [int(mvd_x != 0), int(mvd_y != 0)]
    coder.encode_bin("mvd_flag", 0, gt0[0])
    coder.encode_bin("mvd_flag", 0, gt0[1])
    gt1 = [int(abs(mvd_x) > 1), int(abs(mvd_y) > 1)]
    if gt0[0]:
        coder.encode_bin("mvd_flag", 1, gt1[0])
    if gt0[1]:
        coder.encode_bin("mvd_flag", 1, gt1[1])
    for v, g0, g1 in ((mvd_x, gt0[0], gt1[0]), (mvd_y, gt0[1], gt1[1])):
        if g0:
            if g1:
                _write_eg1(coder, abs(v) - 2)
            coder.encode_bypass(1 if v < 0 else 0)


def decode_mvd(dec) -> tuple[int, int]:
    g0x = dec.decode_bin("mvd_flag", 0)
    g0y = dec.decode_bin("mvd_flag", 0)
    g1x = dec.decode_bin("mvd_flag", 1) if g0x else 0
    g1y = dec.decode_bin("mvd_flag", 1) if g0y else 0
    out = []
    for g0, g1 in ((g0x, g1x), (g0y, g1y)):
        if not g0:
            out.append(0)
            continue
        v = 2 + _read_eg1(dec) if g1 else 1
        if dec.decode_bypass():
            v = -v
        out.append(v)
    return out[0], out[1]


def _write_eg1(coder, value: int) -> None:
    """1st-order Exp-Golomb, bypass bins (abs_mvd_minus2)."""
    k = 1
    while value >= (1 << k):
        coder.encode_bypass(1)
        value -= 1 << k
        k += 1
    coder.encode_bypass(0)
    coder.encode_bypass_bits(value, k)


def _read_eg1(dec) -> int:
    k = 1
    base = 0
    while dec.decode_bypass():
        base += 1 << k
        k += 1
        if k > 31:
            raise ValueError("corrupt mvd")
    return base + dec.decode_bypass_bits(k)
