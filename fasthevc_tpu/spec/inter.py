"""Inter prediction support: two-list MV field, merge and AMVP derivation.

Reference parity: HM TComDataCU motion field + TEncSearch AMVP/merge
(SURVEY.md E7, C1) — reimplemented from spec 8.5.3.2. Scope: P and B
slices, 2Nx2N PUs (PU == CU), one active reference per list, no temporal
MVP (SPS flag 0), max 5 merge candidates.

Motion is carried as (inter_dir, mv_l0, ref_l0, mv_l1, ref_l1) with
inter_dir 1 = L0, 2 = L1, 3 = BI (spec PredFlagLX).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

MAX_MERGE_CAND = 5
DIR_L0, DIR_L1, DIR_BI = 1, 2, 3


@dataclass(frozen=True)
class Motion:
    """Motion of one PU: per-list MV + ref idx (-1 = list unused)."""
    inter_dir: int = DIR_L0
    mv0: tuple = (0, 0)
    ref0: int = -1
    mv1: tuple = (0, 0)
    ref1: int = -1


class MotionField:
    """Per-4x4-granule motion state for one picture (two lists)."""

    def __init__(self, coded_w: int, coded_h: int) -> None:
        gw, gh = coded_w >> 2, coded_h >> 2
        self.inter = np.zeros((gh, gw), dtype=bool)
        self.mv = np.zeros((gh, gw, 2, 2), dtype=np.int32)  # [list][x,y]
        self.ref_idx = np.full((gh, gw, 2), -1, dtype=np.int32)
        self.cbf_y = np.zeros((gh, gw), dtype=bool)

    def set_cu(self, x: int, y: int, size: int, motion: "Motion",
               cbf_y: bool) -> None:
        g = slice(y >> 2, (y + size) >> 2), slice(x >> 2, (x + size) >> 2)
        self.inter[g] = True
        self.mv[g] = 0
        self.ref_idx[g] = -1
        if motion.inter_dir & DIR_L0:
            self.mv[g[0], g[1], 0] = motion.mv0
            self.ref_idx[g[0], g[1], 0] = motion.ref0
        if motion.inter_dir & DIR_L1:
            self.mv[g[0], g[1], 1] = motion.mv1
            self.ref_idx[g[0], g[1], 1] = motion.ref1
        self.cbf_y[g] = cbf_y

    def set_intra_cu(self, x: int, y: int, size: int, cbf_y: bool) -> None:
        g = slice(y >> 2, (y + size) >> 2), slice(x >> 2, (x + size) >> 2)
        self.inter[g] = False
        self.ref_idx[g] = -1
        self.cbf_y[g] = cbf_y


def _motion_at(maps, mf: MotionField, xn: int, yn: int, x: int,
               y: int) -> Motion | None:
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
    r0 = int(mf.ref_idx[gy, gx, 0])
    r1 = int(mf.ref_idx[gy, gx, 1])
    d = (1 if r0 >= 0 else 0) | (2 if r1 >= 0 else 0)
    return Motion(d, (int(mf.mv[gy, gx, 0, 0]), int(mf.mv[gy, gx, 0, 1])),
                  r0, (int(mf.mv[gy, gx, 1, 0]), int(mf.mv[gy, gx, 1, 1])),
                  r1)


def merge_candidates(maps, mf: MotionField, x: int, y: int, size: int,
                     is_b: bool = False) -> list:
    """Merge candidate list (spec 8.5.3.2.3), spatial + zero fill.

    Returns a list of Motion, length MAX_MERGE_CAND.
    """
    a1 = _motion_at(maps, mf, x - 1, y + size - 1, x, y)
    b1 = _motion_at(maps, mf, x + size - 1, y - 1, x, y)
    b0 = _motion_at(maps, mf, x + size, y - 1, x, y)
    a0 = _motion_at(maps, mf, x - 1, y + size, x, y)
    b2 = _motion_at(maps, mf, x - 1, y - 1, x, y)

    cands: list[Motion] = []
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
    # no TMVP (SPS flag 0); no combined-bi (needs >= 2 cands w/ both dirs —
    # spec generates them for B, but zero-fill is always conformant after);
    # zero candidates (BI for B slices, L0 for P)
    zero = Motion(DIR_BI, (0, 0), 0, (0, 0), 0) if is_b else \
        Motion(DIR_L0, (0, 0), 0)
    while len(cands) < MAX_MERGE_CAND:
        cands.append(zero)
    return cands[:MAX_MERGE_CAND]


def amvp_candidates(maps, mf: MotionField, x: int, y: int, size: int,
                    list_idx: int = 0) -> list:
    """AMVP predictor list for the given list, ref 0 (spec 8.5.3.2.5)."""

    def mv_of(m: Motion | None):
        if m is None:
            return None
        # same-list first; spec falls back to the other list's MV when it
        # points at the same picture — with distinct-POC refs per list we
        # use same-list only, then other-list (no scaling: short deltas)
        if list_idx == 0 and (m.inter_dir & DIR_L0):
            return m.mv0
        if list_idx == 1 and (m.inter_dir & DIR_L1):
            return m.mv1
        return None

    a0 = _motion_at(maps, mf, x - 1, y + size, x, y)
    a1 = _motion_at(maps, mf, x - 1, y + size - 1, x, y)
    b0 = _motion_at(maps, mf, x + size, y - 1, x, y)
    b1 = _motion_at(maps, mf, x + size - 1, y - 1, x, y)
    b2 = _motion_at(maps, mf, x - 1, y - 1, x, y)

    cand_a = next((mv_of(c) for c in (a0, a1) if mv_of(c) is not None),
                  None)
    cand_b = next((mv_of(c) for c in (b0, b1, b2)
                   if mv_of(c) is not None), None)
    out = []
    if cand_a is not None:
        out.append(cand_a)
    if cand_b is not None and (cand_a is None or cand_b != cand_a):
        out.append(cand_b)
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


def encode_inter_pred_idc(coder, inter_dir: int, depth: int) -> None:
    """inter_pred_idc for 2Nx2N B PUs (spec 9.3.3.7): bin0 ctx = CtDepth
    (1 = BI); if not BI: bin1 ctx 4 (0 = L0, 1 = L1)."""
    coder.encode_bin("inter_pred_idc", depth, 1 if inter_dir == DIR_BI else 0)
    if inter_dir != DIR_BI:
        coder.encode_bin("inter_pred_idc", 4,
                         1 if inter_dir == DIR_L1 else 0)


def decode_inter_pred_idc(dec, depth: int) -> int:
    if dec.decode_bin("inter_pred_idc", depth):
        return DIR_BI
    return DIR_L1 if dec.decode_bin("inter_pred_idc", 4) else DIR_L0


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
