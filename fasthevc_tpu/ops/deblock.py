"""In-loop deblocking filter on device (JAX, TPU) — spec 8.7.2.

Reference parity: HM TComLoopFilter (SURVEY.md C8); bit-exact twin of the
NumPy oracle fasthevc_tpu.spec.deblock, redesigned dense: instead of
enumerating edge segments (dynamic shapes), EVERY possible 4-sample segment
position is computed and masked — same-direction edges are >= 8 samples
apart so segment updates never overlap, making the whole pass two dense
masked map operations (vertical, then horizontal via transpose).

All arithmetic is int32 (samples are <= 10 bits; every intermediate sum
stays far below 2^31), matching the oracle's exact integer semantics.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..spec.deblock import BETA_TABLE, TC_TABLE


def edge_masks_device(depth_map: jnp.ndarray, log2_ctu: int,
                      log2_max_tu: int = 5):
    """(vert, horz) bool edge maps on the 8x8 luma grid (device twin of
    spec.deblock.edge_flags). depth_map: [gh, gw] int."""
    gh, gw = depth_map.shape
    size = (1 << log2_ctu) >> depth_map.astype(jnp.int32)
    gx = (jnp.arange(gw) * 8)[None, :]
    gy = (jnp.arange(gh) * 8)[:, None]
    cu_left = (gx % size) == 0
    cu_top = (gy % size) == 0
    max_tu = 1 << log2_max_tu
    tu_left = cu_left | (((gx % jnp.minimum(size, max_tu)) == 0)
                         & (size > max_tu))
    tu_top = cu_top | (((gy % jnp.minimum(size, max_tu)) == 0)
                       & (size > max_tu))
    vert = tu_left & (jnp.arange(gw) > 0)[None, :]
    horz = tu_top & (jnp.arange(gh) > 0)[:, None]
    return vert, horz


def _clip(v, lo, hi):
    return jnp.minimum(jnp.maximum(v, lo), hi)


def _filter_vert_luma(plane: jnp.ndarray, seg_mask: jnp.ndarray,
                      seg_bs: jnp.ndarray, qp: int, bit_depth: int):
    """All vertical luma edges of a plane, dense-masked.

    plane: [H, W] int32. seg_mask/seg_bs: [H/4, W/8] — segment at
    (r, c) covers rows 4r..4r+3 around the edge at column 8c. In the
    column-0 position a mask must be False (picture boundary).
    """
    h, w = plane.shape
    nh, nw = h // 4, w // 8
    max_val = (1 << bit_depth) - 1
    x = plane.reshape(nh, 4, nw, 8).transpose(0, 2, 1, 3)  # [nh, nw, 4, 8]
    pb = jnp.roll(x, 1, axis=1)              # block c-1 sits at slot c
    blk = jnp.concatenate([pb[..., 4:], x[..., :4]], axis=-1)
    # blk[..., i]: p3 p2 p1 p0 q0 q1 q2 q3
    p3, p2, p1, p0 = blk[..., 0], blk[..., 1], blk[..., 2], blk[..., 3]
    q0, q1, q2, q3 = blk[..., 4], blk[..., 5], blk[..., 6], blk[..., 7]

    beta = jnp.asarray(BETA_TABLE, jnp.int32)[jnp.clip(qp, 0, 51)]
    bs = seg_bs.astype(jnp.int32)
    tc_tab = jnp.asarray(TC_TABLE, jnp.int32)
    tc_s = tc_tab[jnp.clip(qp + 2 * (bs - 1), 0, 53)]       # [nh, nw]
    tc = tc_s[..., None]                                    # [nh, nw, 1]

    dp = jnp.abs(p2 - 2 * p1 + p0)    # [nh, nw, 4]
    dq = jnp.abs(q2 - 2 * q1 + q0)
    dpq0 = dp[..., 0] + dq[..., 0]
    dpq3 = dp[..., 3] + dq[..., 3]
    d = dpq0 + dpq3
    do_filter = seg_mask & (bs > 0) & (d < beta)

    def strong_line(i):
        return ((2 * (dp[..., i] + dq[..., i]) < (beta >> 2))
                & (jnp.abs(p3[..., i] - p0[..., i])
                   + jnp.abs(q0[..., i] - q3[..., i]) < (beta >> 3))
                & (jnp.abs(p0[..., i] - q0[..., i])
                   < ((5 * tc_s + 1) >> 1)))

    strong = do_filter & strong_line(0) & strong_line(3)
    weak = do_filter & ~strong
    st = strong[..., None]

    sp0 = _clip((p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3,
                p0 - 2 * tc, p0 + 2 * tc)
    sp1 = _clip((p2 + p1 + p0 + q0 + 2) >> 2, p1 - 2 * tc, p1 + 2 * tc)
    sp2 = _clip((2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3,
                p2 - 2 * tc, p2 + 2 * tc)
    sq0 = _clip((q2 + 2 * q1 + 2 * q0 + 2 * p0 + p1 + 4) >> 3,
                q0 - 2 * tc, q0 + 2 * tc)
    sq1 = _clip((q2 + q1 + q0 + p0 + 2) >> 2, q1 - 2 * tc, q1 + 2 * tc)
    sq2 = _clip((2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3,
                q2 - 2 * tc, q2 + 2 * tc)

    delta = (9 * (q0 - p0) - 3 * (q1 - p1) + 8) >> 4
    w_ok = weak[..., None] & (jnp.abs(delta) < 10 * tc)
    dlt = _clip(delta, -tc, tc)
    wp0 = _clip(p0 + dlt, 0, max_val)
    wq0 = _clip(q0 - dlt, 0, max_val)
    side_thresh = (beta + (beta >> 1)) >> 3
    dEp = ((dp[..., 0] + dp[..., 3]) < side_thresh)[..., None]
    dEq = ((dq[..., 0] + dq[..., 3]) < side_thresh)[..., None]
    tc2 = tc >> 1
    dp1 = _clip((((p2 + p0 + 1) >> 1) - p1 + dlt) >> 1, -tc2, tc2)
    dq1 = _clip((((q2 + q0 + 1) >> 1) - q1 - dlt) >> 1, -tc2, tc2)
    wp1 = _clip(p1 + dp1, 0, max_val)
    wq1 = _clip(q1 + dq1, 0, max_val)

    np2 = jnp.where(st, _clip(sp2, 0, max_val), p2)
    np1 = jnp.where(st, _clip(sp1, 0, max_val),
                    jnp.where(w_ok & dEp, wp1, p1))
    np0 = jnp.where(st, _clip(sp0, 0, max_val), jnp.where(w_ok, wp0, p0))
    nq0 = jnp.where(st, _clip(sq0, 0, max_val), jnp.where(w_ok, wq0, q0))
    nq1 = jnp.where(st, _clip(sq1, 0, max_val),
                    jnp.where(w_ok & dEq, wq1, q1))
    nq2 = jnp.where(st, _clip(sq2, 0, max_val), q2)

    # write back: q side -> cols 0..2 of block c; p side -> cols 5..7 of
    # block c-1 (i.e. p values computed at slot c land at slot c-1)
    x = x.at[..., 0:3].set(jnp.stack([nq0, nq1, nq2], axis=-1))
    pvals = jnp.roll(jnp.stack([np2, np1, np0], axis=-1), -1, axis=1)
    x = x.at[..., 5:8].set(pvals)
    return x.transpose(0, 2, 1, 3).reshape(h, w)


def _filter_vert_chroma(plane: jnp.ndarray, seg_mask: jnp.ndarray,
                        qp_c: int, bit_depth: int):
    """Vertical chroma edges (BS=2 only): 4-row segments on [H/4, W/4]
    grid — edge at chroma column 4c (16-luma grid)."""
    h, w = plane.shape
    nh, nw = h // 4, w // 4
    max_val = (1 << bit_depth) - 1
    tc = jnp.asarray(TC_TABLE, jnp.int32)[jnp.clip(qp_c + 2, 0, 53)]
    x = plane.reshape(nh, 4, nw, 4).transpose(0, 2, 1, 3)  # [nh, nw, 4, 4]
    pb = jnp.roll(x, 1, axis=1)
    p1, p0 = pb[..., 2], pb[..., 3]
    q0, q1 = x[..., 0], x[..., 1]
    delta = _clip((((q0 - p0) << 2) + p1 - q1 + 4) >> 3, -tc, tc)
    m = seg_mask[..., None]
    np0 = jnp.where(m, _clip(p0 + delta, 0, max_val), p0)
    nq0 = jnp.where(m, _clip(q0 - delta, 0, max_val), q0)
    x = x.at[..., 0].set(nq0)
    x = x.at[..., 3].set(jnp.roll(np0, -1, axis=1))
    return x.transpose(0, 2, 1, 3).reshape(h, w)


def tu_cbf_map(lv_y: jnp.ndarray, depth_map: jnp.ndarray,
               log2_ctu: int) -> jnp.ndarray:
    """Per-8x8-granule luma TU cbf from a level plane: any nonzero level
    within the TU (TU == CU in this pipeline), replicated to granules.

    lv_y: [H, W] int; depth_map: [H/8, W/8]. Returns bool [H/8, W/8]."""
    h, w = lv_y.shape
    gh, gw = h // 8, w // 8
    nz8 = ((lv_y != 0).reshape(gh, 8, gw, 8).any(axis=(1, 3)))
    size = (1 << log2_ctu) >> depth_map.astype(jnp.int32)
    cbf = nz8
    n = 16
    while n <= (1 << log2_ctu):
        r = n // 8
        red = (nz8[:gh - gh % r, :gw - gw % r]
               .reshape(gh // r, r, gw // r, r).any(axis=(1, 3)))
        up = jnp.repeat(jnp.repeat(red, r, axis=0), r, axis=1)
        up = jnp.pad(up, ((0, gh - up.shape[0]), (0, gw - up.shape[1])))
        cbf = jnp.where(size == n, up, cbf)
        n *= 2
    return cbf


def inter_bs_maps(depth_map: jnp.ndarray, dir_map: jnp.ndarray,
                  mv_map: jnp.ndarray, cbf_y_g: jnp.ndarray,
                  ref_map=None):
    """Boundary strengths for a P/B picture (spec 8.7.2.4; device twin of
    spec.deblock._segment_bs).

    depth_map/dir_map/cbf_y_g: [gh, gw] granule (8x8) maps; mv_map:
    [gh, gw, 4] quarter-pel (mv0x, mv0y, mv1x, mv1y) — unused-list MVs
    are zeroed here, matching MotionCu.normalize().  ref_map: optional
    [gh, gw, 2] per-list ref indices; the BS-1 "different reference"
    test compares the per-list (ref0, ref1) vectors with -1 for unused
    lists, exactly like the oracle's MotionField.ref_idx comparison.
    Returns (bs_vert [h/4, w/8], bs_horz [w/4, h/8]) int32; positions
    without a CU/TU edge carry garbage strengths that the edge masks in
    deblock_device suppress."""
    d = dir_map.astype(jnp.int32)
    mv = mv_map.astype(jnp.int32)
    mv = jnp.concatenate(
        [jnp.where((d[..., None] & 1) > 0, mv[..., 0:2], 0),
         jnp.where((d[..., None] & 2) > 0, mv[..., 2:4], 0)], axis=-1)
    if ref_map is None:
        r0 = jnp.zeros_like(d)
        r1 = jnp.zeros_like(d)
    else:
        r0 = ref_map[..., 0].astype(jnp.int32)
        r1 = ref_map[..., 1].astype(jnp.int32)
    refv = jnp.stack([jnp.where((d & 1) > 0, r0, -1),
                      jnp.where((d & 2) > 0, r1, -1)], axis=-1)

    def up2(a):
        return jnp.repeat(jnp.repeat(a, 2, axis=0), 2, axis=1)

    intra4 = up2(d == 0)
    ref4 = jnp.repeat(jnp.repeat(refv, 2, axis=0), 2, axis=1)
    cbf4 = up2(cbf_y_g.astype(jnp.bool_))
    mv4 = jnp.repeat(jnp.repeat(mv, 2, axis=0), 2, axis=1)

    def bs_pairs(i4, rf4, cb4, m4):
        """p = left 4-col, q = right 4-col of each vertical edge."""
        shift = lambda a: jnp.concatenate(  # noqa: E731
            [jnp.zeros_like(a[:, :1]), a[:, :-1]], axis=1)
        pi, qi = shift(i4)[:, 0::2], i4[:, 0::2]
        pr = shift(rf4)[:, 0::2]
        qr = rf4[:, 0::2]
        pc, qc = shift(cb4)[:, 0::2], cb4[:, 0::2]
        pm = shift(m4)[:, 0::2]
        qm = m4[:, 0::2]
        dref = (pr != qr).any(axis=-1)
        dmv = (jnp.abs(pm - qm) >= 4).any(axis=-1)
        return jnp.where(pi | qi, 2,
                         jnp.where(pc | qc | dref | dmv, 1, 0))

    bs_vert = bs_pairs(intra4, ref4, cbf4, mv4)            # [h/4, w/8]
    bs_horz = bs_pairs(intra4.T, ref4.transpose(1, 0, 2), cbf4.T,
                       mv4.transpose(1, 0, 2))             # [w/4, h/8]
    return bs_vert.astype(jnp.int32), bs_horz.astype(jnp.int32)


@partial(jax.jit, static_argnames=("log2_ctu", "log2_max_tu", "bit_depth"))
def deblock_device(rec_y: jnp.ndarray, rec_cb: jnp.ndarray,
                   rec_cr: jnp.ndarray, depth_map: jnp.ndarray,
                   qp, qp_cb, qp_cr, log2_ctu: int,
                   bit_depth: int = 8, log2_max_tu: int = 5,
                   bs_vert: jnp.ndarray | None = None,
                   bs_horz: jnp.ndarray | None = None):
    """Deblock an intra (or supplied-BS) picture on device.

    rec_*: int32 planes in coded dims (multiples of 8 luma). depth_map:
    [h/8, w/8] int CU depths. bs_vert/bs_horz: optional per-4-sample-
    segment boundary strengths [h/4, w/8] / [w/4, h/8] (None = all-intra,
    BS 2 on every CU/TU edge). Returns filtered (y, cb, cr).
    """
    vert, horz = edge_masks_device(depth_map, log2_ctu, log2_max_tu)
    # luma vertical: repeat the 8-row edge grid to 4-row segments
    vseg = jnp.repeat(vert, 2, axis=0)                  # [h/4, w/8]
    bsv = bs_vert if bs_vert is not None else \
        jnp.where(vseg, jnp.int32(2), jnp.int32(0))
    y = _filter_vert_luma(rec_y.astype(jnp.int32), vseg, bsv, qp, bit_depth)
    # luma horizontal via transpose
    hseg = jnp.repeat(horz, 2, axis=1).T                # [w/4, h/8]
    bsh = bs_horz if bs_horz is not None else \
        jnp.where(hseg, jnp.int32(2), jnp.int32(0))
    y = _filter_vert_luma(y.T, hseg, bsh, qp, bit_depth).T

    # chroma: edges on the 16-luma grid, BS=2 segments only
    gh, gw = depth_map.shape
    cvert = vert & ((jnp.arange(gw) % 2 == 0))[None, :]
    chorz = horz & ((jnp.arange(gh) % 2 == 0))[:, None]
    if bs_vert is not None:
        # a chroma edge filters only where the luma BS is 2 (first 4x4
        # luma unit of each 8-luma segment pair)
        cbs = bs_vert[0::2]                       # [h/8, w/8] segment rows
        cvseg = cvert & (cbs == 2)
    else:
        cvseg = cvert
    if bs_horz is not None:
        chs = bs_horz[0::2]                       # [w/8, h/8]
        chseg = chorz & (chs == 2).T
    else:
        chseg = chorz
    # chroma seg grid: [ch/4, cw/4] = [h/8, w/8] — matches the granule grid
    cb = _filter_vert_chroma(rec_cb.astype(jnp.int32), cvseg, qp_cb,
                             bit_depth)
    cb = _filter_vert_chroma(cb.T, chseg.T, qp_cb, bit_depth).T
    cr = _filter_vert_chroma(rec_cr.astype(jnp.int32), cvseg, qp_cr,
                             bit_depth)
    cr = _filter_vert_chroma(cr.T, chseg.T, qp_cr, bit_depth).T
    return y, cb, cr
