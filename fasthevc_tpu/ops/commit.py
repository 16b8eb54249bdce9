"""Wavefront intra commit on device (JAX, TPU) — exact reconstruction.

Reference parity: HM's recursive z-order reconstruct (TEncCu commit side,
SURVEY.md E6/§3.1) and this repo's C++ commit pass
(cabac_cpp/slice_engine.cpp commit_intra_cu), redesigned TPU-first:

  * CTUs are processed in anti-diagonal waves (wave = cx + 2*cy), so the
    left, top-left, top and top-right CTUs of every wave member are
    complete — all cross-CTU intra references are final.
  * Within a wave, each CTU runs 16 unrolled z-order granule steps on a
    LOCAL 32x32 buffer; inner references are static slices of that buffer,
    so the global planes are touched once per wave (strip gathers in,
    block scatters out) instead of per block.
  * Reference availability follows the DECODING order (tile-major CTU
    raster + z-order within CTU, spec 6.4.1) — computed arithmetically
    from coordinates, never from the schedule.
  * All reconstruction math is exact int32 (transforms/quant from
    ops.transform, prediction from ops.intra which is the tested spec
    twin); sign-data hiding is applied with an overflow-free integer
    residue key (see _sdh_adjust_device).

Output levels/recon are bit-identical to the C++ engine's commit pass for
the same decision maps — enforced by tests/test_device_commit.py.

Scope: intra slices, CTU 32 (log2_ctu == 5), TU == CU, 8/10-bit.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..spec.residual import get_scan
from .intra import predict_selected
from .transform import dequantize, fwd_transform, inv_transform, quantize

CTU = 32
GR = 8          # granule (min CU) size
NG = CTU // GR  # granules per CTU side (4)

# z-order index -> (gx, gy) within the 4x4 granule grid
_ZXY = [(0, 0), (1, 0), (0, 1), (1, 1), (2, 0), (3, 0), (2, 1), (3, 1),
        (0, 2), (1, 2), (0, 3), (1, 3), (2, 2), (3, 2), (2, 3), (3, 3)]


def _z_of(u, v):
    """z index of granule (u, v) within its CTU — vectorized formula."""
    return ((u & 1) | ((v & 1) << 1) | ((u & 2) << 1) | ((v & 2) << 2))


def wave_tables(nctux: int, nctuy: int):
    """Static wavefront schedule: wave w holds CTUs with cx + 2*cy == w.

    Returns (ctu_x [W, A], ctu_y [W, A], valid [W, A]) numpy arrays,
    A = max CTUs per wave."""
    n_waves = nctux + 2 * (nctuy - 1)
    waves = [[] for _ in range(n_waves)]
    for cy in range(nctuy):
        for cx in range(nctux):
            waves[cx + 2 * cy].append((cx, cy))
    a_max = max(len(wv) for wv in waves)
    ctu_x = np.zeros((n_waves, a_max), np.int32)
    ctu_y = np.zeros((n_waves, a_max), np.int32)
    valid = np.zeros((n_waves, a_max), bool)
    for w, wv in enumerate(waves):
        for a, (cx, cy) in enumerate(wv):
            ctu_x[w, a] = cx
            ctu_y[w, a] = cy
            valid[w, a] = True
    return ctu_x, ctu_y, valid


# ---------------------------------------------------------------------------
# Reference assembly + substitution
# ---------------------------------------------------------------------------

def _tile_idx(coord, bounds):
    """Tile index of a sample coordinate given static boundary list
    (sample units). bounds: inner boundaries only."""
    t = jnp.zeros_like(coord)
    for b in bounds:
        t = t + (coord >= b).astype(coord.dtype)
    return t


def _gather_refs(local, top_strip, left_strip, lx, ly, n, half):
    """Raw reference array r[0..4n] for a block at LOCAL (lx, ly), size n.

    Order: r[0] = bottom-most below-left (lx-1, ly+2n-1) ... r[2n-1] =
    (lx-1, ly), r[2n] = corner, r[2n+1+j] = top (lx+j, ly-1).
    local: [A, S, S] current component's local buffer (S = 32 or 16).
    top_strip/left_strip: [A, 2S+1] rows/cols just outside the CTU,
    index 0 = corner position (x0-1 / y0-1).
    Built from 3 strided slices (lx/ly/n are static); positions that are
    never available (below the CTU / right of the CTU for inner rows)
    take a zero placeholder the substitution ignores."""
    a, s, _ = local.shape

    def zeros(k):
        return jnp.zeros((a, k), local.dtype)

    # left column, bottom to top: (lx-1, ly+2n-1) .. (lx-1, ly)
    if lx >= 1:
        in_rows = min(2 * n, s - ly)
        seg = local[:, ly:ly + in_rows, lx - 1]
        left_part = seg[:, ::-1]
        if in_rows < 2 * n:
            left_part = jnp.concatenate([zeros(2 * n - in_rows),
                                         left_part], axis=1)
    else:
        left_part = left_strip[:, 1 + ly:1 + ly + 2 * n][:, ::-1]
    # corner (lx-1, ly-1)
    if lx >= 1 and ly >= 1:
        corner = local[:, ly - 1, lx - 1][:, None]
    elif ly >= 1:
        corner = left_strip[:, ly:ly + 1]
    elif lx >= 1:
        corner = top_strip[:, lx:lx + 1]
    else:
        corner = top_strip[:, 0:1]
    # top row, left to right: (lx, ly-1) .. (lx+2n-1, ly-1)
    if ly >= 1:
        in_cols = min(2 * n, s - lx)
        top_part = local[:, ly - 1, lx:lx + in_cols]
        if in_cols < 2 * n:
            top_part = jnp.concatenate([top_part,
                                        zeros(2 * n - in_cols)], axis=1)
    else:
        top_part = top_strip[:, lx + 1:lx + 1 + 2 * n]
    return jnp.concatenate([left_part, corner, top_part], axis=1)


def _avail_mask(x0, y0, lx, ly, n, sub, coded_w, coded_h, nctux,
                tile_bounds_x, tile_bounds_y):
    """Availability of each ref sample (decoding-order rule, spec 6.4.1).

    x0/y0: [A] CTU LUMA origins; lx/ly/n static LOCAL coords in the
    component's sample units; sub = 1 for chroma (4:2:0), 0 for luma.
    coded_w/h: LUMA coded dims. Returns bool [A, 4n+1]."""
    # positions in component units, then scale to luma for order checks
    offs_x, offs_y = [], []
    for j in range(2 * n - 1, -1, -1):
        offs_x.append(lx - 1)
        offs_y.append(ly + j)
    offs_x.append(lx - 1)
    offs_y.append(ly - 1)
    for j in range(2 * n):
        offs_x.append(lx + j)
        offs_y.append(ly - 1)
    ox = np.asarray(offs_x, np.int32) << sub   # luma units
    oy = np.asarray(offs_y, np.int32) << sub
    px = x0[:, None] + ox[None, :]             # [A, L] luma coords
    py = y0[:, None] + oy[None, :]
    in_pic = (px >= 0) & (py >= 0) & (px < coded_w) & (py < coded_h)
    # decoding order: tile-major CTU raster, z-order within CTU. Within a
    # tile, global raster preserves the order; cross-tile reads are simply
    # unavailable (intra never crosses tiles).
    pa, pb = px >> 3, py >> 3                  # granule coords
    cx_l = (x0 + (np.int32(lx) << sub))        # current block luma coords
    cy_l = (y0 + (np.int32(ly) << sub))
    ca, cb = cx_l >> 3, cy_l >> 3
    ctu_p = (pb >> 2) * nctux + (pa >> 2)
    ctu_c = ((cb >> 2) * nctux + (ca >> 2))[:, None]
    z_p = _z_of(pa & 3, pb & 3)
    z_c = _z_of(ca & 3, cb & 3)[:, None]
    earlier = (ctu_p < ctu_c) | ((ctu_p == ctu_c) & (z_p < z_c))
    ok = in_pic & earlier
    if tile_bounds_x:
        ok = ok & (_tile_idx(px, tile_bounds_x)
                   == _tile_idx(cx_l, tile_bounds_x)[:, None])
    if tile_bounds_y:
        ok = ok & (_tile_idx(py, tile_bounds_y)
                   == _tile_idx(cy_l, tile_bounds_y)[:, None])
    return ok


def _substitute(refs: jnp.ndarray, avail: jnp.ndarray, bit_depth: int):
    """Spec 8.4.4.2.2 reference substitution, vectorized.

    refs/avail: [A, L]. Unavailable samples take the previous (lower-index)
    available value; leading unavailables take the first available; all
    unavailable -> 1 << (bit_depth - 1)."""
    a, L = refs.shape
    idx = jnp.where(avail, jnp.arange(L)[None, :], -1)
    ff = jax.lax.associative_scan(jnp.maximum, idx, axis=1)  # cummax
    first = jnp.argmax(avail, axis=1)                        # first True
    take = jnp.where(ff >= 0, ff, first[:, None])
    out = jnp.take_along_axis(refs, take, axis=1)
    none_avail = ~jnp.any(avail, axis=1)
    return jnp.where(none_avail[:, None], 1 << (bit_depth - 1), out)


# ---------------------------------------------------------------------------
# Sign-data hiding (device twin of spec.residual.sdh_adjust)
# ---------------------------------------------------------------------------

def _scan_perms(lg: int):
    """[3, n*n] flat scan permutations (diag/hor/ver)."""
    n = 1 << lg
    perms = []
    for si in range(3):
        sc = get_scan(lg, si)                 # [(x, y)] in scan order
        perms.append(sc[:, 1] * n + sc[:, 0])
    return np.asarray(perms, np.int32)


def _sdh_adjust_device(levels, coeffs, qp, lg, scan_sel, bit_depth):
    """Encoder-side SDH parity fix, batched (twin of spec sdh_adjust).

    levels/coeffs: [A, n, n] int32; scan_sel: [A] in {0 diag,1 hor,2 ver};
    qp: scalar. The residue key a - (la << qbits) is computed overflow-free
    as ((a >> qbits) - la) << qbits | (a & (2^qbits - 1)) — exact because
    levels come straight from the quantizer, so |residue| < 2^(qbits+1).
    """
    from ..spec.tables import QUANT_SCALES

    a_n, n = levels.shape[0], levels.shape[-1]
    nn = n * n
    perms = jnp.asarray(_scan_perms(lg))       # [3, nn]
    perm = perms[scan_sel]                     # [A, nn]
    lv = jnp.take_along_axis(levels.reshape(a_n, nn), perm, axis=1)
    cf = jnp.take_along_axis(coeffs.reshape(a_n, nn), perm, axis=1)
    qbits = 14 + qp // 6 + (15 - bit_depth - lg)
    scale = jnp.asarray(QUANT_SCALES, jnp.int32)[qp % 6]

    g = nn // 16
    lvg = lv.reshape(a_n, g, 16)
    cfg = cf.reshape(a_n, g, 16)
    nzm = lvg != 0
    any_nz = jnp.any(nzm, axis=-1)
    pos = jnp.arange(16)
    first = jnp.argmax(nzm, axis=-1)
    last = 15 - jnp.argmax(nzm[..., ::-1], axis=-1)
    lv_first = jnp.take_along_axis(lvg, first[..., None], axis=-1)[..., 0]
    want = (lv_first < 0).astype(jnp.int32)
    parity = jnp.sum(jnp.abs(lvg), axis=-1) & 1
    need = any_nz & ((last - first) > 3) & (parity != want)

    la = jnp.abs(lvg)
    aa = jnp.abs(cfg) * scale                  # < 2^31
    mask_q = (1 << qbits) - 1
    r = (((aa >> qbits) - la) << qbits) + (aa & mask_q)
    big = jnp.int32(-(2 ** 31) + 1)
    r = jnp.where(la >= 32767, big, r)
    in_span = (pos[None, None, :] >= first[..., None]) & \
              (pos[None, None, :] <= last[..., None])
    r = jnp.where(in_span, r, big)
    k = jnp.argmax(r, axis=-1)                 # [A, g]
    sel = pos[None, None, :] == k[..., None]
    cur = jnp.take_along_axis(lvg, k[..., None], axis=-1)[..., 0]
    cf_k = jnp.take_along_axis(cfg, k[..., None], axis=-1)[..., 0]
    bump = jnp.where(cur > 0, cur + 1,
                     jnp.where(cur < 0, cur - 1,
                               jnp.where(cf_k < 0, -1, 1)))
    lvg = jnp.where(need[..., None] & sel, bump[..., None], lvg)
    lv = lvg.reshape(a_n, nn)
    # scatter back through the inverse permutation
    inv = jnp.zeros_like(perm).at[
        jnp.arange(a_n)[:, None], perm].set(
        jnp.broadcast_to(jnp.arange(nn)[None, :], (a_n, nn)))
    out = jnp.take_along_axis(lv, inv, axis=1)
    return out.reshape(a_n, n, n)


def _scan_sel(lg: int, c_idx: int, modes: jnp.ndarray) -> jnp.ndarray:
    """Mode-dependent scan (spec.residual.intra_scan_idx, vectorized)."""
    if lg == 2 or (lg == 3 and c_idx == 0):
        ver = (modes >= 6) & (modes <= 14)
        hor = (modes >= 22) & (modes <= 30)
        return jnp.where(ver, 2, jnp.where(hor, 1, 0)).astype(jnp.int32)
    return jnp.zeros_like(modes)


# ---------------------------------------------------------------------------
# One CU commit (size n at a static local granule position)
# ---------------------------------------------------------------------------

def _tq_recon(pred, src, lg, qp, c_idx, modes, bit_depth, sdh):
    """Exact T/Q/SDH/IQ/IT + clip for a batch of blocks; returns
    (recon, levels)."""
    res = src - pred
    coeffs = fwd_transform(res, lg, bit_depth, False)
    levels = quantize(coeffs, qp, lg, bit_depth, True)
    if sdh:
        sel = _scan_sel(lg, c_idx, modes)
        levels = _sdh_adjust_device(levels, coeffs, qp, lg, sel, bit_depth)
    deq = dequantize(levels, qp, lg, bit_depth)
    rres = inv_transform(deq, lg, bit_depth, False)
    return jnp.clip(pred + rres, 0, (1 << bit_depth) - 1), levels


def _write_local(st, recon, levels, active, lx, ly, n):
    am = active[:, None, None]
    st["local"] = st["local"].at[:, ly:ly + n, lx:lx + n].set(
        jnp.where(am, recon, st["local"][:, ly:ly + n, lx:lx + n]))
    st["lv"] = st["lv"].at[:, ly:ly + n, lx:lx + n].set(
        jnp.where(am, levels.astype(jnp.int16),
                  st["lv"][:, ly:ly + n, lx:lx + n]))


def _commit_luma(state, lx, ly, n, modes, active, qp, x0, y0, meta):
    """Commit luma blocks of size n at local (lx, ly), masked."""
    coded_w, coded_h, nctux, tb_x, tb_y, bit_depth, sdh = meta
    st = state["y"]
    lg = n.bit_length() - 1
    refs = _gather_refs(st["local"], st["top"], st["left"], lx, ly, n, 0)
    avail = _avail_mask(x0, y0, lx, ly, n, 0, coded_w, coded_h, nctux,
                        tb_x, tb_y)
    refs = _substitute(refs, avail, bit_depth)
    L = 2 * n
    left_arr = refs[:, L::-1]
    top_arr = refs[:, L:]
    pred = predict_selected(top_arr, left_arr, lg, modes, True, bit_depth)
    src = st["src"][:, ly:ly + n, lx:lx + n]
    recon, levels = _tq_recon(pred, src, lg, qp, 0, modes, bit_depth, sdh)
    _write_local(st, recon, levels, active, lx, ly, n)
    return state


def _commit_chroma_pair(state, lx, ly, n, modes, active, qp_c, x0, y0,
                        meta):
    """Commit the cb AND cr blocks of size n at local chroma (lx, ly) in
    one fused batch [2A] (same geometry, same chroma QP — the encoder
    codes zero cb/cr QP offsets)."""
    coded_w, coded_h, nctux, tb_x, tb_y, bit_depth, sdh = meta
    scb, scr = state["cb"], state["cr"]
    lg = n.bit_length() - 1
    local2 = jnp.concatenate([scb["local"], scr["local"]])
    top2 = jnp.concatenate([scb["top"], scr["top"]])
    left2 = jnp.concatenate([scb["left"], scr["left"]])
    src2 = jnp.concatenate([scb["src"], scr["src"]])
    modes2 = jnp.concatenate([modes, modes])
    refs = _gather_refs(local2, top2, left2, lx, ly, n, 0)
    avail = _avail_mask(x0, y0, lx, ly, n, 1, coded_w, coded_h, nctux,
                        tb_x, tb_y)
    avail = jnp.concatenate([avail, avail])
    refs = _substitute(refs, avail, bit_depth)
    L = 2 * n
    left_arr = refs[:, L::-1]
    top_arr = refs[:, L:]
    pred = predict_selected(top_arr, left_arr, lg, modes2, False,
                            bit_depth)
    src = src2[:, ly:ly + n, lx:lx + n]
    recon, levels = _tq_recon(pred, src, lg, qp_c, 1, modes2, bit_depth,
                              sdh)
    a = scb["local"].shape[0]
    _write_local(scb, recon[:a], levels[:a], active, lx, ly, n)
    _write_local(scr, recon[a:], levels[a:], active, lx, ly, n)
    return state


# ---------------------------------------------------------------------------
# The wavefront scan
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("coded_w", "coded_h", "bit_depth",
                                   "sdh", "tile_bounds_x", "tile_bounds_y"))
def wavefront_commit_intra(src_y, src_cb, src_cr, depth_map, mode_map,
                           qp_y, qp_cb, qp_cr, coded_w: int, coded_h: int,
                           bit_depth: int = 8, sdh: bool = True,
                           tile_bounds_x: tuple = (),
                           tile_bounds_y: tuple = ()):
    """Exact intra reconstruction of a whole frame on device.

    src_*: int32 source planes in CODED dims; depth_map/mode_map: int32
    [coded_h/8, coded_w/8]; qp_*: scalar int32 (dynamic).
    tile_bounds_*: static inner tile boundaries in luma samples.

    Returns (rec_y, rec_cb, rec_cr, lv_y, lv_cb, lv_cr) — recon int32 in
    coded dims (pre-loop-filter), levels int16 at plane positions.
    """
    nctux = -(-coded_w // CTU)
    nctuy = -(-coded_h // CTU)
    pw, ph = nctux * CTU, nctuy * CTU
    # recon planes carry a 1-sample top/left border (so the (y0-1, x0-1)
    # strip slices never clamp) and a CTU+1 right/bottom pad (top-right
    # strip overhang + scratch area for invalid wave slots)
    pad_rb = CTU + 1

    def pad_plane(p, full_h, full_w):
        return jnp.pad(p.astype(jnp.int32),
                       ((0, full_h + pad_rb - p.shape[0]),
                        (0, full_w + pad_rb - p.shape[1])))

    rec_y = jnp.zeros((1 + ph + pad_rb, 1 + pw + pad_rb), jnp.int32)
    rec_cb = jnp.zeros((1 + ph // 2 + pad_rb, 1 + pw // 2 + pad_rb),
                       jnp.int32)
    rec_cr = jnp.zeros_like(rec_cb)
    lv_y = jnp.zeros((ph + pad_rb, pw + pad_rb), jnp.int16)
    lv_cb = jnp.zeros((ph // 2 + pad_rb, pw // 2 + pad_rb), jnp.int16)
    lv_cr = jnp.zeros_like(lv_cb)
    sy = pad_plane(src_y, ph, pw)
    scb = pad_plane(src_cb, ph // 2, pw // 2)
    scr = pad_plane(src_cr, ph // 2, pw // 2)
    dm = jnp.pad(depth_map.astype(jnp.int32),
                 ((0, ph // 8 - depth_map.shape[0]),
                  (0, pw // 8 - depth_map.shape[1])), constant_values=2)
    mm = jnp.pad(mode_map.astype(jnp.int32),
                 ((0, ph // 8 - mode_map.shape[0]),
                  (0, pw // 8 - mode_map.shape[1])))

    wx, wy, wvalid = wave_tables(nctux, nctuy)
    n_waves, a_max = wx.shape
    meta = (coded_w, coded_h, nctux, tile_bounds_x, tile_bounds_y,
            bit_depth, sdh)

    def slice_block(plane, ys, xs, h, wdt):
        return jax.vmap(
            lambda yy, xx: jax.lax.dynamic_slice(plane, (yy, xx),
                                                 (h, wdt)))(ys, xs)

    def wave_body(carry, inputs):
        rec_y, rec_cb, rec_cr, lv_y, lv_cb, lv_cr = carry
        cx, cy, valid = inputs                       # [A] each
        x0, y0 = cx * CTU, cy * CTU
        x0c, y0c = x0 // 2, y0 // 2
        # strips: recon planes have a (1,1) origin offset, so slicing at
        # (y0, x0) reads the true (y0-1, x0-1) row/column — top row
        # (y0-1, x0-1 .. x0+2*CTU-1) and left col (y0-1 .. y0+2*CTU-1)
        top_y = slice_block(rec_y, y0, x0, 1, 2 * CTU + 1)[:, 0]
        left_y = slice_block(rec_y, y0, x0, 2 * CTU + 1, 1)[..., 0]
        top_cb = slice_block(rec_cb, y0c, x0c, 1, CTU + 1)[:, 0]
        left_cb = slice_block(rec_cb, y0c, x0c, CTU + 1, 1)[..., 0]
        top_cr = slice_block(rec_cr, y0c, x0c, 1, CTU + 1)[:, 0]
        left_cr = slice_block(rec_cr, y0c, x0c, CTU + 1, 1)[..., 0]
        # (the y0==0 / x0==0 strips read the zero border — every sample
        # they would feed is unavailable by the in-picture rule anyway)
        state = {
            "y": dict(local=jnp.zeros((a_max, CTU, CTU), jnp.int32),
                      src=slice_block(sy, y0, x0, CTU, CTU),
                      top=top_y, left=left_y,
                      lv=jnp.zeros((a_max, CTU, CTU), jnp.int16)),
            "cb": dict(local=jnp.zeros((a_max, CTU // 2, CTU // 2),
                                       jnp.int32),
                       src=slice_block(scb, y0c, x0c, CTU // 2, CTU // 2),
                       top=top_cb, left=left_cb,
                       lv=jnp.zeros((a_max, CTU // 2, CTU // 2),
                                    jnp.int16)),
            "cr": dict(local=jnp.zeros((a_max, CTU // 2, CTU // 2),
                                       jnp.int32),
                       src=slice_block(scr, y0c, x0c, CTU // 2, CTU // 2),
                       top=top_cr, left=left_cr,
                       lv=jnp.zeros((a_max, CTU // 2, CTU // 2),
                                    jnp.int16)),
        }
        dloc = slice_block(dm, cy * NG, cx * NG, NG, NG)   # [A, 4, 4]
        mloc = slice_block(mm, cy * NG, cx * NG, NG, NG)
        in_pic_g = jax.vmap(
            lambda xx, yy: ((xx * 8 + jnp.arange(NG)[None, :] * 8
                             < coded_w)
                            & (yy * 8 + jnp.arange(NG)[:, None] * 8
                               < coded_h)))(cx * NG, cy * NG)

        for g, (gx, gy) in enumerate(_ZXY):
            inside = in_pic_g[:, gy, gx] & valid
            modes = mloc[:, gy, gx]
            d = dloc[:, gy, gx]
            # --- 8x8 CU (luma 8 + chroma 4) ---
            act8 = inside & (d >= 2)
            state = _commit_luma(state, gx * 8, gy * 8, 8, modes, act8,
                                 qp_y, x0, y0, meta)
            state = _commit_chroma_pair(state, gx * 4, gy * 4, 4, modes,
                                        act8, qp_cb, x0, y0, meta)
            if g % 4 == 0:
                act16 = inside & (d == 1)
                state = _commit_luma(state, gx * 8, gy * 8, 16, modes,
                                     act16, qp_y, x0, y0, meta)
                state = _commit_chroma_pair(state, gx * 4, gy * 4, 8,
                                            modes, act16, qp_cb, x0, y0,
                                            meta)
            if g == 0:
                act32 = inside & (d == 0)
                state = _commit_luma(state, 0, 0, 32, modes, act32, qp_y,
                                     x0, y0, meta)
                state = _commit_chroma_pair(state, 0, 0, 16, modes, act32,
                                            qp_cb, x0, y0, meta)

        # invalid wave slots write into the right/bottom scratch pad
        x0w = jnp.where(valid, x0, pw)
        y0w = jnp.where(valid, y0, ph)
        x0cw, y0cw = x0w // 2, y0w // 2

        def scatter(plane, blocks, ys, xs, n):
            rows = ys[:, None] + jnp.arange(n)[None, :]   # [A, n]
            cols = xs[:, None] + jnp.arange(n)[None, :]
            return plane.at[rows[:, :, None], cols[:, None, :]].set(
                blocks.astype(plane.dtype))

        rec_y = scatter(rec_y, state["y"]["local"], y0w + 1, x0w + 1, CTU)
        rec_cb = scatter(rec_cb, state["cb"]["local"], y0cw + 1, x0cw + 1,
                         CTU // 2)
        rec_cr = scatter(rec_cr, state["cr"]["local"], y0cw + 1, x0cw + 1,
                         CTU // 2)
        lv_y = scatter(lv_y, state["y"]["lv"], y0w, x0w, CTU)
        lv_cb = scatter(lv_cb, state["cb"]["lv"], y0cw, x0cw, CTU // 2)
        lv_cr = scatter(lv_cr, state["cr"]["lv"], y0cw, x0cw, CTU // 2)
        return (rec_y, rec_cb, rec_cr, lv_y, lv_cb, lv_cr), None

    carry = (rec_y, rec_cb, rec_cr, lv_y, lv_cb, lv_cr)
    carry, _ = jax.lax.scan(
        wave_body, carry,
        (jnp.asarray(wx), jnp.asarray(wy), jnp.asarray(wvalid)))
    rec_y, rec_cb, rec_cr, lv_y, lv_cb, lv_cr = carry
    ch, cw = coded_h, coded_w
    return (rec_y[1:1 + ch, 1:1 + cw],
            rec_cb[1:1 + ch // 2, 1:1 + cw // 2],
            rec_cr[1:1 + ch // 2, 1:1 + cw // 2],
            lv_y[:ch, :cw], lv_cb[:ch // 2, :cw // 2],
            lv_cr[:ch // 2, :cw // 2])
