"""Wavefront intra commit on device (JAX, TPU) — exact reconstruction.

Reference parity: HM's recursive z-order reconstruct (TEncCu commit side,
SURVEY.md E6/§3.1) and this repo's C++ commit pass
(cabac_cpp/slice_engine.cpp commit_intra_cu), redesigned TPU-first:

  * CTUs are processed in anti-diagonal waves (wave = cx + 2*cy), so the
    left, top-left, top and top-right CTUs of every wave member are
    complete — all cross-CTU intra references are final.
  * Within a wave, each CTU runs 16 unrolled z-order granule steps on a
    LOCAL 32x32 buffer; inner references are static slices of that buffer.
  * Reference availability follows the DECODING order (tile-major CTU
    raster + z-order within CTU, spec 6.4.1) — computed arithmetically
    from coordinates, never from the schedule.

Performance architecture (measured on the target platform): inside a
lax.scan a scatter into a full plane costs ~3 ms and a gather/take ~60 us,
while elementwise ops, static slices, dynamic_update_slice and small MXU
matmuls are essentially free.  The wave body therefore contains NO
scatters and almost no gathers:

  * Per-wave recon/level blocks leave the loop through scan's stacked
    outputs (in-place by construction) and are reassembled into planes by
    ONE gather after the scan.
  * Cross-wave state is three compact boundary buffers per plane — the
    bottom row of the most recent CTU per CTU-column (row_buf), the right
    column of the most recent CTU per CTU-row (col_buf), and a
    two-row-parity ring of bottom-right corner pixels (corner_buf).  All
    reads and writes of these buffers are one-hot f32 matmuls with
    host-precomputed static selection tensors (exact: one-hot x <=10-bit
    samples stays far inside f32's 24-bit significand).
  * Reference availability AND the spec 8.4.4.2.2 substitution
    forward-fill depend only on static geometry, so both are precomputed
    on the host per (wave, z-step, size); substitution becomes a single
    take_along_axis from a reference vector extended with a constant
    half-range slot.
  * Intra prediction uses the one-hot-folded MXU form
    (ops.intra.predict_selected_mm); sign-data hiding uses permutation
    matmuls + one-hot reductions instead of dynamic takes/scatters.

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
from .intra import predict_selected_mm
from .rdoq import build_rdoq_tables, rdoq_scan
from .transform import (dequantize, fwd_transform, inv_transform,
                        quantize_mixed)

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
# Static host-side precomputation (numpy)
# ---------------------------------------------------------------------------

def _np_tile_idx(coord, bounds):
    t = np.zeros_like(coord)
    for b in bounds:
        t = t + (coord >= b).astype(coord.dtype)
    return t


def _np_avail(x0, y0, lx, ly, n, sub, coded_w, coded_h, nctux,
              tile_bounds_x, tile_bounds_y):
    """Numpy twin of the decoding-order availability rule (spec 6.4.1).

    x0/y0: [A] CTU luma origins (static). Returns bool [A, 4n+1]."""
    offs_x, offs_y = [], []
    for j in range(2 * n - 1, -1, -1):
        offs_x.append(lx - 1)
        offs_y.append(ly + j)
    offs_x.append(lx - 1)
    offs_y.append(ly - 1)
    for j in range(2 * n):
        offs_x.append(lx + j)
        offs_y.append(ly - 1)
    ox = np.asarray(offs_x, np.int64) << sub   # luma units
    oy = np.asarray(offs_y, np.int64) << sub
    px = x0[:, None].astype(np.int64) + ox[None, :]
    py = y0[:, None].astype(np.int64) + oy[None, :]
    in_pic = (px >= 0) & (py >= 0) & (px < coded_w) & (py < coded_h)
    pa, pb = px >> 3, py >> 3
    cx_l = (x0.astype(np.int64) + (lx << sub))
    cy_l = (y0.astype(np.int64) + (ly << sub))
    ca, cb = cx_l >> 3, cy_l >> 3
    ctu_p = (pb >> 2) * nctux + (pa >> 2)
    ctu_c = ((cb >> 2) * nctux + (ca >> 2))[:, None]
    z_p = _z_of(pa & 3, pb & 3)
    z_c = _z_of(ca & 3, cb & 3)[:, None]
    earlier = (ctu_p < ctu_c) | ((ctu_p == ctu_c) & (z_p < z_c))
    ok = in_pic & earlier
    if tile_bounds_x:
        ok = ok & (_np_tile_idx(px, tile_bounds_x)
                   == _np_tile_idx(cx_l, tile_bounds_x)[:, None])
    if tile_bounds_y:
        ok = ok & (_np_tile_idx(py, tile_bounds_y)
                   == _np_tile_idx(cy_l, tile_bounds_y)[:, None])
    return ok


def _np_sub_take(avail):
    """Substitution (spec 8.4.4.2.2) as static take indices.

    avail: bool [..., L]. Returns int [..., L] in [0, L]; index L selects
    the constant half-range slot appended to the reference vector."""
    L = avail.shape[-1]
    idx = np.where(avail, np.arange(L), -1)
    ff = np.maximum.accumulate(idx, axis=-1)
    first = np.argmax(avail, axis=-1)
    take = np.where(ff >= 0, ff, first[..., None])
    none = ~avail.any(axis=-1)
    return np.where(none[..., None], L, take).astype(np.int32)


# group schedule: mirrors the exact interleaved commit order of the C++
# engine's z-order recursion (8x8 at every z-step; 16x16 when the step
# enters a new 16-quadrant; 32x32 at step 0).  (kind, lx, ly, n)
def _group_schedule():
    groups = []
    for g, (gx, gy) in enumerate(_ZXY):
        groups.append(("l", gx * 8, gy * 8, 8, 2))    # d >= 2
        groups.append(("c", gx * 4, gy * 4, 4, 2))
        if g % 4 == 0:
            groups.append(("l", gx * 8, gy * 8, 16, 1))  # d == 1
            groups.append(("c", gx * 4, gy * 4, 8, 1))
        if g == 0:
            groups.append(("l", 0, 0, 32, 0))            # d == 0
            groups.append(("c", 0, 0, 16, 0))
    return groups


_GROUPS = _group_schedule()

_PRE_CACHE: dict = {}


def _precompute(nctux, nctuy, coded_w, coded_h, tbx, tby):
    """All static per-wave tensors (numpy), cached per geometry."""
    key = (nctux, nctuy, coded_w, coded_h, tbx, tby)
    if key in _PRE_CACHE:
        return _PRE_CACHE[key]
    wx, wy, wvalid = wave_tables(nctux, nctuy)
    n_waves, a_max = wx.shape
    x0 = wx * CTU
    y0 = wy * CTU

    # substitution take tables per group: dict idx -> [n_waves, A, L]
    takes = []
    for kind, lx, ly, n, _d in _GROUPS:
        sub = 0 if kind == "l" else 1
        t = np.zeros((n_waves, a_max, 4 * n + 1), np.int32)
        for w in range(n_waves):
            av = _np_avail(x0[w], y0[w], lx, ly, n, sub, coded_w, coded_h,
                           nctux, tbx, tby)
            t[w] = _np_sub_take(av)
        takes.append(t)

    # one-hot strip-read selectors (f32; zero rows where out of range
    # or slot invalid — those samples are unavailable anyway)
    def onehot(idx, size, ok):
        oh = np.zeros(idx.shape + (size,), np.float32)
        ii = np.clip(idx, 0, size - 1)
        np.put_along_axis(oh, ii[..., None], 1.0, axis=-1)
        oh[~ok] = 0.0
        return oh

    cxm1_ok = (wx - 1 >= 0) & wvalid
    cxp1_ok = (wx + 1 < nctux) & wvalid
    toh = np.stack([onehot(wx - 1, nctux, cxm1_ok),
                    onehot(wx, nctux, wvalid),
                    onehot(wx + 1, nctux, cxp1_ok)], axis=2)
    # [n_waves, A, 3, nctux]
    # col_buf is per CTU-ROW: read row cy (valid only when cx-1 exists)
    loh = onehot(wy, nctuy, cxm1_ok)
    coh = onehot(((wy - 1) & 1) * nctux + (wx - 1), 2 * nctux,
                 (wx - 1 >= 0) & (wy - 1 >= 0) & wvalid)
    # write-back one-hots (valid slots only)
    w_row = onehot(wx, nctux, wvalid)                     # [W, A, nctux]
    w_col = onehot(wy, nctuy, wvalid)
    w_cor = onehot((wy & 1) * nctux + wx, 2 * nctux, wvalid)
    keep_row = 1.0 - w_row.sum(axis=1)                    # [W, nctux]
    keep_col = 1.0 - w_col.sum(axis=1)
    keep_cor = 1.0 - w_cor.sum(axis=1)

    # reassembly: (cy, cx) -> flat block index w * A + a
    blk_idx = np.zeros((nctuy, nctux), np.int32)
    for w in range(n_waves):
        for a in range(a_max):
            if wvalid[w, a]:
                blk_idx[wy[w, a], wx[w, a]] = w * a_max + a

    pre = dict(wx=wx, wy=wy, wvalid=wvalid, n_waves=n_waves, a_max=a_max,
               takes=takes, toh=toh, loh=loh, coh=coh,
               w_row=w_row, w_col=w_col, w_cor=w_cor,
               keep_row=keep_row, keep_col=keep_col, keep_cor=keep_cor,
               blk_idx=blk_idx)
    _PRE_CACHE[key] = pre
    return pre


# ---------------------------------------------------------------------------
# Reference assembly from local buffer + strips
# ---------------------------------------------------------------------------

def _gather_refs(local, top_strip, left_strip, lx, ly, n):
    """Raw reference array r[0..4n] for a block at LOCAL (lx, ly), size n.

    Order: r[0] = bottom-most below-left (lx-1, ly+2n-1) ... r[2n-1] =
    (lx-1, ly), r[2n] = corner, r[2n+1+j] = top (lx+j, ly-1).
    local: [A, S, S]; top_strip/left_strip: [A, 2S+1], index 0 = the
    corner position (x0-1 / y0-1).  All slicing is static."""
    a, s, _ = local.shape

    def zeros(k):
        return jnp.zeros((a, k), local.dtype)

    if lx >= 1:
        in_rows = min(2 * n, s - ly)
        seg = local[:, ly:ly + in_rows, lx - 1]
        left_part = seg[:, ::-1]
        if in_rows < 2 * n:
            left_part = jnp.concatenate([zeros(2 * n - in_rows),
                                         left_part], axis=1)
    else:
        left_part = left_strip[:, 1 + ly:1 + ly + 2 * n][:, ::-1]
    if lx >= 1 and ly >= 1:
        corner = local[:, ly - 1, lx - 1][:, None]
    elif ly >= 1:
        corner = left_strip[:, ly:ly + 1]
    elif lx >= 1:
        corner = top_strip[:, lx:lx + 1]
    else:
        corner = top_strip[:, 0:1]
    if ly >= 1:
        in_cols = min(2 * n, s - lx)
        top_part = local[:, ly - 1, lx:lx + in_cols]
        if in_cols < 2 * n:
            top_part = jnp.concatenate([top_part,
                                        zeros(2 * n - in_cols)], axis=1)
    else:
        top_part = top_strip[:, lx + 1:lx + 1 + 2 * n]
    return jnp.concatenate([left_part, corner, top_part], axis=1)


# ---------------------------------------------------------------------------
# Sign-data hiding (device twin of spec.residual.sdh_adjust) — gather-free
# ---------------------------------------------------------------------------

def _scan_perm_mats(lg: int):
    """[n_scans, nn, nn] permutation matrices P with P[s, j, k] = 1 iff
    scan position j of scan s reads raster position k."""
    n = 1 << lg
    n_scans = 3 if (lg == 2 or lg == 3) else 1
    mats = np.zeros((n_scans, n * n, n * n), np.float32)
    for si in range(n_scans):
        sc = get_scan(lg, si)
        flat = sc[:, 1] * n + sc[:, 0]
        mats[si, np.arange(n * n), flat] = 1.0
    return mats


def _onehot_take(x, k):
    """x: [..., K], k: [...] int — x[..., k] via one-hot reduce (no
    gather)."""
    kk = x.shape[-1]
    oh = (jnp.arange(kk) == k[..., None])
    return jnp.sum(jnp.where(oh, x, 0), axis=-1)


def scan_permute(x, lg, scan_sel=None, inverse=False):
    """Raster <-> scan permutation via f32 matmuls with static matrices
    (exact: |values| <= 32767 < 2^24).  x: [A, nn] int32/float; scan_sel:
    [A] in {0 diag,1 hor,2 ver} (None/unused when the size has a single
    scan).  Shared by the RDOQ and SDH scan-domain passes so a commit
    with both pays ONE round trip."""
    P = _scan_perm_mats(lg)
    n_scans = P.shape[0]
    x_f = x.astype(jnp.float32)
    hi = jax.lax.Precision.HIGHEST
    if n_scans == 1:
        Pm = jnp.asarray(P[0])
        out = jnp.dot(x_f, Pm if inverse else Pm.T, precision=hi)
    else:
        oh = (jnp.arange(n_scans)[None, :]
              == scan_sel[:, None]).astype(jnp.float32)    # [A, S]
        Pc = jnp.asarray(P)                                # [S, nn, nn]
        eq = "bj,sjk,bs->bk" if inverse else "bk,sjk,bs->bj"
        out = jnp.einsum(eq, x_f, Pc, oh, precision=hi)
    return out.astype(jnp.int32)


def _sdh_adjust_device(levels, coeffs, qp, lg, scan_sel, bit_depth):
    """Encoder-side SDH parity fix, batched (twin of spec sdh_adjust).

    levels/coeffs: [A, n, n] int32; scan_sel: [A] in {0 diag,1 hor,2 ver};
    qp: scalar.  Permutations are f32 matmuls with static matrices (exact:
    |values| <= 32767 < 2^24); the per-group extremum picks use one-hot
    reductions — no take_along_axis/scatter anywhere."""
    a_n, n = levels.shape[0], levels.shape[-1]
    nn = n * n
    lv = scan_permute(levels.reshape(a_n, nn), lg, scan_sel)
    cf = scan_permute(coeffs.reshape(a_n, nn), lg, scan_sel)
    out = _sdh_adjust_scan(lv, cf, qp, lg, bit_depth)
    out = scan_permute(out, lg, scan_sel, inverse=True)
    return out.reshape(a_n, n, n)


def _sdh_adjust_scan(lv, cf, qp, lg, bit_depth):
    """SDH parity fix on SCAN-ORDERED [A, nn] levels/coeffs (int32).
    The residue key a - (la << qbits) is computed overflow-free as
    ((a >> qbits) - la) << qbits | (a & (2^qbits - 1))."""
    from ..spec.tables import QUANT_SCALES

    a_n, nn = lv.shape
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
    lv_first = _onehot_take(lvg, first)
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
    cur = _onehot_take(lvg, k)
    cf_k = _onehot_take(cfg, k)
    bump = jnp.where(cur > 0, cur + 1,
                     jnp.where(cur < 0, cur - 1,
                               jnp.where(cf_k < 0, -1, 1)))
    lvg = jnp.where(need[..., None] & sel, bump[..., None], lvg)
    return lvg.reshape(a_n, nn)


def _scan_oh(lg: int, sel: jnp.ndarray) -> jnp.ndarray:
    """[A, S] float one-hot of the scan select (S from the size)."""
    n_scans = _scan_perm_mats(lg).shape[0]
    return (jnp.arange(n_scans)[None, :] == sel[:, None]) \
        .astype(jnp.float32)


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

def _tq_recon(pred, src, lg, qp, c_idx, modes, bit_depth, sdh,
              intra_mask, rd=None):
    """Exact T/Q/SDH/IQ/IT + clip for a batch of blocks; returns
    (recon, levels).  intra_mask: [B] bool — selects the intra/inter
    dead-zone offset and forces the diagonal scan for inter blocks (SDH
    scan choice, spec residual semantics).  rd: the (c_idx, lg) entry of
    ops.rdoq.build_rdoq_tables — when given, levels come from the
    device-parallel RDOQ trellis instead of scalar quantization (SDH
    parity is still enforced afterwards: the decoder infers signs)."""
    res = src - pred
    coeffs = fwd_transform(res, lg, bit_depth, False)
    if sdh or rd is not None:
        sel = jnp.where(intra_mask, _scan_sel(lg, c_idx, modes), 0)
    if rd is not None:
        # one shared scan-domain round trip for RDOQ + SDH
        a_n, n = coeffs.shape[0], coeffs.shape[-1]
        nn = n * n
        cf_s = scan_permute(coeffs.reshape(a_n, nn), lg, sel)
        lv_s = rdoq_scan(cf_s, _scan_oh(lg, sel), rd, lg, c_idx)
        if sdh:
            lv_s = _sdh_adjust_scan(lv_s, cf_s, qp, lg, bit_depth)
        levels = scan_permute(lv_s, lg, sel,
                              inverse=True).reshape(a_n, n, n)
    else:
        levels = quantize_mixed(coeffs, qp, lg, bit_depth, intra_mask)
        if sdh:
            levels = _sdh_adjust_device(levels, coeffs, qp, lg, sel,
                                        bit_depth)
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


def _commit_luma(state, take, lx, ly, n, modes, active, qp, bit_depth,
                 sdh, inter=None, rd_tabs=None):
    st = state["y"]
    lg = n.bit_length() - 1
    refs = _gather_refs(st["local"], st["top"], st["left"], lx, ly, n)
    refs_ext = jnp.concatenate(
        [refs, jnp.full(refs.shape[:-1] + (1,), 1 << (bit_depth - 1),
                        refs.dtype)], axis=-1)
    refs = jnp.take_along_axis(refs_ext, take, axis=-1)
    L = 2 * n
    left_arr = refs[:, L::-1]
    top_arr = refs[:, L:]
    pred = predict_selected_mm(top_arr, left_arr, lg, modes, True,
                               bit_depth)
    if inter is None:
        intra_mask = jnp.ones(modes.shape, bool)
    else:
        intra_mask = ~inter
        pred = jnp.where(inter[:, None, None],
                         st["ipred"][:, ly:ly + n, lx:lx + n], pred)
    src = st["src"][:, ly:ly + n, lx:lx + n]
    rd = rd_tabs[(0, lg)] if rd_tabs is not None else None
    recon, levels = _tq_recon(pred, src, lg, qp, 0, modes, bit_depth, sdh,
                              intra_mask, rd=rd)
    _write_local(st, recon, levels, active, lx, ly, n)
    return state


def _commit_chroma_pair(state, take, lx, ly, n, modes, active, qp_c,
                        bit_depth, sdh, inter=None, rd_tabs=None):
    """Commit the cb AND cr blocks of size n at local chroma (lx, ly) in
    one fused batch [2A] (same geometry, same chroma QP)."""
    scb, scr = state["cb"], state["cr"]
    lg = n.bit_length() - 1
    local2 = jnp.concatenate([scb["local"], scr["local"]])
    top2 = jnp.concatenate([scb["top"], scr["top"]])
    left2 = jnp.concatenate([scb["left"], scr["left"]])
    src2 = jnp.concatenate([scb["src"], scr["src"]])
    modes2 = jnp.concatenate([modes, modes])
    refs = _gather_refs(local2, top2, left2, lx, ly, n)
    refs_ext = jnp.concatenate(
        [refs, jnp.full(refs.shape[:-1] + (1,), 1 << (bit_depth - 1),
                        refs.dtype)], axis=-1)
    take2 = jnp.concatenate([take, take])
    refs = jnp.take_along_axis(refs_ext, take2, axis=-1)
    L = 2 * n
    left_arr = refs[:, L::-1]
    top_arr = refs[:, L:]
    pred = predict_selected_mm(top_arr, left_arr, lg, modes2, False,
                               bit_depth)
    if inter is None:
        intra_mask2 = jnp.ones(modes2.shape, bool)
    else:
        inter2 = jnp.concatenate([inter, inter])
        intra_mask2 = ~inter2
        ipred2 = jnp.concatenate([scb["ipred"], scr["ipred"]])
        pred = jnp.where(inter2[:, None, None],
                         ipred2[:, ly:ly + n, lx:lx + n], pred)
    src = src2[:, ly:ly + n, lx:lx + n]
    rd = rd_tabs[(1, lg)] if rd_tabs is not None else None
    recon, levels = _tq_recon(pred, src, lg, qp_c, 1, modes2, bit_depth,
                              sdh, intra_mask2, rd=rd)
    a = scb["local"].shape[0]
    _write_local(scb, recon[:a], levels[:a], active, lx, ly, n)
    _write_local(scr, recon[a:], levels[a:], active, lx, ly, n)
    return state


# ---------------------------------------------------------------------------
# The wavefront scan
# ---------------------------------------------------------------------------

_HI = jax.lax.Precision.HIGHEST  # one-hot matmuls must be f32-exact
# (default TPU matmul precision is bf16-mantissa; samples/levels exceed
# 8 bits, so every exactness-bearing einsum here pins HIGHEST)


def _oh_mm(oh, buf):
    """One-hot f32 'gather': oh [..., K] x buf [K, W] -> [..., W] int32."""
    out = jnp.einsum("...k,kw->...w", oh, buf.astype(jnp.float32),
                     precision=_HI)
    return out.astype(jnp.int32)


@partial(jax.jit, static_argnames=("coded_w", "coded_h", "bit_depth",
                                   "sdh", "tile_bounds_x", "tile_bounds_y",
                                   "rdoq"))
def wavefront_commit_intra(src_y, src_cb, src_cr, depth_map, mode_map,
                           qp_y, qp_cb, qp_cr, coded_w: int, coded_h: int,
                           bit_depth: int = 8, sdh: bool = True,
                           tile_bounds_x: tuple = (),
                           tile_bounds_y: tuple = (),
                           rdoq: bool = False, lam=0.0):
    """Exact intra reconstruction of a whole frame on device.

    src_*: int32 source planes in CODED dims; depth_map/mode_map: int32
    [coded_h/8, coded_w/8]; qp_*: scalar int32 (dynamic).
    tile_bounds_*: static inner tile boundaries in luma samples.

    Returns (rec_y, rec_cb, rec_cr, lv_y, lv_cb, lv_cr) — recon int32 in
    coded dims (pre-loop-filter), levels int16 at plane positions.
    """
    return _wavefront_commit_impl(src_y, src_cb, src_cr, depth_map,
                                  mode_map, None, None, None, None,
                                  qp_y, qp_cb, qp_cr, coded_w, coded_h,
                                  bit_depth, sdh, tile_bounds_x,
                                  tile_bounds_y, rdoq, lam, 0)


@partial(jax.jit, static_argnames=("coded_w", "coded_h", "bit_depth",
                                   "sdh", "tile_bounds_x", "tile_bounds_y",
                                   "rdoq"))
def wavefront_commit_mixed(src_y, src_cb, src_cr, depth_map, mode_map,
                           dir_map, pred_y, pred_cb, pred_cr,
                           qp_y, qp_cb, qp_cr, coded_w: int, coded_h: int,
                           bit_depth: int = 8, sdh: bool = True,
                           tile_bounds_x: tuple = (),
                           tile_bounds_y: tuple = (),
                           rdoq: bool = False, lam=0.0):
    """Mixed intra/inter exact reconstruction of a P/B frame on device.

    dir_map: int32 [coded_h/8, coded_w/8], 0 = intra CU, 1/2/3 = L0/L1/BI;
    pred_*: int32 MC prediction planes from ops.me.inter_pred_planes
    (coded dims). Inter blocks take their prediction from pred_* and the
    inter dead-zone quantizer offset; intra blocks run the wavefront
    reference path — which may (correctly) read reconstructed inter
    neighbors, since every earlier-decode-order granule is committed
    before it is referenced (intra in inter slices, spec 8.4.4.2.1)."""
    return _wavefront_commit_impl(src_y, src_cb, src_cr, depth_map,
                                  mode_map, dir_map, pred_y, pred_cb,
                                  pred_cr, qp_y, qp_cb, qp_cr, coded_w,
                                  coded_h, bit_depth, sdh, tile_bounds_x,
                                  tile_bounds_y, rdoq, lam, 1)


def _wavefront_commit_impl(src_y, src_cb, src_cr, depth_map, mode_map,
                           dir_map, pred_y, pred_cb, pred_cr,
                           qp_y, qp_cb, qp_cr, coded_w: int, coded_h: int,
                           bit_depth: int, sdh: bool,
                           tile_bounds_x: tuple, tile_bounds_y: tuple,
                           rdoq: bool = False, lam=0.0,
                           init_type: int = 0):
    # RDOQ rate tables: built once per dispatch from the dynamic slice QP
    # (qp_y) and lambda; the wave body then runs gather-free.
    rd_tabs = (build_rdoq_tables(qp_y, qp_y, qp_cb, lam, init_type,
                                 bit_depth) if rdoq else None)
    nctux = -(-coded_w // CTU)
    nctuy = -(-coded_h // CTU)
    pw, ph = nctux * CTU, nctuy * CTU
    pre = _precompute(nctux, nctuy, coded_w, coded_h, tile_bounds_x,
                      tile_bounds_y)
    a_max = pre["a_max"]
    H = CTU // 2

    def pad_to(p, full_h, full_w):
        return jnp.pad(p.astype(jnp.int32),
                       ((0, full_h - p.shape[0]),
                        (0, full_w - p.shape[1])))

    sy = pad_to(src_y, ph, pw)
    scb = pad_to(src_cb, ph // 2, pw // 2)
    scr = pad_to(src_cr, ph // 2, pw // 2)
    dm = jnp.pad(depth_map.astype(jnp.int32),
                 ((0, ph // 8 - depth_map.shape[0]),
                  (0, pw // 8 - depth_map.shape[1])), constant_values=2)
    mm = jnp.pad(mode_map.astype(jnp.int32),
                 ((0, ph // 8 - mode_map.shape[0]),
                  (0, pw // 8 - mode_map.shape[1])))
    has_inter = dir_map is not None
    if has_inter:
        im = jnp.pad(dir_map.astype(jnp.int32),
                     ((0, ph // 8 - dir_map.shape[0]),
                      (0, pw // 8 - dir_map.shape[1])))
        ipy = pad_to(pred_y, ph, pw)
        ipcb = pad_to(pred_cb, ph // 2, pw // 2)
        ipcr = pad_to(pred_cr, ph // 2, pw // 2)

    xs = dict(
        toh=jnp.asarray(pre["toh"]), loh=jnp.asarray(pre["loh"]),
        coh=jnp.asarray(pre["coh"]), w_row=jnp.asarray(pre["w_row"]),
        w_col=jnp.asarray(pre["w_col"]), w_cor=jnp.asarray(pre["w_cor"]),
        keep_row=jnp.asarray(pre["keep_row"]),
        keep_col=jnp.asarray(pre["keep_col"]),
        keep_cor=jnp.asarray(pre["keep_cor"]),
        cx=jnp.asarray(pre["wx"]), cy=jnp.asarray(pre["wy"]),
        valid=jnp.asarray(pre["wvalid"]),
        takes={str(i): jnp.asarray(t) for i, t in enumerate(pre["takes"])},
    )

    def boundary_bufs(width):
        return dict(row=jnp.zeros((nctux, width), jnp.int32),
                    col=jnp.zeros((nctuy, width), jnp.int32),
                    cor=jnp.zeros((2 * nctux,), jnp.int32))

    carry0 = dict(y=boundary_bufs(CTU), cb=boundary_bufs(H),
                  cr=boundary_bufs(H))

    def strips(bufs, oh_top, oh_col, oh_cor, width):
        """Assemble [A, 2*width+1] top and left strips from the compact
        boundary buffers via one-hot matmuls (corner-first layout).

        oh_top selects n_seg CTU columns whose row_buf segments tile
        x0 - (n_seg-2)*width .. x0 + 2*width - 1; the body slice keeps
        exactly x0 .. x0+2*width-1 (luma: 3 segments, chroma: 2 — a
        chroma CTU half-row is 16 wide so columns cx, cx+1 suffice)."""
        n_seg = oh_top.shape[1]
        segs = _oh_mm(oh_top, bufs["row"])         # [A, n_seg, width]
        flat = segs.reshape(segs.shape[0], n_seg * width)
        off = (n_seg - 2) * width
        body = flat[:, off:off + 2 * width]        # x0 .. x0+2w-1
        corner = jnp.einsum("ak,k->a", oh_cor,
                            bufs["cor"].astype(jnp.float32),
                            precision=_HI)
        corner = corner.astype(jnp.int32)[:, None]
        top = jnp.concatenate([corner, body], axis=1)
        colv = _oh_mm(oh_col, bufs["col"])         # [A, width]
        left = jnp.concatenate(
            [corner, colv,
             jnp.zeros((colv.shape[0], width), jnp.int32)], axis=1)
        return top, left

    def slice_block(plane, ys_, xs_, h, wdt):
        return jax.vmap(
            lambda yy, xx: jax.lax.dynamic_slice(plane, (yy, xx),
                                                 (h, wdt)))(ys_, xs_)

    def update_bufs(bufs, local, w_row, w_col, w_cor, keep_row, keep_col,
                    keep_cor, width):
        bottom = local[:, width - 1, :].astype(jnp.float32)   # [A, width]
        right = local[:, :, width - 1].astype(jnp.float32)
        corner = local[:, width - 1, width - 1].astype(jnp.float32)
        row = (jnp.einsum("ac,aw->cw", w_row, bottom, precision=_HI)
               + bufs["row"].astype(jnp.float32)
               * keep_row[:, None]).astype(jnp.int32)
        col = (jnp.einsum("ac,aw->cw", w_col, right, precision=_HI)
               + bufs["col"].astype(jnp.float32)
               * keep_col[:, None]).astype(jnp.int32)
        cor = (jnp.einsum("ac,a->c", w_cor, corner, precision=_HI)
               + bufs["cor"].astype(jnp.float32)
               * keep_cor).astype(jnp.int32)
        return dict(row=row, col=col, cor=cor)

    def wave_body(carry, x):
        cx, cy, valid = x["cx"], x["cy"], x["valid"]
        x0, y0 = cx * CTU, cy * CTU
        x0c, y0c = x0 // 2, y0 // 2
        top_y, left_y = strips(carry["y"], x["toh"], x["loh"], x["coh"],
                               CTU)
        top_cb, left_cb = strips(carry["cb"], x["toh"][:, 1:3], x["loh"],
                                 x["coh"], H)
        top_cr, left_cr = strips(carry["cr"], x["toh"][:, 1:3], x["loh"],
                                 x["coh"], H)
        # chroma top strips must start at x0c: luma 'toh' rows select CTU
        # columns (cx-1, cx, cx+1); chroma body spans columns (cx, cx+1)
        # -> slice [1:3] above, body starts at offset 0 of that pair
        state = {
            "y": dict(local=jnp.zeros((a_max, CTU, CTU), jnp.int32),
                      src=slice_block(sy, y0, x0, CTU, CTU),
                      top=top_y, left=left_y,
                      lv=jnp.zeros((a_max, CTU, CTU), jnp.int16)),
            "cb": dict(local=jnp.zeros((a_max, H, H), jnp.int32),
                       src=slice_block(scb, y0c, x0c, H, H),
                       top=top_cb, left=left_cb,
                       lv=jnp.zeros((a_max, H, H), jnp.int16)),
            "cr": dict(local=jnp.zeros((a_max, H, H), jnp.int32),
                       src=slice_block(scr, y0c, x0c, H, H),
                       top=top_cr, left=left_cr,
                       lv=jnp.zeros((a_max, H, H), jnp.int16)),
        }
        if has_inter:
            state["y"]["ipred"] = slice_block(ipy, y0, x0, CTU, CTU)
            state["cb"]["ipred"] = slice_block(ipcb, y0c, x0c, H, H)
            state["cr"]["ipred"] = slice_block(ipcr, y0c, x0c, H, H)
        dloc = slice_block(dm, cy * NG, cx * NG, NG, NG)   # [A, 4, 4]
        mloc = slice_block(mm, cy * NG, cx * NG, NG, NG)
        iloc = (slice_block(im, cy * NG, cx * NG, NG, NG) if has_inter
                else None)
        in_pic_g = jax.vmap(
            lambda xx, yy: ((xx * 8 + jnp.arange(NG)[None, :] * 8
                             < coded_w)
                            & (yy * 8 + jnp.arange(NG)[:, None] * 8
                               < coded_h)))(cx * NG, cy * NG)

        for gi, (kind, lx, ly, n, dcond) in enumerate(_GROUPS):
            gx, gy = (lx // 8, ly // 8) if kind == "l" else (lx // 4,
                                                             ly // 4)
            inside = in_pic_g[:, gy, gx] & valid
            modes = mloc[:, gy, gx]
            d = dloc[:, gy, gx]
            act = inside & ((d >= 2) if dcond == 2 else (d == dcond))
            inter_g = (iloc[:, gy, gx] > 0) if has_inter else None
            take = x["takes"][str(gi)]
            if kind == "l":
                state = _commit_luma(state, take, lx, ly, n, modes, act,
                                     qp_y, bit_depth, sdh, inter=inter_g,
                                     rd_tabs=rd_tabs)
            else:
                state = _commit_chroma_pair(state, take, lx, ly, n,
                                            modes, act, qp_cb, bit_depth,
                                            sdh, inter=inter_g,
                                            rd_tabs=rd_tabs)

        new_carry = dict(
            y=update_bufs(carry["y"], state["y"]["local"], x["w_row"],
                          x["w_col"], x["w_cor"], x["keep_row"],
                          x["keep_col"], x["keep_cor"], CTU),
            cb=update_bufs(carry["cb"], state["cb"]["local"], x["w_row"],
                           x["w_col"], x["w_cor"], x["keep_row"],
                           x["keep_col"], x["keep_cor"], H),
            cr=update_bufs(carry["cr"], state["cr"]["local"], x["w_row"],
                           x["w_col"], x["w_cor"], x["keep_row"],
                           x["keep_col"], x["keep_cor"], H),
        )
        ys_out = dict(
            rec_y=state["y"]["local"].astype(jnp.int16),
            rec_cb=state["cb"]["local"].astype(jnp.int16),
            rec_cr=state["cr"]["local"].astype(jnp.int16),
            lv_y=state["y"]["lv"], lv_cb=state["cb"]["lv"],
            lv_cr=state["cr"]["lv"])
        return new_carry, ys_out

    _, blocks = jax.lax.scan(wave_body, carry0, xs)

    blk_idx = jnp.asarray(pre["blk_idx"].reshape(-1))

    def assemble(b, s, out_dtype):
        flat = b.reshape(pre["n_waves"] * a_max, s, s)
        sel = flat[blk_idx].reshape(nctuy, nctux, s, s)
        return (sel.transpose(0, 2, 1, 3)
                .reshape(nctuy * s, nctux * s).astype(out_dtype))

    rec_y = assemble(blocks["rec_y"], CTU, jnp.int32)
    rec_cb = assemble(blocks["rec_cb"], H, jnp.int32)
    rec_cr = assemble(blocks["rec_cr"], H, jnp.int32)
    lv_y = assemble(blocks["lv_y"], CTU, jnp.int16)
    lv_cb = assemble(blocks["lv_cb"], H, jnp.int16)
    lv_cr = assemble(blocks["lv_cr"], H, jnp.int16)
    ch, cw = coded_h, coded_w
    return (rec_y[:ch, :cw], rec_cb[:ch // 2, :cw // 2],
            rec_cr[:ch // 2, :cw // 2],
            lv_y[:ch, :cw], lv_cb[:ch // 2, :cw // 2],
            lv_cr[:ch // 2, :cw // 2])
