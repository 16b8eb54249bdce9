"""Batched motion estimation (JAX, TPU).

Reference parity: HM TEncSearch::xTZSearch + xPatternSearchFracDIF
(SURVEY.md E7, hot loop #2) — redesigned TPU-first. Instead of the
reference's sequential zonal search per block, the whole frame is searched
at once in three dense stages:

  1. integer search — small ranges: one jitted scan evaluates every offset
     for EVERY block simultaneously (dense abs-diff + block reductions on
     the VPU); large ranges (SearchRange up to 64 is honored, no silent
     clamping): coarse full search on 4x-decimated planes followed by a
     +-3 px window refinement at full resolution via per-block window
     gathers whose candidate slices are static;
  2. sub-pel refinement — all 48 half/quarter-pel positions around the
     best integer MV are evaluated with the EXACT spec 8-tap interpolation
     (spec 8.5.4.2.2.1, same taps as spec/mc.py) applied to per-block
     windows, cost = SATD + lambda*mv-rate (HM's fractional search is the
     same SATD criterion);
  3. the winning prediction block is returned alongside the MV so the
     caller's RD stage (transform round-trip) runs on the true sub-pel
     residual, not an integer approximation.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..spec.mc import CHROMA_FILTERS, LUMA_FILTERS


def _sad_grid(src: jnp.ndarray, shifted: jnp.ndarray, gy: int, gx: int,
              block: int) -> jnp.ndarray:
    diff = jnp.abs(src - shifted)
    return (diff.reshape(gy, block, gx, block)
            .transpose(0, 2, 1, 3).sum(axis=(2, 3)))


def _full_search_int(src: jnp.ndarray, ref: jnp.ndarray, block: int,
                     search_range: int):
    """Exhaustive integer search; returns (sad [gy,gx], mv [gy,gx,2] in
    INTEGER pixels)."""
    h, w = src.shape
    gy, gx = h // block, w // block
    n_off = 2 * search_range + 1
    refp = jnp.pad(ref, search_range, mode="edge")

    def eval_row(carry, dy_idx):
        # one scan step per dy row; ALL dx candidates are static slices of
        # the row strip, evaluated as one batched SAD reduction — the scan
        # iteration count drops from n_off^2 to n_off (a scan step costs
        # ~230 us in fixed overhead on this platform, so the n_off^2 form
        # spent ~250 ms/frame in pure dispatch at SearchRange 64)
        best_sad, best_idx = carry
        strip = jax.lax.dynamic_slice(
            refp, (dy_idx, 0), (h, w + 2 * search_range))
        cands = jnp.stack([strip[:, k:k + w] for k in range(n_off)])
        diff = jnp.abs(src[None] - cands)
        sads = (diff.reshape(n_off, gy, block, gx, block)
                .sum(axis=(2, 4)))                     # [n_off, gy, gx]
        row_best = jnp.min(sads, axis=0)
        row_arg = jnp.argmin(sads, axis=0).astype(jnp.int32)
        row_idx = dy_idx * n_off + row_arg
        better = row_best < best_sad
        best_sad = jnp.where(better, row_best, best_sad)
        best_idx = jnp.where(better, row_idx, best_idx)
        return (best_sad, best_idx), None

    init = (jnp.full((gy, gx), 2 ** 31 - 1, jnp.int32),
            jnp.zeros((gy, gx), jnp.int32))
    (best_sad, best_idx), _ = jax.lax.scan(
        eval_row, init, jnp.arange(n_off, dtype=jnp.int32))
    mv = jnp.stack([best_idx % n_off - search_range,
                    best_idx // n_off - search_range], axis=-1)
    return best_sad, mv


@partial(jax.jit, static_argnames=("block", "search_range"))
def full_search(src: jnp.ndarray, ref: jnp.ndarray, block: int = 16,
                search_range: int = 8):
    """Exhaustive integer-pel search for every aligned block of the frame.

    src, ref: [H, W] int32 (same padded dims). Returns (best_sad [B],
    best_mv [B, 2] in quarter-pel units), blocks in raster order.
    """
    sad, mv = _full_search_int(src, ref, block, search_range)
    return sad.reshape(-1), (mv * 4).reshape(-1, 2)


def _block_origins(h: int, w: int, n: int):
    gy, gx = h // n, w // n
    oy = jnp.repeat(jnp.arange(gy, dtype=jnp.int32) * n, gx)
    ox = jnp.tile(jnp.arange(gx, dtype=jnp.int32) * n, gy)
    return oy, ox


_MAX_OVERHANG = 80  # >= SearchRange(64) + filter/window margin (8)


def _gather_windows(ref: jnp.ndarray, oy: jnp.ndarray, ox: jnp.ndarray,
                    win: int) -> jnp.ndarray:
    """Per-block [win, win] windows at (possibly out-of-frame) origins;
    edge clamping matches the spec's padded reference pictures.

    Implemented as an XLA PATCH gather (one [win, win] contiguous slice
    per start index) over an edge-padded plane — the naive 2-axis
    advanced-index form lowers to a fully general per-element gather,
    which measured ~14 ns/element on this TPU (~100 ms for the 8-block
    grid at 1080p) and dominated the whole motion search.  Origins must
    stay within +-_MAX_OVERHANG of the plane (true for any MV within the
    supported SearchRange 64 plus filter margins); beyond that the gather
    clips the window start (mode=clip) instead of replicating the edge.
    """
    p = _MAX_OVERHANG
    refp = jnp.pad(ref, p, mode="edge")
    starts = jnp.stack([oy + p, ox + p], axis=-1)       # [B, 2]
    return jax.lax.gather(
        refp, starts,
        jax.lax.GatherDimensionNumbers(offset_dims=(1, 2),
                                       collapsed_slice_dims=(),
                                       start_index_map=(0, 1)),
        slice_sizes=(win, win),
        mode=jax.lax.GatherScatterMode.CLIP)


def _downsample4(plane: jnp.ndarray) -> jnp.ndarray:
    h, w = plane.shape
    return (plane.reshape(h // 4, 4, w // 4, 4).sum(axis=(1, 3)) + 8) // 16


# ---------------------------------------------------------------------------
# Shared-window motion-estimation state
#
# A patch gather on this TPU costs ~2.2 us per START INDEX with a ~20 ms
# floor, independent of patch size and dtype (measured) — so per-8-block
# window gathers (32k starts at 1080p) cost ~70 ms EACH and dominated the
# whole search.  The v2 design gathers reference windows ONCE per
# (ref, tier) at 16/32-block granularity — two gather ops total per
# search, stacked across refs — and serves every downstream consumer
# (integer refine, sub-pel refinement, merge-candidate MC, exact-BI MC)
# from those windows via static slices and one-hot MXU selects.
# ---------------------------------------------------------------------------

_TIER_W = {16: 30, 32: 46, 64: 78}  # tier win = n + 2*3 (refine) + 8 (subpel)
_HI = jax.lax.Precision.HIGHEST


def _blocks_of(plane: jnp.ndarray, n: int) -> jnp.ndarray:
    h, w = plane.shape
    return (plane.reshape(h // n, n, w // n, n)
            .transpose(0, 2, 1, 3).reshape(-1, n, n))


def _patch_gather(refp: jnp.ndarray, sy: jnp.ndarray, sx: jnp.ndarray,
                  win: int) -> jnp.ndarray:
    starts = jnp.stack([sy, sx], axis=-1)
    return jax.lax.gather(
        refp, starts,
        jax.lax.GatherDimensionNumbers(offset_dims=(1, 2),
                                       collapsed_slice_dims=(),
                                       start_index_map=(0, 1)),
        slice_sizes=(win, win),
        mode=jax.lax.GatherScatterMode.CLIP)


def _select_window(G: jnp.ndarray, rs: jnp.ndarray, cs: jnp.ndarray,
                   rows: int, cols: int) -> jnp.ndarray:
    """[rows, cols] sub-window of each G[b] at per-block (rs, cs) via
    one-hot f32 einsums (exact: one-hot x <=10-bit samples; HIGHEST pins
    the f32 path — default TPU matmul truncates to bf16 mantissas)."""
    Wg = G.shape[-1]
    rs = jnp.clip(rs, 0, Wg - rows)
    cs = jnp.clip(cs, 0, Wg - cols)
    roh = jax.nn.one_hot(rs[:, None] + jnp.arange(rows), Wg,
                         dtype=jnp.float32)              # [B, rows, Wg]
    coh = jax.nn.one_hot(cs[:, None] + jnp.arange(cols), Wg,
                         dtype=jnp.float32)              # [B, cols, Wg]
    t = jnp.einsum("bri,bij->brj", roh, G.astype(jnp.float32),
                   precision=_HI)
    return jnp.einsum("brj,bcj->brc", t, coh,
                      precision=_HI).astype(jnp.int32)


class MEState:
    """Shared ME state for one source frame against R reference planes."""

    def __init__(self, y_plane, ref_planes, search_range):
        self.h, self.w = y_plane.shape
        self.R = len(ref_planes)
        self.sr = search_range
        self.y = y_plane
        self.base = {}    # {tier: [R, Bt, 2] int pel (x, y)}
        self.G = {}       # {tier: [R, Bt, Wt, Wt] int32 windows}
        self.mv_int = {}  # {n: [R, Bn, 2] int pel, refined}

    def child_expand(self, tier_vals):
        """[R, B16, ...] -> [R, B8, ...] by replicating each 16-parent to
        its 4 raster-order 8-children."""
        R = tier_vals.shape[0]
        gy, gx = self.h // 16, self.w // 16
        v = tier_vals.reshape((R, gy, gx) + tier_vals.shape[2:])
        v = jnp.repeat(jnp.repeat(v, 2, axis=1), 2, axis=2)
        return v.reshape((R, 4 * gy * gx) + tier_vals.shape[2:])


def _interleave_children(vals, R, gy16, gx16):
    """vals[(cy, cx)] each [R, B16, ...] -> [R, B8, ...] raster order."""
    def g(v):
        return v.reshape((R, gy16, gx16) + v.shape[2:])
    row0 = jnp.stack([g(vals[(0, 0)]), g(vals[(0, 1)])], axis=3)
    row1 = jnp.stack([g(vals[(1, 0)]), g(vals[(1, 1)])], axis=3)
    both = jnp.stack([row0, row1], axis=2)   # [R, gy, 2, gx, 2, ...]
    tail = both.shape[5:]
    return both.reshape((R, 4 * gy16 * gx16) + tail)


def me_state(y_plane: jnp.ndarray, ref_planes, search_range: int,
             max_size: int = 32) -> MEState:
    """Coarse search + tier window gathers + integer refine for all refs.

    Populates st.mv_int[n] for n in (8, 16, .., max_size): per-ref integer
    MVs in [-sr, sr], and st.G windows centered on the tier bases that
    serve sub-pel refinement and merge-candidate MC without further
    gathers."""
    st = MEState(y_plane, ref_planes, search_range)
    h, w, R = st.h, st.w, st.R
    tiers = [n for n in (16, 32, 64) if n <= max_size]
    st.tiers = tiers

    # ---- coarse bases per tier
    if search_range <= 8:
        for n in tiers:
            mvs = [(_full_search_int(y_plane, ref, n, search_range)[1]
                    ).reshape(-1, 2) for ref in ref_planes]
            st.base[n] = jnp.stack(mvs)
    else:
        src4 = _downsample4(y_plane)
        sr4 = -(-search_range // 4)
        refs4 = [_downsample4(r) for r in ref_planes]
        for n in tiers:
            mvs = [(_full_search_int(src4, r4, n // 4, sr4)[1] * 4
                    ).reshape(-1, 2) for r4 in refs4]
            st.base[n] = jnp.stack(mvs)
    for n in tiers:
        st.base[n] = jnp.clip(st.base[n], -search_range, search_range)

    # ---- ONE stacked patch gather per tier (all refs)
    p = _MAX_OVERHANG
    hp = h + 2 * p
    refp = jnp.concatenate([jnp.pad(r, p, mode="edge")
                            for r in ref_planes])
    for n in tiers:
        Wg = _TIER_W[n]
        oy, ox = _block_origins(h, w, n)
        base = st.base[n]
        sy = (base[:, :, 1] + oy[None] - 7 + p
              + (jnp.arange(R, dtype=jnp.int32) * hp)[:, None])
        sx = base[:, :, 0] + ox[None] - 7 + p
        G = _patch_gather(refp, sy.reshape(-1), sx.reshape(-1), Wg)
        st.G[n] = G.reshape(R, -1, Wg, Wg)

    # ---- integer refine +-3 around the base (static window slices)
    for n in tiers:
        src_b = _blocks_of(y_plane, n)                   # [B, n, n]
        G = st.G[n]
        best_sad = jnp.full(G.shape[:2], 2 ** 31 - 1, jnp.int32)
        best_d = jnp.zeros(G.shape[:2] + (2,), jnp.int32)
        for dy in range(-3, 4):
            for dx in range(-3, 4):
                cand = G[:, :, 7 + dy:7 + dy + n, 7 + dx:7 + dx + n]
                sad = jnp.abs(src_b[None] - cand).sum(axis=(-2, -1))
                better = sad < best_sad
                best_sad = jnp.where(better, sad, best_sad)
                best_d = jnp.where(better[..., None],
                                   jnp.asarray([dx, dy], jnp.int32),
                                   best_d)
        st.mv_int[n] = jnp.clip(st.base[n] + best_d, -search_range,
                                search_range)

    # ---- 8-blocks: refine +-3 around the 16-parent base, inside G16
    gy16, gx16 = h // 16, w // 16
    src16 = _blocks_of(y_plane, 16)
    G16 = st.G[16]
    d8 = {}
    for cy in (0, 1):
        for cx in (0, 1):
            src8 = src16[:, 8 * cy:8 * cy + 8, 8 * cx:8 * cx + 8]
            best_sad = jnp.full(G16.shape[:2], 2 ** 31 - 1, jnp.int32)
            best_d = jnp.zeros(G16.shape[:2] + (2,), jnp.int32)
            for dy in range(-3, 4):
                for dx in range(-3, 4):
                    cand = G16[:, :, 8 * cy + 7 + dy:8 * cy + 7 + dy + 8,
                               8 * cx + 7 + dx:8 * cx + 7 + dx + 8]
                    sad = jnp.abs(src8[None] - cand).sum(axis=(-2, -1))
                    better = sad < best_sad
                    best_sad = jnp.where(better, sad, best_sad)
                    best_d = jnp.where(better[..., None],
                                       jnp.asarray([dx, dy], jnp.int32),
                                       best_d)
            d8[(cy, cx)] = best_d
    d8r = _interleave_children(d8, R, gy16, gx16)        # [R, B8, 2]
    base8 = st.child_expand(st.base[16])
    st.mv_int[8] = jnp.clip(base8 + d8r, -search_range, search_range)
    return st


def hier_int_search(y_plane: jnp.ndarray, ref_plane: jnp.ndarray,
                    log2_ctu: int, log2_min_cu: int, search_range: int):
    """Integer MVs for every block of every CU size, honoring search_range
    (compat wrapper over me_state). Returns {n: mv_int [B, 2]} (integer
    pixels)."""
    st = me_state(y_plane, [ref_plane], search_range,
                  max_size=1 << log2_ctu)
    return {n: st.mv_int[n][0] for n in st.mv_int}


def subpel_refine(y_plane: jnp.ndarray, ref_plane: jnp.ndarray,
                  mv_int: jnp.ndarray, n: int, lambda_sqrt,
                  from_satd_of_int=None):
    """Two-stage sub-pel refinement with exact spec interpolation (the HM
    xPatternSearchFracDIF shape: 8 half-pel points around the integer MV,
    then 8 quarter-pel points around the half-pel best — 17 SATD
    evaluations instead of a dense 49-point quarter grid).

    Stage 1 phases are static (0/2), so candidates are static slices of a
    shared horizontally-filtered buffer.  Stage 2 phases depend on the
    per-block stage-1 winner; filter taps are selected per block with a
    one-hot matmul and both possible window alignments are computed and
    masked (integer offset of a +-3 quarter total is -1 or 0).
    cost = SATD + lambda_sqrt * mv-rate-proxy.
    Returns (cost [B], mv_qpel [B, 2], pred [B, n, n])."""
    h, w = y_plane.shape
    oy, ox = _block_origins(h, w, n)
    src_blocks = _blocks_of(y_plane, n)
    win = _gather_windows(ref_plane, oy + mv_int[:, 1] - 4,
                          ox + mv_int[:, 0] - 4, n + 8)
    return _subpel_core(src_blocks, win, mv_int, n, lambda_sqrt)


def _subpel_core(src_blocks: jnp.ndarray, win: jnp.ndarray,
                 mv_int: jnp.ndarray, n: int, lambda_sqrt):
    """Two-stage sub-pel search given the per-block reference window
    win [B, n+8, n+8] whose origin is (block + mv_int - 4)."""
    from .cost import satd

    W = n + 8
    # horizontal stage for the static phases: all n+1 possibly-needed
    # columns (candidate slices below are static). int32 throughout:
    # worst-case |acc| < 88 * 64 * 255 * 8 << 2^31.
    taps = np.asarray(LUMA_FILTERS, np.int64)
    hf = {}
    for fx in (0, 2):
        acc = jnp.zeros((win.shape[0], W, n + 1), jnp.int32)
        for k in range(8):
            if taps[fx][k]:
                acc = acc + jnp.int32(taps[fx][k]) * win[:, :, k:k + n + 1]
        hf[fx] = acc

    def mv_rate(mvq):
        mag = jnp.abs(mvq[:, 0]) + jnp.abs(mvq[:, 1])
        return 4.0 + 2.0 * jnp.log2(1.0 + mag.astype(jnp.float32))

    best_cost = jnp.full((src_blocks.shape[0],), jnp.inf, jnp.float32)
    best_mv = mv_int * 4
    best_pred = jnp.zeros_like(src_blocks)

    def consider(cost, mvq, pred, state):
        best_cost, best_mv, best_pred = state
        better = cost < best_cost
        return (jnp.where(better, cost, best_cost),
                jnp.where(better[:, None], mvq, best_mv),
                jnp.where(better[:, None, None], pred, best_pred))

    state = (best_cost, best_mv, best_pred)
    for dy in (-2, 0, 2):
        for dx in (-2, 0, 2):
            fy, fx = dy & 3, dx & 3
            dj, di = dy >> 2, dx >> 2
            hsel = hf[fx][:, :, di + 1:di + 1 + n]       # [B, W, n]
            acc = jnp.zeros((src_blocks.shape[0], n, n), jnp.int32)
            for k in range(8):
                if taps[fy][k]:
                    acc = acc + jnp.int32(taps[fy][k]) * \
                        hsel[:, dj + 1 + k:dj + 1 + k + n, :]
            raw = acc >> 6                                # 14-bit interm.
            pred = jnp.clip((raw + 32) >> 6, 0, 255)
            mvq = mv_int * 4 + jnp.asarray([dx, dy], jnp.int32)
            cost = (satd(src_blocks - pred).astype(jnp.float32)
                    + lambda_sqrt * mv_rate(mvq))
            state = consider(cost, mvq, pred, state)

    # ---- stage 2: quarter-pel ring around the per-block stage-1 best
    tt = jnp.asarray(LUMA_FILTERS, jnp.float32)          # [4, 8]
    half_off = state[1] - mv_int * 4                     # [B, 2] in {-2,0,2}
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dx == 0 and dy == 0:
                continue
            t = half_off + jnp.asarray([dx, dy], jnp.int32)  # [-3..3]
            fxt = jnp.einsum(
                "bp,pt->bt", jax.nn.one_hot(t[:, 0] & 3, 4,
                                            dtype=jnp.float32),
                tt).astype(jnp.int32)                    # [B, 8]
            fyt = jnp.einsum(
                "bp,pt->bt", jax.nn.one_hot(t[:, 1] & 3, 4,
                                            dtype=jnp.float32),
                tt).astype(jnp.int32)
            cxi = ((t[:, 0] >> 2) + 1)[:, None, None]    # {0, 1}
            cyi = ((t[:, 1] >> 2) + 1)[:, None, None]
            h0 = jnp.zeros((win.shape[0], W, n), jnp.int32)
            h1 = jnp.zeros((win.shape[0], W, n), jnp.int32)
            for k in range(8):
                fk = fxt[:, k, None, None]
                h0 = h0 + fk * win[:, :, k:k + n]
                h1 = h1 + fk * win[:, :, k + 1:k + 1 + n]
            hacc = jnp.where(cxi == 0, h0, h1)
            a0 = jnp.zeros((src_blocks.shape[0], n, n), jnp.int32)
            a1 = jnp.zeros((src_blocks.shape[0], n, n), jnp.int32)
            for k in range(8):
                fk = fyt[:, k, None, None]
                a0 = a0 + fk * hacc[:, k:k + n, :]
                a1 = a1 + fk * hacc[:, k + 1:k + 1 + n, :]
            raw = jnp.where(cyi == 0, a0, a1) >> 6
            pred = jnp.clip((raw + 32) >> 6, 0, 255)
            mvq = mv_int * 4 + t
            cost = (satd(src_blocks - pred).astype(jnp.float32)
                    + lambda_sqrt * mv_rate(mvq))
            state = consider(cost, mvq, pred, state)
    return state


def mc_blocks(ref_plane: jnp.ndarray, mvq: jnp.ndarray, n: int,
              h: int, w: int) -> jnp.ndarray:
    """Exact sub-pel prediction of every aligned n-block for ARBITRARY
    per-block quarter-pel MVs (used to cost merge candidates whose phase
    is data-dependent).  Per-block filter TAPS are selected with a
    one-hot matmul and the two-stage 8-tap filter runs ONCE per block —
    not once per phase (the old 16-phase+select form did 16x the filter
    work and materialized [B, 16, n, n]).  Returns [B, n, n] int32."""
    raw = _mc_raw_blocks(ref_plane, mvq, n, np.asarray(LUMA_FILTERS), 2)
    return jnp.clip((raw + 32) >> 6, 0, 255)


def _mc_raw_blocks(ref: jnp.ndarray, mv: jnp.ndarray, n: int,
                   taps_table: np.ndarray, frac_bits: int,
                   bit_depth: int = 8, ref_sel=None) -> jnp.ndarray:
    """Spec-exact 14-bit intermediate prediction of every aligned n-block
    for arbitrary per-block MVs (uniform two-stage filtering; the
    zero-phase filter row reproduces the spec's copy/h-only/v-only paths
    exactly at any bit depth, since all shifts compose losslessly).

    ref: [H, W] int32 plane (component resolution) or, for multi-ref
    with per-block selection, [R, H, W] plus ref_sel [B] int — the refs
    are edge-padded individually and stacked vertically, so selecting a
    reference is a ROW OFFSET on the single patch gather (multi-ref MC
    costs no extra gathers).  mv: [B, 2] in the component's sub-pel
    units scaled by 2^frac_bits; taps_table: [n_phases, n_taps].
    Returns raw [B, n, n] int32 (14-bit scale).

    Per-block filter taps are selected with one-hot matmuls (no gathers);
    the filter itself is a static unrolled multiply-add over the window.
    """
    if ref.ndim == 3:
        R, h, w = ref.shape
    else:
        R, (h, w) = 1, ref.shape
        ref = ref[None]
    oy, ox = _block_origins(h, w, n)
    n_taps = taps_table.shape[1]
    half_t = n_taps // 2 - 1                 # 3 for 8-tap, 1 for 4-tap
    mvi = mv >> frac_bits
    frac = mv & ((1 << frac_bits) - 1)
    W = n + n_taps - 1
    p = _MAX_OVERHANG
    hp = h + 2 * p
    refp = jnp.concatenate([jnp.pad(ref[r], p, mode="edge")
                            for r in range(R)])
    row_off = 0 if ref_sel is None else ref_sel * hp
    win = _patch_gather(refp,
                        oy + mvi[:, 1] - half_t + p + row_off,
                        ox + mvi[:, 0] - half_t + p, W)
    tt = jnp.asarray(taps_table, jnp.float32)          # [P, T]
    ohx = jax.nn.one_hot(frac[:, 0], tt.shape[0], dtype=jnp.float32)
    ohy = jax.nn.one_hot(frac[:, 1], tt.shape[0], dtype=jnp.float32)
    fx = jnp.einsum("bp,pt->bt", ohx, tt).astype(jnp.int32)  # [B, T]
    fy = jnp.einsum("bp,pt->bt", ohy, tt).astype(jnp.int32)
    shift1 = bit_depth - 8
    hacc = jnp.zeros((win.shape[0], W, n), jnp.int32)
    for k in range(n_taps):
        hacc = hacc + fx[:, k, None, None] * win[:, :, k:k + n]
    if shift1:
        hacc = hacc >> shift1
    acc = jnp.zeros((win.shape[0], n, n), jnp.int32)
    for k in range(n_taps):
        acc = acc + fy[:, k, None, None] * hacc[:, k:k + n, :]
    return acc >> 6


def _blocks_to_plane(blocks: jnp.ndarray, gy: int, gx: int) -> jnp.ndarray:
    b, n, _ = blocks.shape
    return (blocks.reshape(gy, gx, n, n).transpose(0, 2, 1, 3)
            .reshape(gy * n, gx * n))


def inter_pred_planes(ref0, ref1, dir_map, mv_map, bit_depth: int = 8,
                      ref_map=None):
    """Exact whole-frame MC prediction planes for decided per-granule
    motion (the inter half of the device commit; reference parity:
    spec.mc.mc_cu_motion — MC is position-invariant, so per-8x8-granule
    filtering with the CU's MV equals per-CU filtering exactly).

    ref0/ref1: (y, cb, cr) int32 planes — each [H, W] single-ref or
    [R, H, W] multi-ref stacks selected per granule via ref_map
    [gh, gw, 2] (ref1 may be None for P);
    dir_map: [gh, gw] int32 (0 intra, 1 L0, 2 L1, 3 BI);
    mv_map: [gh, gw, 4] int32 quarter-pel (mv0x, mv0y, mv1x, mv1y).
    Returns (pred_y, pred_cb, pred_cr) int32 planes; intra granules hold
    arbitrary values (the commit masks them out).
    """
    gh, gw = dir_map.shape
    d = dir_map.reshape(-1)
    mv0 = mv_map.reshape(-1, 4)[:, 0:2]
    mv1 = mv_map.reshape(-1, 4)[:, 2:4]
    sel0 = sel1 = None
    if ref_map is not None:
        sel0 = ref_map.reshape(-1, 2)[:, 0]
        sel1 = ref_map.reshape(-1, 2)[:, 1]
    shift = 14 - bit_depth
    off_u, off_b = 1 << (shift - 1), 1 << shift
    max_val = (1 << bit_depth) - 1

    def comp(ci, n):
        r0 = ref0[ci]
        taps = (LUMA_FILTERS if ci == 0 else CHROMA_FILTERS)
        fb = 2 if ci == 0 else 3
        s0 = sel0 if (sel0 is not None and r0.ndim == 3) else None
        raw0 = _mc_raw_blocks(r0, mv0, n, np.asarray(taps), fb, bit_depth,
                              ref_sel=s0)
        if ref1 is not None:
            r1 = ref1[ci]
            s1 = sel1 if (sel1 is not None and r1.ndim == 3) else None
            raw1 = _mc_raw_blocks(r1, mv1, n, np.asarray(taps), fb,
                                  bit_depth, ref_sel=s1)
        else:
            raw1 = raw0
        dd = d[:, None, None]
        uni = jnp.where(dd == 2, raw1, raw0)
        pred = jnp.where(
            dd == 3,
            (raw0 + raw1 + off_b) >> (shift + 1),
            (uni + off_u) >> shift)
        pred = jnp.clip(pred, 0, max_val)
        return _blocks_to_plane(pred, gh, gw)

    pred_y = comp(0, 8)
    pred_cb = comp(1, 4)
    pred_cr = comp(2, 4)
    return pred_y, pred_cb, pred_cr


def subpel_from_state(st: MEState, lambda_sqrt):
    """Sub-pel refinement for every ref and size from the tier windows
    (no further gathers).  Returns {n: (cost [R, B], mvq [R, B, 2],
    pred [R, B, n, n])}."""
    y, R = st.y, st.R
    out = {}
    for n in st.tiers:
        Wg = _TIER_W[n]
        src_b = _blocks_of(y, n)
        B = src_b.shape[0]
        rel = st.mv_int[n] - st.base[n]          # [R, B, 2] in [-3, 3]
        rs = (rel[:, :, 1] + 3).reshape(-1)
        cs = (rel[:, :, 0] + 3).reshape(-1)
        G = st.G[n].reshape(R * B, Wg, Wg)
        win = _select_window(G, rs, cs, n + 8, n + 8)
        src_rep = jnp.broadcast_to(src_b[None], (R,) + src_b.shape
                                   ).reshape(R * B, n, n)
        mvi = st.mv_int[n].reshape(R * B, 2)
        c, mvq, pred = _subpel_core(src_rep, win, mvi, n, lambda_sqrt)
        out[n] = (c.reshape(R, B), mvq.reshape(R, B, 2),
                  pred.reshape(R, B, n, n))
    # ---- 8-blocks ride the 16-tier windows (child sub-views)
    gy16, gx16 = st.h // 16, st.w // 16
    B16 = gy16 * gx16
    src16 = _blocks_of(y, 16)
    G16 = st.G[16].reshape(R * B16, _TIER_W[16], _TIER_W[16])
    mv8 = st.mv_int[8].reshape(R, 2 * gy16, 2 * gx16, 2)
    base16 = st.base[16]
    res = {}
    for cy in (0, 1):
        for cx in (0, 1):
            mvc = mv8[:, cy::2, cx::2].reshape(R, B16, 2)
            rel = mvc - base16
            rs = (8 * cy + rel[:, :, 1] + 3).reshape(-1)
            cs = (8 * cx + rel[:, :, 0] + 3).reshape(-1)
            win = _select_window(G16, rs, cs, 16, 16)
            src8 = src16[:, 8 * cy:8 * cy + 8, 8 * cx:8 * cx + 8]
            src_rep = jnp.broadcast_to(src8[None], (R, B16, 8, 8)
                                       ).reshape(R * B16, 8, 8)
            c, mvq, pred = _subpel_core(src_rep, win, mvc.reshape(-1, 2),
                                        8, lambda_sqrt)
            res[(cy, cx)] = (c.reshape(R, B16), mvq.reshape(R, B16, 2),
                             pred.reshape(R, B16, 8, 8))
    out[8] = tuple(
        _interleave_children({k: v[i] for k, v in res.items()}, R,
                             gy16, gx16) for i in range(3))
    return out


def _tier_view(st: MEState, n: int, ref_idx: int):
    """(G [B, Wg, Wg], base [B, 2], voff, uoff, Wg) for one ref at one
    size; n=8 rides the 16-tier windows via child expansion."""
    if n == 8:
        gy16, gx16 = st.h // 16, st.w // 16
        gx8 = 2 * gx16
        B8 = 4 * gy16 * gx16
        Wg = _TIER_W[16]
        G = st.child_expand(st.G[16][ref_idx:ref_idx + 1])[0]
        base = st.child_expand(st.base[16][ref_idx:ref_idx + 1])[0]
        idx = jnp.arange(B8)
        voff = (idx // gx8 % 2) * 8
        uoff = (idx % gx8 % 2) * 8
        return G, base, voff, uoff, Wg
    return st.G[n][ref_idx], st.base[n][ref_idx], 0, 0, _TIER_W[n]


def _mc_raw_windows(G, base, voff, uoff, Wg, n, mvq):
    """Tail of mc_raw_from_state given tier windows: per-block one-hot
    tap selection + two-stage 8-tap filter on a window select."""
    tt = jnp.asarray(LUMA_FILTERS, jnp.float32)
    mvi = mvq >> 2
    frac = mvq & 3
    fxt = jnp.einsum("bp,pt->bt",
                     jax.nn.one_hot(frac[:, 0], 4, dtype=jnp.float32),
                     tt, precision=_HI).astype(jnp.int32)
    fyt = jnp.einsum("bp,pt->bt",
                     jax.nn.one_hot(frac[:, 1], 4, dtype=jnp.float32),
                     tt, precision=_HI).astype(jnp.int32)
    rs = mvi[:, 1] - base[:, 1] + voff + 4
    cs = mvi[:, 0] - base[:, 0] + uoff + 4
    lim = Wg - (n + 7)
    valid = ((rs >= 0) & (rs <= lim) & (cs >= 0) & (cs <= lim))
    win = _select_window(G, rs, cs, n + 7, n + 7)
    hacc = jnp.zeros((win.shape[0], n + 7, n), jnp.int32)
    for k in range(8):
        hacc = hacc + fxt[:, k, None, None] * win[:, :, k:k + n]
    acc = jnp.zeros((win.shape[0], n, n), jnp.int32)
    for k in range(8):
        acc = acc + fyt[:, k, None, None] * hacc[:, k:k + n, :]
    return acc >> 6, valid


def mc_raw_from_state(st: MEState, ref_idx: int, n: int, mvq):
    """Spec-exact 14-bit raw MC prediction of every aligned n-block for
    ARBITRARY per-block quarter-pel MVs mvq [B, 2], served from the tier
    windows via one-hot selects (no gathers).

    Returns (raw [B, n, n] int32, valid [B] bool).  A candidate whose
    integer MV strays more than ~4 px from the block's tier base falls
    outside the gathered window and reports valid=False (callers price it
    out) — a search-stage-only approximation: merge candidates that far
    from the local motion field would not win, and the commit stage
    re-derives every prediction exactly."""
    G, base, voff, uoff, Wg = _tier_view(st, n, ref_idx)
    return _mc_raw_windows(G, base, voff, uoff, Wg, n, mvq)


def mc_raw_from_state_sel(st: MEState, r_lo: int, r_hi: int, sel, n: int,
                          mvq):
    """mc_raw_from_state with a PER-BLOCK reference choice between two
    of the state's refs (multi-ref search): sel [B] bool, True -> r_hi.
    The windows AND their bases are selected per block (each ref's tier
    windows are centered on that ref's own coarse base).  r_lo == r_hi
    degenerates to the plain single-ref path."""
    if r_lo == r_hi:
        return mc_raw_from_state(st, r_lo, n, mvq)
    G0, b0, voff, uoff, Wg = _tier_view(st, n, r_lo)
    G1, b1, _, _, _ = _tier_view(st, n, r_hi)
    s1 = sel[:, None]
    G = jnp.where(sel[:, None, None], G1, G0)
    base = jnp.where(s1, b1, b0)
    return _mc_raw_windows(G, base, voff, uoff, Wg, n, mvq)


def search_inter_costs(y_plane: jnp.ndarray, ref_plane: jnp.ndarray,
                       lambda_sqrt: jnp.ndarray, log2_ctu: int = 5,
                       log2_min_cu: int = 3, search_range: int = 8):
    """Per-size inter costs, sub-pel MVs and predictions for the frame.

    Returns {n: (cost [B] f32, mv [B, 2] quarter-pel, pred [B, n, n])}.
    """
    st = me_state(y_plane, [ref_plane], search_range,
                  max_size=1 << log2_ctu)
    sp = subpel_from_state(st, lambda_sqrt)
    return {n: (c[0], mv[0], pr[0]) for n, (c, mv, pr) in sp.items()}
