"""Batched intra prediction: all 35 modes for B blocks at once (JAX, TPU).

Reference parity: fasthevc_tpu.spec.intra (oracle), HM TComPrediction
(SURVEY.md C3). TPU-first design: instead of the reference's per-block
branchy scalar code, every angular mode is reduced at trace time to two
static gathers + an integer weighted add over a concatenated reference
vector [side | main], with the mode-<18 transpose folded into the index
tables. One jit call produces [B, 35, N, N].

Reference layout (matches the spec oracle): top[b] = [corner, p[0][-1] ..
p[2N-1][-1]], left[b] = [corner, p[-1][0] .. p[-1][2N-1]].
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..spec.intra import should_filter
from ..spec.tables import INTRA_INV_ANGLE, INTRA_PRED_ANGLE

# ---------------------------------------------------------------------------
# Static per-mode gather tables
# ---------------------------------------------------------------------------


def _angular_tables(n: int):
    """Build static gather tables for modes 2..34.

    The per-block reference vector is refcat = concat(top, left), length
    2*(2n+1). For each mode we emit idx_a/idx_b [n, n] and weights wa/wb [n]
    such that pred[y][x] = (wa[y]*refcat[idx_a[y,x]] + wb[y]*refcat[idx_b[y,x]]
    + 16) >> 5 reproduces the oracle (including the transpose for modes < 18).
    """
    ln = 2 * n + 1
    idx_a = np.zeros((33, n, n), dtype=np.int32)
    idx_b = np.zeros((33, n, n), dtype=np.int32)
    w_a = np.zeros((33, n), dtype=np.int32)
    w_b = np.zeros((33, n), dtype=np.int32)
    for mi, mode in enumerate(range(2, 35)):
        angle = INTRA_PRED_ANGLE[mode]
        vertical = mode >= 18
        # main = top for vertical, left for horizontal; side = the other.
        main_off = 0 if vertical else ln     # offset of main within refcat
        side_off = ln if vertical else 0
        # ext[k] for k in [-n .. 2n]: map to refcat indices
        ext = np.zeros(3 * n + 1, dtype=np.int32)  # refcat index per ext pos
        off = n
        ext[off] = main_off  # corner
        for j in range(1, 2 * n + 1):
            ext[off + j] = main_off + j
        if angle < 0:
            inv = INTRA_INV_ANGLE[mode]
            lowest = ((n * angle) >> 5) + 1
            for k in range(-1, lowest - 1, -1):
                sidx = (k * inv + 128) >> 8
                ext[off + k] = side_off + sidx
        for y in range(n):
            i_idx = ((y + 1) * angle) >> 5
            i_fact = ((y + 1) * angle) & 31
            w_a[mi, y] = 32 - i_fact
            w_b[mi, y] = i_fact
            for x in range(n):
                a = ext[off + i_idx + 1 + x]
                b = ext[off + min(i_idx + 2 + x, 2 * n)]
                if vertical:
                    idx_a[mi, y, x] = a
                    idx_b[mi, y, x] = b
                else:
                    idx_a[mi, x, y] = a
                    idx_b[mi, x, y] = b
        if not vertical:
            # weights vary along x after transpose: expand weights into the
            # index tables by folding? Keep per-mode 2-D weights instead.
            pass
    return idx_a, idx_b, w_a, w_b


class _Tables:
    """Cached static tables per block size."""

    def __init__(self, n: int):
        self.n = n
        idx_a, idx_b, w_a, w_b = _angular_tables(n)
        # Expand weights to [33, n, n] honoring the transpose of modes < 18.
        wa2 = np.zeros((33, n, n), dtype=np.int32)
        wb2 = np.zeros((33, n, n), dtype=np.int32)
        for mi, mode in enumerate(range(2, 35)):
            if mode >= 18:
                wa2[mi] = w_a[mi][:, None]
                wb2[mi] = w_b[mi][:, None]
            else:
                wa2[mi] = w_a[mi][None, :]
                wb2[mi] = w_b[mi][None, :]
        # Keep tables as host numpy: they become embedded constants at each
        # jit trace (a cached jnp array created inside one trace would leak
        # tracers into later traces).
        self.idx_a = idx_a
        self.idx_b = idx_b
        self.w_a = wa2
        self.w_b = wb2
        # which modes use filtered references (luma; size-dependent)
        self.use_filt_luma = np.array(
            [should_filter(m, n, True) for m in range(35)], dtype=bool)
        # MXU form (see predict_all_modes): prediction is a linear map of
        # the reference vector. mat_[ul][L, 34*n*n] maps [unfiltered |
        # filtered] refcat halves to planar+angular outputs (mode order:
        # planar, then 2..34); DC (nonlinear edge cases) stays separate.
        ln = 2 * (2 * n + 1)
        self.mat_u = {}
        self.mat_v = {}
        for luma in (True, False):
            m_u = np.zeros((ln, 34, n, n), dtype=np.float32)
            m_f = np.zeros((ln, 34, n, n), dtype=np.float32)
            lg = n.bit_length() - 1
            # planar (output slot 0): weights / 2^(lg+1); filtered refs for
            # luma n>4 (matching the oracle's tp/lp selection)
            # refcat layout: top[k] at index k, left[k] at (2n+1)+k
            pf = m_f if (luma and n > 4) else m_u
            sc = 1.0 / (1 << (lg + 1))
            for y in range(n):
                for x in range(n):
                    pf[(2 * n + 1) + 1 + y, 0, y, x] += (n - 1 - x) * sc
                    pf[n + 1, 0, y, x] += (x + 1) * sc              # top-right
                    pf[1 + x, 0, y, x] += (n - 1 - y) * sc
                    pf[(2 * n + 1) + n + 1, 0, y, x] += (y + 1) * sc  # bot-left
            # angular modes 2..34 (output slots 1..33)
            for mi, mode in enumerate(range(2, 35)):
                use_f = luma and n > 4 and should_filter(mode, n, True)
                dst = m_f if use_f else m_u
                for y in range(n):
                    for x in range(n):
                        dst[self.idx_a[mi, y, x], 1 + mi, y, x] += \
                            wa2[mi, y, x] / 32.0
                        dst[self.idx_b[mi, y, x], 1 + mi, y, x] += \
                            wb2[mi, y, x] / 32.0
            key = luma
            self.mat_u[key] = m_u.reshape(ln, 34 * n * n)
            self.mat_v[key] = m_f.reshape(ln, 34 * n * n)


_TABLES: dict[int, _Tables] = {}


def _tables(n: int) -> _Tables:
    if n not in _TABLES:
        _TABLES[n] = _Tables(n)
    return _TABLES[n]


# ---------------------------------------------------------------------------
# Batched prediction
# ---------------------------------------------------------------------------

def _filter_refs(top: jnp.ndarray, left: jnp.ndarray):
    """[1 2 1]/4 smoothing, batched. top/left: [B, 2N+1]."""
    # sequence: left reversed (excluding corner), corner, top[1:]
    seq = jnp.concatenate([left[:, :0:-1], left[:, :1], top[:, 1:]], axis=1)
    f = seq.at[:, 1:-1].set((seq[:, :-2] + 2 * seq[:, 1:-1] + seq[:, 2:] + 2)
                            >> 2)
    n2 = top.shape[1] - 1
    left_f = jnp.concatenate([f[:, n2:n2 + 1], f[:, n2 - 1::-1]], axis=1)
    top_f = jnp.concatenate([f[:, n2:n2 + 1], f[:, n2 + 1:]], axis=1)
    return top_f, left_f


@partial(jax.jit, static_argnames=("log2_size", "is_luma", "bit_depth"))
def predict_all_modes(top: jnp.ndarray, left: jnp.ndarray, log2_size: int,
                      is_luma: bool = True,
                      bit_depth: int = 8) -> jnp.ndarray:
    """All 35 intra predictions for a batch of blocks.

    top, left: [B, 2N+1] int32 (corner-first layout). Returns
    [B, 35, N, N] int32.
    """
    n = 1 << log2_size
    t = _tables(n)
    b = top.shape[0]
    max_val = (1 << bit_depth) - 1
    top = top.astype(jnp.int32)
    left = left.astype(jnp.int32)

    if is_luma and n > 4:
        top_f, left_f = _filter_refs(top, left)
    else:
        top_f, left_f = top, left

    # ---- planar + all angular modes as ONE MXU matmul --------------------
    # Intra prediction is a linear map of the reference vector; the gather
    # formulation is VPU-bound (~70 ms/frame at 1080p) while this dense
    # [B, 2L] @ [2L, 34*n*n] f32 product runs on the MXU in ~1 ms. Exact:
    # weights are dyadic (k/2^s, s<=6), samples are <=10 bits, every
    # accumulation fits f32's 24-bit significand; floor(x+.5) reproduces
    # the spec's (acc + half) >> shift including planar's (lg+1) shift.
    refcat2 = jnp.concatenate([top, left, top_f, left_f],
                              axis=1).astype(jnp.float32)  # [B, 2L]
    m2 = np.concatenate([t.mat_u[is_luma], t.mat_v[is_luma]], axis=0)
    lin = jnp.einsum("bl,lo->bo", refcat2, m2,
                     preferred_element_type=jnp.float32)
    lin = jnp.floor(lin + 0.5).astype(jnp.int32).reshape(b, 34, n, n)
    planar, ang = lin[:, :1], lin[:, 1:]

    # masked selects instead of .at[...].set scatters (scatters serialize
    # on TPU; a where over the full tensor vectorizes)
    col0 = (jnp.arange(n) == 0)
    # ---- edge filters for pure horizontal (10) / vertical (26), luma <32 -
    if is_luma and n < 32:
        v_col = jnp.clip(top[:, 1:2] + ((left[:, 1:n + 1] - left[:, :1]) >> 1),
                         0, max_val)  # [B, N] down first column
        m_idx = jnp.arange(33)
        is26 = (m_idx == 26 - 2)[None, :, None, None]
        is10 = (m_idx == 10 - 2)[None, :, None, None]
        ang = jnp.where(is26 & col0[None, None, None, :],
                        v_col[:, None, :, None], ang)
        h_row = jnp.clip(left[:, 1:2] + ((top[:, 1:n + 1] - top[:, :1]) >> 1),
                         0, max_val)
        ang = jnp.where(is10 & col0[None, None, :, None],
                        h_row[:, None, None, :], ang)

    # ---- DC (always unfiltered refs; nonlinear edge smoothing) -----------
    dc = (jnp.sum(top[:, 1:n + 1], axis=1) + jnp.sum(left[:, 1:n + 1], axis=1)
          + n) >> (log2_size + 1)  # [B]
    dcp = jnp.broadcast_to(dc[:, None, None], (b, n, n))
    if is_luma and n < 32:
        first_row = (top[:, 1:n + 1] + 3 * dc[:, None] + 2) >> 2
        first_col = (left[:, 1:n + 1] + 3 * dc[:, None] + 2) >> 2
        corner = (left[:, 1] + 2 * dc + top[:, 1] + 2) >> 2
        dcp = jnp.where(col0[None, :, None], first_row[:, None, :], dcp)
        dcp = jnp.where(col0[None, None, :], first_col[:, :, None], dcp)
        dcp = jnp.where(col0[None, :, None] & col0[None, None, :],
                        corner[:, None, None], dcp)
    return jnp.concatenate([planar, dcp[:, None], ang], axis=1)


@partial(jax.jit, static_argnames=("log2_size", "is_luma", "bit_depth"))
def predict_selected(top: jnp.ndarray, left: jnp.ndarray, log2_size: int,
                     modes: jnp.ndarray, is_luma: bool = True,
                     bit_depth: int = 8) -> jnp.ndarray:
    """ONE intra prediction per block — exact twin of predict_all_modes
    restricted to each block's chosen mode (the commit path needs only
    that one; computing all 35 costs ~35x the FLOPs and dominates the
    wavefront kernel).

    top, left: [B, 2N+1] int32 corner-first; modes: [B] int32 in 0..34.
    Returns [B, N, N] int32.
    """
    n = 1 << log2_size
    t = _tables(n)
    b = top.shape[0]
    max_val = (1 << bit_depth) - 1
    top = top.astype(jnp.int32)
    left = left.astype(jnp.int32)
    if is_luma and n > 4:
        top_f, left_f = _filter_refs(top, left)
    else:
        top_f, left_f = top, left
    refcat2 = jnp.concatenate([top, left, top_f, left_f],
                              axis=1).astype(jnp.float32)   # [B, 2L]
    # per-mode matrix table [35, 2L, n*n]: slot 0 = planar, slot 1 = DC
    # (zero — handled exactly below), slots 2..34 = angular
    m2 = np.concatenate([t.mat_u[is_luma], t.mat_v[is_luma]], axis=0)
    ln2 = m2.shape[0]
    m3 = m2.reshape(ln2, 34, n * n).transpose(1, 0, 2)      # [34, 2L, nn]
    table = np.concatenate(
        [m3[:1], np.zeros((1, ln2, n * n), np.float32), m3[1:]])
    msel = jnp.asarray(table)[modes]                        # [B, 2L, nn]
    lin = jnp.einsum("bl,bln->bn", refcat2, msel,
                     preferred_element_type=jnp.float32)
    pred = jnp.floor(lin + 0.5).astype(jnp.int32).reshape(b, n, n)

    col0 = (jnp.arange(n) == 0)
    if is_luma and n < 32:
        v_col = jnp.clip(top[:, 1:2] + ((left[:, 1:n + 1] - left[:, :1])
                                        >> 1), 0, max_val)
        h_row = jnp.clip(left[:, 1:2] + ((top[:, 1:n + 1] - top[:, :1])
                                         >> 1), 0, max_val)
        is26 = (modes == 26)[:, None, None]
        is10 = (modes == 10)[:, None, None]
        pred = jnp.where(is26 & col0[None, None, :], v_col[:, :, None],
                         pred)
        pred = jnp.where(is10 & col0[None, :, None], h_row[:, None, :],
                         pred)
    dc = (jnp.sum(top[:, 1:n + 1], axis=1)
          + jnp.sum(left[:, 1:n + 1], axis=1) + n) >> (log2_size + 1)
    dcp = jnp.broadcast_to(dc[:, None, None], (b, n, n))
    if is_luma and n < 32:
        first_row = (top[:, 1:n + 1] + 3 * dc[:, None] + 2) >> 2
        first_col = (left[:, 1:n + 1] + 3 * dc[:, None] + 2) >> 2
        corner = (left[:, 1] + 2 * dc + top[:, 1] + 2) >> 2
        dcp = jnp.where(col0[None, :, None], first_row[:, None, :], dcp)
        dcp = jnp.where(col0[None, None, :], first_col[:, :, None], dcp)
        dcp = jnp.where(col0[None, :, None] & col0[None, None, :],
                        corner[:, None, None], dcp)
    return jnp.where((modes == 1)[:, None, None], dcp, pred)


def predict_selected_mm(top: jnp.ndarray, left: jnp.ndarray,
                        log2_size: int, modes: jnp.ndarray,
                        is_luma: bool = True,
                        bit_depth: int = 8) -> jnp.ndarray:
    """ONE intra prediction per block, gather-free (wavefront-commit twin
    of predict_selected).

    The per-block mode select is folded into the reference vector as a
    one-hot outer product, so the whole call is elementwise ops plus one
    MXU matmul — no take_along_axis/gather (those cost ~60us each inside
    a lax.scan on this platform and dominated the old commit kernel).
    Exact: one-hot entries are 0/1, samples <= 10 bits, every product and
    accumulation below 2^24 stays exact in f32 (same argument as
    predict_all_modes).

    top, left: [B, 2N+1] int32 corner-first; modes: [B] int32 in 0..34.
    Returns [B, N, N] int32.
    """
    n = 1 << log2_size
    t = _tables(n)
    b = top.shape[0]
    max_val = (1 << bit_depth) - 1
    top = top.astype(jnp.int32)
    left = left.astype(jnp.int32)
    if is_luma and n > 4:
        top_f, left_f = _filter_refs(top, left)
    else:
        top_f, left_f = top, left
    refcat2 = jnp.concatenate([top, left, top_f, left_f],
                              axis=1).astype(jnp.float32)   # [B, 2L]
    m2 = np.concatenate([t.mat_u[is_luma], t.mat_v[is_luma]], axis=0)
    ln2 = m2.shape[0]
    # [34*2L, nn]: slot 0 = planar, slots 1..33 = angular 2..34
    m3 = (m2.reshape(ln2, 34, n * n).transpose(1, 0, 2)
          .reshape(34 * ln2, n * n))
    # mode -> slot one-hot (DC = mode 1 has no linear slot; handled below)
    slot = jnp.where(modes == 0, 0, modes - 1)
    oh = ((jnp.arange(34)[None, :] == slot[:, None])
          & (modes != 1)[:, None]).astype(jnp.float32)      # [B, 34]
    refsel = (refcat2[:, None, :] * oh[:, :, None]).reshape(b, 34 * ln2)
    lin = jnp.dot(refsel, m3, preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    pred = jnp.floor(lin + 0.5).astype(jnp.int32).reshape(b, n, n)

    col0 = (jnp.arange(n) == 0)
    if is_luma and n < 32:
        v_col = jnp.clip(top[:, 1:2] + ((left[:, 1:n + 1] - left[:, :1])
                                        >> 1), 0, max_val)
        h_row = jnp.clip(left[:, 1:2] + ((top[:, 1:n + 1] - top[:, :1])
                                         >> 1), 0, max_val)
        is26 = (modes == 26)[:, None, None]
        is10 = (modes == 10)[:, None, None]
        pred = jnp.where(is26 & col0[None, None, :], v_col[:, :, None],
                         pred)
        pred = jnp.where(is10 & col0[None, :, None], h_row[:, None, :],
                         pred)
    dc = (jnp.sum(top[:, 1:n + 1], axis=1)
          + jnp.sum(left[:, 1:n + 1], axis=1) + n) >> (log2_size + 1)
    dcp = jnp.broadcast_to(dc[:, None, None], (b, n, n))
    if is_luma and n < 32:
        first_row = (top[:, 1:n + 1] + 3 * dc[:, None] + 2) >> 2
        first_col = (left[:, 1:n + 1] + 3 * dc[:, None] + 2) >> 2
        corner = (left[:, 1] + 2 * dc + top[:, 1] + 2) >> 2
        dcp = jnp.where(col0[None, :, None], first_row[:, None, :], dcp)
        dcp = jnp.where(col0[None, None, :], first_col[:, :, None], dcp)
        dcp = jnp.where(col0[None, :, None] & col0[None, None, :],
                        corner[:, None, None], dcp)
    return jnp.where((modes == 1)[:, None, None], dcp, pred)


# ---------------------------------------------------------------------------
# Grid reference extraction (search stage: source-pixel references)
# ---------------------------------------------------------------------------

def grid_refs(plane: jnp.ndarray, n: int, fill: int = 128):
    """Extract top/left reference arrays for every aligned NxN block of a
    plane, using the plane's own pixels (search-stage approximation of
    decoded-neighbor references; boundary samples take edge/fill values).

    plane: [H, W] int32 (H, W multiples of n). Returns (top, left), each
    [H/n * W/n, 2N+1], block raster order.
    """
    h, w = plane.shape
    gy, gx = h // n, w // n
    # Strided-slice construction (NO per-element gathers — those dominate
    # the whole search at ~50 ms/frame on TPU): the (2n+1)-wide reference
    # windows of all blocks are three n-aligned reshapes of the row/column
    # extracts, concatenated and cropped.
    padded = jnp.pad(plane, ((1, 3 * n), (1, 3 * n)), mode="edge")
    rows = padded[0:h:n, :]                    # [gy, w + 3n + 1]
    parts = [rows[:, k * n:k * n + gx * n].reshape(gy, gx, n)
             for k in range(3)]
    top = jnp.concatenate(parts, axis=-1)[:, :, :2 * n + 1]
    cols_t = padded[:, 0:w:n].T                # [gx, h + 3n + 1]
    parts_l = [cols_t[:, k * n:k * n + gy * n].reshape(gx, gy, n)
               for k in range(3)]
    left = (jnp.concatenate(parts_l, axis=-1)[:, :, :2 * n + 1]
            .transpose(1, 0, 2))
    # frame boundary: top row of first block row / left col of first block
    # col replicate the edge (via pad edge) — acceptable for search.
    return (top.reshape(gy * gx, 2 * n + 1).astype(jnp.int32),
            left.reshape(gy * gx, 2 * n + 1).astype(jnp.int32))
