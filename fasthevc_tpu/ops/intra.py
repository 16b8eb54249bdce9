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

    refcat_u = jnp.concatenate([top, left], axis=1)      # [B, 2*(2N+1)]
    refcat_f = jnp.concatenate([top_f, left_f], axis=1)

    # ---- angular modes 2..34 via static gathers --------------------------
    def gather_modes(refcat):
        ra = refcat[:, t.idx_a.reshape(-1)].reshape(b, 33, n, n)
        rb = refcat[:, t.idx_b.reshape(-1)].reshape(b, 33, n, n)
        return (t.w_a[None] * ra + t.w_b[None] * rb + 16) >> 5

    ang_u = gather_modes(refcat_u)
    if is_luma and n > 4:
        ang_f = gather_modes(refcat_f)
        ang = jnp.where(t.use_filt_luma[2:][None, :, None, None], ang_f,
                        ang_u)
    else:
        ang = ang_u

    # ---- edge filters for pure horizontal (10) / vertical (26), luma <32 -
    if is_luma and n < 32:
        v_col = jnp.clip(top[:, 1:2] + ((left[:, 1:n + 1] - left[:, :1]) >> 1),
                         0, max_val)  # [B, N] down first column
        ang = ang.at[:, 26 - 2, :, 0].set(v_col)
        h_row = jnp.clip(left[:, 1:2] + ((top[:, 1:n + 1] - top[:, :1]) >> 1),
                         0, max_val)
        ang = ang.at[:, 10 - 2, 0, :].set(h_row)

    # ---- planar ----------------------------------------------------------
    tp, lp = (top_f, left_f) if (is_luma and n > 4) else (top, left)
    tt = tp[:, 1:n + 1]          # [B, N]
    ll = lp[:, 1:n + 1]
    tr = tp[:, n + 1:n + 2]      # [B, 1]
    bl = lp[:, n + 1:n + 2]
    xs = jnp.arange(n, dtype=jnp.int32)
    planar = (((n - 1 - xs)[None, None, :] * ll[:, :, None])
              + ((xs + 1)[None, None, :] * tr[:, :, None])
              + ((n - 1 - xs)[None, :, None] * tt[:, None, :])
              + ((xs + 1)[None, :, None] * bl[:, :, None])
              + n) >> (log2_size + 1)

    # ---- DC (always unfiltered refs) -------------------------------------
    dc = (jnp.sum(top[:, 1:n + 1], axis=1) + jnp.sum(left[:, 1:n + 1], axis=1)
          + n) >> (log2_size + 1)  # [B]
    dcp = jnp.broadcast_to(dc[:, None, None], (b, n, n))
    if is_luma and n < 32:
        first_row = (top[:, 1:n + 1] + 3 * dc[:, None] + 2) >> 2
        first_col = (left[:, 1:n + 1] + 3 * dc[:, None] + 2) >> 2
        corner = (left[:, 1] + 2 * dc + top[:, 1] + 2) >> 2
        dcp = dcp.at[:, 0, :].set(first_row)
        dcp = dcp.at[:, :, 0].set(first_col)
        dcp = dcp.at[:, 0, 0].set(corner)

    return jnp.concatenate([planar[:, None], dcp[:, None], ang], axis=1)


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
    # pad: one row above, one col left, 2N to the right/bottom edges handled
    # by edge replication (clamped gather)
    padded = jnp.pad(plane, ((1, n), (1, n)), mode="edge")
    # top-left corners of blocks in padded coords
    ys = jnp.arange(gy) * n      # +1 -1
    xs = jnp.arange(gx) * n
    # top row for block (by, bx): padded[by*n, bx*n : bx*n + 2n+1]
    off = jnp.arange(2 * n + 1)
    top = padded[ys[:, None, None], (xs[None, :, None] + off[None, None, :])]
    left = padded[(ys[:, None, None] + off[None, None, :]),
                  xs[None, :, None]]
    # frame boundary: top row of first block row / left col of first block
    # col replicate the edge (already via pad edge) — acceptable for search.
    return (top.reshape(gy * gx, 2 * n + 1).astype(jnp.int32),
            left.reshape(gy * gx, 2 * n + 1).astype(jnp.int32))
