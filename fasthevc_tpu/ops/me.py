"""Batched motion estimation (JAX, TPU).

Reference parity: HM TEncSearch::xTZSearch (SURVEY.md E7, hot loop #2) —
redesigned TPU-first: instead of the reference's sequential zonal search
per block, ONE jitted scan evaluates every candidate offset for EVERY
block of the frame simultaneously (dense abs-diff + block reductions on
the VPU), then argmin per block. Integer-pel; sub-pel refinement happens
host-side (or is skipped by the TPU encoder — a quality/speed knob).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("block", "search_range"))
def full_search(src: jnp.ndarray, ref: jnp.ndarray, block: int = 16,
                search_range: int = 8):
    """Exhaustive integer-pel search for every aligned block of the frame.

    src, ref: [H, W] int32 (same padded dims). Returns (best_sad [B],
    best_mv [B, 2] in quarter-pel units), blocks in raster order.
    """
    h, w = src.shape
    gy, gx = h // block, w // block
    n_off = 2 * search_range + 1
    # pad ref so every offset is a static slice
    refp = jnp.pad(ref, search_range, mode="edge")

    src_blocks = (src.reshape(gy, block, gx, block)
                  .transpose(0, 2, 1, 3))              # [gy, gx, b, b]

    def eval_offset(carry, idx):
        best_sad, best_idx = carry
        dy = idx // n_off - search_range
        dx = idx % n_off - search_range
        shifted = jax.lax.dynamic_slice(
            refp, (dy + search_range, dx + search_range), (h, w))
        diff = jnp.abs(src - shifted)
        sads = (diff.reshape(gy, block, gx, block)
                .transpose(0, 2, 1, 3).sum(axis=(2, 3)))  # [gy, gx]
        better = sads < best_sad
        best_sad = jnp.where(better, sads, best_sad)
        best_idx = jnp.where(better, idx, best_idx)
        return (best_sad, best_idx), None

    init = (jnp.full((gy, gx), 2 ** 31 - 1, jnp.int32),
            jnp.zeros((gy, gx), jnp.int32))
    (best_sad, best_idx), _ = jax.lax.scan(
        eval_offset, init, jnp.arange(n_off * n_off, dtype=jnp.int32))
    mv_y = (best_idx // n_off - search_range) * 4
    mv_x = (best_idx % n_off - search_range) * 4
    return (best_sad.reshape(-1),
            jnp.stack([mv_x.reshape(-1), mv_y.reshape(-1)], axis=-1))


@partial(jax.jit, static_argnames=("log2_ctu", "log2_min_cu",
                                   "search_range"))
def search_inter_costs(y_plane: jnp.ndarray, ref_plane: jnp.ndarray,
                       lambda_sqrt: jnp.ndarray, log2_ctu: int = 5,
                       log2_min_cu: int = 3, search_range: int = 8):
    """Per-size inter costs + MVs for the whole frame.

    Returns {n: (cost [B_n] f32, mv [B_n, 2])} for each CU size n.
    MV rate proxy: ~1 bit per quarter-pel magnitude log.
    """
    out = {}
    for lg in range(log2_min_cu, log2_ctu + 1):
        n = 1 << lg
        sad, mv = full_search(y_plane, ref_plane, n, search_range)
        mv_mag = jnp.abs(mv[:, 0]) + jnp.abs(mv[:, 1])
        rate = 4.0 + 2.0 * jnp.log2(1.0 + mv_mag.astype(jnp.float32))
        out[n] = (sad.astype(jnp.float32) + lambda_sqrt * rate, mv)
    return out
