"""Batched RD-cost primitives: SATD, SSE, level-rate proxy (JAX, TPU).

Reference parity: HM TComRdCost (SURVEY.md E10). SATD uses the Hadamard
transform as two matmuls (MXU-friendly); the rate proxy approximates the
CABAC residual-coding cost from level statistics and is calibrated against
the exact estimator in tests.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _hadamard(n: int) -> np.ndarray:
    h = np.array([[1]], dtype=np.int32)
    while h.shape[0] < n:
        h = np.block([[h, h], [h, -h]])
    return h


@partial(jax.jit, static_argnames=("block",))
def satd(res: jnp.ndarray, block: int = 8) -> jnp.ndarray:
    """Sum of absolute Hadamard-transformed differences.

    res: [..., N, N] with N a multiple of `block` (or N == 4 with block 4).
    Returns [...] int32 costs (HM normalization: divided by block size).
    """
    n = res.shape[-1]
    hb = min(block, n)
    # f32 on the MXU: TPU has no native s32 matmul (the integer path is
    # emulated and ~100x slower). Exact for this domain: inputs are 9-bit
    # residuals, Hadamard entries +-1, every accumulation < 2^24.
    h = jnp.asarray(_hadamard(hb), jnp.float32)
    x = res.astype(jnp.float32)
    nb = n // hb
    # reshape to [..., nb, hb, nb, hb] -> [..., nb, nb, hb, hb]
    lead = x.shape[:-2]
    x = x.reshape(lead + (nb, hb, nb, hb))
    x = jnp.moveaxis(x, -3, -2)
    t = jnp.einsum("ij,...jk,lk->...il", h, x, h,
                   preferred_element_type=jnp.float32)
    # per-sub-block abs-sum, divided per block (matches HM rounding), then
    # summed over the sub-block grid
    per_block = jnp.floor(jnp.sum(jnp.abs(t), axis=(-2, -1)) / hb)
    return jnp.sum(per_block, axis=(-2, -1)).astype(jnp.int32)


@jax.jit
def sse(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    # f32: s64 reductions are emulated on TPU; the ~2^-24 relative rounding
    # on large sums is far below any RD decision margin (search-only use)
    d = (a.astype(jnp.float32) - b.astype(jnp.float32)) ** 2
    return jnp.sum(d, axis=(-2, -1))


# Per-TB-size CABAC residual-bits model, least-squares calibrated against
# the exact CabacEstimator on ~1200 realistic residual TBs per size
# (intra/inter-style residuals of synthesized content, QP 22-37).
# Features: [count(|l|==1), count(|l|==2), count(|l|>2),
#            sum log2(1+|l|) over |l|>2, log2(1+last_diag), bias] where
# last_diag = max(x+y) over nonzeros (device-cheap stand-in for the last
# significant scan position). Relative fit error 7-15% per size vs ~20%
# for the old 2-constant form; a poor rate model actively misleads the
# mode/partition choices (r5 measurement: widening the true-RD shortlist
# WORSENED BD under the old proxy).
_RATE_W = {
    2: (1.246, 2.654, -4.429, 4.018, 6.446, 1.447),
    3: (2.969, 2.735, -7.342, 5.811, 9.340, -4.835),
    4: (3.920, 2.018, -7.155, 5.853, 12.375, -15.337),
    5: (4.295, 1.402, -5.354, 5.323, 34.466, -117.854),
}


def level_rate_proxy(levels: jnp.ndarray) -> jnp.ndarray:
    """Approximate CABAC residual bits for quantized levels [..., N, N].

    Calibrated per TB size (see _RATE_W). Used ONLY inside the search;
    the real coder determines the actual bitstream size.
    """
    n = levels.shape[-1]
    lg = n.bit_length() - 1
    w = _RATE_W.get(lg, _RATE_W[5])
    a = jnp.abs(levels.astype(jnp.float32))
    nz = a > 0
    any_nz = jnp.any(nz, axis=(-2, -1))
    ii = (jnp.arange(n)[None, :] + jnp.arange(n)[:, None]).astype(
        jnp.float32)
    last_diag = jnp.max(jnp.where(nz, ii, -1.0), axis=(-2, -1))
    ones = jnp.sum(a == 1.0, axis=(-2, -1)).astype(jnp.float32)
    twos = jnp.sum(a == 2.0, axis=(-2, -1)).astype(jnp.float32)
    esc = jnp.sum(a > 2.0, axis=(-2, -1)).astype(jnp.float32)
    esclog = jnp.sum(jnp.where(a > 2.0, jnp.log2(1.0 + a), 0.0),
                     axis=(-2, -1))
    bits = (w[0] * ones + w[1] * twos + w[2] * esc + w[3] * esclog
            + w[4] * jnp.log2(1.0 + jnp.maximum(last_diag, 0.0)) + w[5])
    # out-of-distribution floor (tiny blocks can extrapolate negative)
    bits = jnp.maximum(bits, 2.0 + ones + twos + esc)
    return jnp.where(any_nz, bits, 0.0)
