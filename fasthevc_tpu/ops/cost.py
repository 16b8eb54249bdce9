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


@jax.jit
def level_rate_proxy(levels: jnp.ndarray) -> jnp.ndarray:
    """Approximate CABAC residual bits for quantized levels [..., N, N].

    Model (calibrated in tests/test_ops_cost.py against CabacEstimator):
      bits ~ sum over nonzero: (2.0 + 1.6*log2(|l|)) + 0.6 * nnz_tail
    plus a last-position cost proxy. Used ONLY inside the search; the real
    coder determines the actual bitstream size.
    """
    a = jnp.abs(levels.astype(jnp.float32))
    nz = (a > 0).astype(jnp.float32)
    bits = jnp.sum(nz * (2.0 + 1.6 * jnp.log2(1.0 + a)), axis=(-2, -1))
    return bits + 4.0 * jnp.sign(jnp.sum(nz, axis=(-2, -1)))
