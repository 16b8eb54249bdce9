"""Batched integer transforms + quantization (JAX, TPU).

Reference parity: HM TComTrQuant (SURVEY.md C5), same math as
fasthevc_tpu.spec.transform but batched [B, N, N] and jit-compiled.

Exactness notes (tested vs the oracle):
  * All arithmetic is int32. XLA lowers s32 dots on TPU; magnitudes stay
    within int32 (stage sums < 2^27).
  * Right-shifts of negative values must be arithmetic — jnp.right_shift on
    signed ints is arithmetic in XLA, matching the spec's >> semantics.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..spec.tables import (
    DCT_MATRICES,
    DST4,
    INV_QUANT_SCALES,
    MAX_TR_DYNAMIC_RANGE,
    QUANT_SCALES,
    QUANT_SHIFT,
)


def _mat(log2_size: int, use_dst: bool) -> jnp.ndarray:
    m = DST4 if use_dst else DCT_MATRICES[1 << log2_size]
    return jnp.asarray(m, dtype=jnp.int32)


def _mm(a, b):
    """Integer matmul with explicit s32 accumulation."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((a.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)


@partial(jax.jit, static_argnames=("log2_size", "bit_depth", "use_dst"))
def fwd_transform(res: jnp.ndarray, log2_size: int, bit_depth: int = 8,
                  use_dst: bool = False) -> jnp.ndarray:
    """Forward core transform, batched. res: [..., N, N] int32."""
    t = _mat(log2_size, use_dst)
    shift1 = log2_size + bit_depth - 9
    shift2 = log2_size + 6
    x = res.astype(jnp.int32)
    # stage 1: T @ X  (contract over rows of X)
    tmp = jnp.einsum("kn,...nm->...km", t, x,
                     preferred_element_type=jnp.int32)
    if shift1 > 0:
        tmp = (tmp + (1 << (shift1 - 1))) >> shift1
    # stage 2: (tmp) @ T^T
    out = jnp.einsum("...km,lm->...kl", tmp, t,
                     preferred_element_type=jnp.int32)
    out = (out + (1 << (shift2 - 1))) >> shift2
    return out


@partial(jax.jit, static_argnames=("log2_size", "bit_depth", "use_dst"))
def inv_transform(coeffs: jnp.ndarray, log2_size: int, bit_depth: int = 8,
                  use_dst: bool = False) -> jnp.ndarray:
    """Normative inverse transform, batched (spec 8.6.4)."""
    t = _mat(log2_size, use_dst)
    shift1 = 7
    shift2 = 20 - bit_depth
    c = coeffs.astype(jnp.int32)
    e = jnp.einsum("nk,...nm->...km", t, c,
                   preferred_element_type=jnp.int32)
    e = jnp.clip((e + (1 << (shift1 - 1))) >> shift1, -32768, 32767)
    r = jnp.einsum("...km,ml->...kl", e, t,
                   preferred_element_type=jnp.int32)
    r = jnp.clip((r + (1 << (shift2 - 1))) >> shift2, -32768, 32767)
    return r


@partial(jax.jit, static_argnames=("log2_size", "bit_depth", "is_intra"))
def quantize(coeffs: jnp.ndarray, qp: jnp.ndarray, log2_size: int,
             bit_depth: int = 8, is_intra: bool = True) -> jnp.ndarray:
    """Forward scalar quantization, batched; qp may be scalar or [B]."""
    qp = jnp.asarray(qp, jnp.int32)
    transform_shift = MAX_TR_DYNAMIC_RANGE - bit_depth - log2_size
    qbits = (QUANT_SHIFT + qp // 6 + transform_shift).astype(jnp.int64)
    scale = jnp.asarray(QUANT_SCALES, jnp.int64)[qp % 6]
    f = jnp.int64(171 if is_intra else 85) << (qbits - 9)
    c = coeffs.astype(jnp.int64)
    # broadcast per-block qp ([...] -> [..., 1, 1]) against [..., N, N]
    bshape = qp.shape + (1, 1)
    if qp.ndim:
        qbits, scale, f = (v.reshape(bshape) for v in (qbits, scale, f))
    level = (jnp.abs(c) * scale + f) >> qbits
    level = jnp.clip(level, 0, 32767)
    return (jnp.sign(c) * level).astype(jnp.int32)


def quantize_mixed(coeffs: jnp.ndarray, qp: jnp.ndarray, log2_size: int,
                   bit_depth: int, intra_mask: jnp.ndarray) -> jnp.ndarray:
    """Forward quantization with a PER-BLOCK intra/inter dead-zone offset
    (171/512 vs 85/512) — the mixed-slice wavefront commit quantizes intra
    and inter blocks of one batch together.  Exact int32: |coeff| <=
    32767, scale <= 26214 -> products < 2^31; f <= 171 << 18.

    coeffs: [B, N, N] int32; intra_mask: [B] bool."""
    qp = jnp.asarray(qp, jnp.int32)
    transform_shift = MAX_TR_DYNAMIC_RANGE - bit_depth - log2_size
    qbits = QUANT_SHIFT + qp // 6 + transform_shift
    scale = jnp.asarray(QUANT_SCALES, jnp.int32)[qp % 6]
    dz = jnp.where(intra_mask, 171, 85).astype(jnp.int32)[:, None, None]
    f = dz << (qbits - 9)
    c = coeffs.astype(jnp.int32)
    level = (jnp.abs(c) * scale + f) >> qbits
    level = jnp.clip(level, 0, 32767)
    return jnp.sign(c) * level


@partial(jax.jit, static_argnames=("log2_size", "bit_depth"))
def dequantize(levels: jnp.ndarray, qp: jnp.ndarray, log2_size: int,
               bit_depth: int = 8) -> jnp.ndarray:
    """Normative dequantization, batched (spec 8.6.3, flat list m=16)."""
    qp = jnp.asarray(qp, jnp.int32)
    bd_shift = bit_depth + log2_size - 5
    scale = jnp.asarray(INV_QUANT_SCALES, jnp.int64)[qp % 6] * 16
    shift_up = (qp // 6).astype(jnp.int64)
    c = levels.astype(jnp.int64)
    if qp.ndim:
        bshape = qp.shape + (1, 1)
        scale = scale.reshape(bshape)
        shift_up = shift_up.reshape(bshape)
    d = ((c * scale) << shift_up) + (1 << (bd_shift - 1))
    d = d >> bd_shift
    return jnp.clip(d, -32768, 32767).astype(jnp.int32)


@partial(jax.jit, static_argnames=("log2_size", "bit_depth", "use_dst",
                                   "is_intra"))
def tq_roundtrip(res: jnp.ndarray, qp, log2_size: int, bit_depth: int = 8,
                 use_dst: bool = False, is_intra: bool = True):
    """T -> Q -> IQ -> IT, batched. Returns (levels, recon_residual)."""
    coeffs = fwd_transform(res, log2_size, bit_depth, use_dst)
    levels = quantize(coeffs, qp, log2_size, bit_depth, is_intra)
    deq = dequantize(levels, qp, log2_size, bit_depth)
    recon = inv_transform(deq, log2_size, bit_depth, use_dst)
    return levels, recon


@partial(jax.jit, static_argnames=("log2_size", "bit_depth", "use_dst",
                                   "is_intra"))
def tq_roundtrip_fast(res: jnp.ndarray, qp, log2_size: int,
                      bit_depth: int = 8, use_dst: bool = False,
                      is_intra: bool = True):
    """Search-grade float T/Q/IQ/IT (MXU path). NOT bit-exact: TPU has no
    native s32 matmul/s64 scalar path, so the exact integer pipeline runs
    ~100x slower than f32 on the MXU. The search only needs cost-accurate
    levels/recon (the commit stage re-derives everything exactly), and f32
    keeps >=24-bit precision through every stage here (stage sums < 2^27
    with <= 3 ulp rounding on the largest, far below quantizer step size)."""
    t = _mat(log2_size, use_dst).astype(jnp.float32)
    qp = jnp.asarray(qp, jnp.int32)
    shift1 = log2_size + bit_depth - 9
    shift2 = log2_size + 6
    x = res.astype(jnp.float32)
    tmp = jnp.einsum("kn,...nm->...km", t, x,
                     preferred_element_type=jnp.float32)
    tmp = jnp.floor(tmp * (2.0 ** -shift1) + 0.5)
    coeffs = jnp.einsum("...km,lm->...kl", tmp, t,
                        preferred_element_type=jnp.float32)
    coeffs = jnp.floor(coeffs * (2.0 ** -shift2) + 0.5)
    # quantize (float form of the integer dead-zone quantizer)
    transform_shift = MAX_TR_DYNAMIC_RANGE - bit_depth - log2_size
    qbits = QUANT_SHIFT + qp // 6 + transform_shift
    scale = jnp.asarray(QUANT_SCALES, jnp.float32)[qp % 6]
    f = (171.0 if is_intra else 85.0) / 512.0
    qstep = jnp.exp2(qbits.astype(jnp.float32))
    level = jnp.floor(jnp.abs(coeffs) * scale / qstep + f)
    level = jnp.clip(level, 0.0, 32767.0)
    levels = jnp.sign(coeffs) * level
    # dequantize
    bd_shift = bit_depth + log2_size - 5
    iscale = jnp.asarray(INV_QUANT_SCALES, jnp.float32)[qp % 6] * 16.0
    deq = jnp.floor(levels * iscale * jnp.exp2((qp // 6).astype(jnp.float32))
                    * (2.0 ** -bd_shift) + 0.5)
    deq = jnp.clip(deq, -32768.0, 32767.0)
    # inverse transform
    e = jnp.einsum("nk,...nm->...km", t, deq,
                   preferred_element_type=jnp.float32)
    e = jnp.clip(jnp.floor(e * (2.0 ** -7) + 0.5), -32768, 32767)
    r = jnp.einsum("...km,ml->...kl", e, t,
                   preferred_element_type=jnp.float32)
    r = jnp.clip(jnp.floor(r * (2.0 ** -(20 - bit_depth)) + 0.5),
                 -32768, 32767)
    return levels, r
