"""Device-parallel RDOQ — the TPU-native re-design of the trellis.

Reference parity: HM TComTrQuant::xRateDistOptQuant (SURVEY.md §2.2 C5).
The exact trellis (spec/rdoq.py, mirrored bit-for-bit by the native
slice_engine quantize_rdoq) walks each coding group in decreasing scan
order carrying sequential CABAC-schedule state (sig-slot k, c1
progression, gt2 gate, rice adaptation).  A literal device twin would put
a 16-to-1024-step sequential chain inside every wavefront step and
destroy the wave throughput, so this module re-derives every piece of
that state in closed form from the PROVISIONAL level map (the ceil
quantization m = round(ld >> qbits)) using per-CG reverse cumulative
sums — each wave then costs only elementwise ops and two tiny cumsums:

  * k          = #provisional-nonzeros coded before p in its CG
  * c1         = 0 if any earlier provisional level > 1, else
                 min(1 + #earlier ones, 3)          (exact when the
                 chosen pattern equals the provisional pattern)
  * gt2 gate   = no earlier coeff with (k < 8 and level > 1)
  * rice       = clip(floor(log2 Mprev) - 1, 0, 4), Mprev = running max
                 of earlier provisional levels (the doubling adaptation)
  * ctx_set    = 2*(cg > 0 and luma) + [previous CG had a level > 1]

Rate tables (sig ctx costs per scan position and csbf-neighbor combo,
last-position prefix costs, g1/g2/csbf context costs) are built ONCE per
dispatch from the dynamic slice QP — the context-init affine map of spec
9.3.2.2 evaluated in JAX — so the wave body performs no gathers at all.

The three RDOQ decisions themselves are parallel:
  1. per-coefficient level choice among {0, m, m-1} by D + lambda*R;
  2. coding-group zeroing (not DC / not the last CG) comparing the kept
     cost + csbf(1) against the all-zero cost + csbf(0);
  3. last-position optimization via a suffix-sum over
     (D0 - chosen cost) and an argmin over nonzero candidates — the
     spec's O(n) backward walk expressed as one cumsum.

Output differs from the exact trellis only through the closed-form
context schedule (encoder freedom; conformance and SDH parity are
unaffected — the caller applies the SDH adjust after RDOQ).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..spec.residual import (SCAN_VER, _last_prefix_suffix, get_scan,
                             last_ctx_params, sig_ctx_inc)
from ..spec.tables import CTX_INIT, FRAC_BITS

_HI = jax.lax.Precision.HIGHEST


# ---------------------------------------------------------------------------
# Static (numpy) index/weight tables per (c_idx, log2_size)
# ---------------------------------------------------------------------------

def _n_scans(lg: int, c_idx: int) -> int:
    return 3 if (lg == 2 or (lg == 3 and c_idx == 0)) else 1


@lru_cache(maxsize=None)
def _static_tabs(lg: int, c_idx: int):
    """Scan-order static tables: sig ctx indices [S,2,2,nn], last-prefix
    bin-count matrices W1/W0 [S,nn,18] + bypass counts [S,nn], CG spatial
    neighbor matrices R/B [S,g,g] (right/below csbf routing)."""
    n = 1 << lg
    nn = n * n
    g = max(1, nn // 16)
    S = _n_scans(lg, c_idx)
    sig_idx = np.zeros((S, 2, 2, nn), np.int32)
    w1 = np.zeros((S, nn, 18), np.float32)
    w0 = np.zeros((S, nn, 18), np.float32)
    byp = np.zeros((S, nn), np.float32)
    rmat = np.zeros((S, g, g), np.float32)
    bmat = np.zeros((S, g, g), np.float32)
    g_max = (lg << 1) - 1
    offset, shift = last_ctx_params(lg, c_idx)
    nsb = max(1, n // 4)
    for s in range(S):
        scan = get_scan(lg, s)
        cg_of = {}
        for p in range(nn):
            x, y = int(scan[p, 0]), int(scan[p, 1])
            for r in (0, 1):
                for b in (0, 1):
                    sig_idx[s, r, b, p] = sig_ctx_inc(lg, c_idx, x, y, s,
                                                      r, b)
            # last-position prefix cost of last == p (ver scan swaps x/y)
            lx, ly = (y, x) if s == SCAN_VER else (x, y)
            for pos in (lx, ly):
                pfx, _sfx, slen = _last_prefix_suffix(pos)
                for i in range(pfx):
                    w1[s, p, offset + (i >> shift)] += 1.0
                if pfx < g_max:
                    w0[s, p, offset + (pfx >> shift)] += 1.0
                if pfx > 3:
                    byp[s, p] += slen
            if lg > 2:
                cg_of[(x >> 2, y >> 2)] = p >> 4
        if lg > 2:
            for (sx, sy), ci in cg_of.items():
                if (sx + 1, sy) in cg_of:
                    rmat[s, ci, cg_of[(sx + 1, sy)]] = 1.0
                if (sx, sy + 1) in cg_of:
                    bmat[s, ci, cg_of[(sx, sy + 1)]] = 1.0
    return sig_idx, w1, w0, byp, rmat, bmat


# ---------------------------------------------------------------------------
# Per-dispatch rate tables from the dynamic slice QP
# ---------------------------------------------------------------------------

def _ctx_bit_costs(init_vals, slice_qp):
    """[K, 2] float32 bit-costs (bin 0 / bin 1) of contexts at their
    slice-start states (spec 9.3.2.2 init + FRAC_BITS entropy model)."""
    iv = jnp.asarray(np.asarray(init_vals, np.int32))
    slope = (iv >> 4) * 5 - 45
    offs = ((iv & 15) << 3) - 16
    q = jnp.clip(slice_qp, 0, 51).astype(jnp.int32)
    pre = jnp.clip(((slope * q) >> 4) + offs, 1, 126)
    state = jnp.where(pre <= 63, 63 - pre, pre - 64)
    mps = (pre > 63).astype(jnp.int32)
    fb = jnp.asarray(np.asarray(FRAC_BITS, np.float32) / 32768.0)
    c_mps = fb[state, 0]
    c_lps = fb[state, 1]
    cost0 = jnp.where(mps == 0, c_mps, c_lps)
    cost1 = jnp.where(mps == 1, c_mps, c_lps)
    return jnp.stack([cost0, cost1], axis=-1)


def build_rdoq_tables(slice_qp, qp_y, qp_c, lam, init_type: int,
                      bit_depth: int, lgs_luma=(3, 4, 5),
                      lgs_chroma=(2, 3, 4)):
    """All rate/quant tables for one dispatch.  slice_qp/qp_y/qp_c are
    dynamic int32 scalars, lam the pixel-SSE lambda (dynamic float).
    Costs are pre-multiplied by lambda: tables hold lambda*bits."""
    lam = jnp.asarray(lam, jnp.float32)
    sig_c = _ctx_bit_costs(CTX_INIT["sig_coeff_flag"][init_type], slice_qp)
    g1_c = _ctx_bit_costs(CTX_INIT["coeff_abs_level_greater1_flag"]
                          [init_type], slice_qp)
    g2_c = _ctx_bit_costs(CTX_INIT["coeff_abs_level_greater2_flag"]
                          [init_type], slice_qp)
    csb_c = _ctx_bit_costs(CTX_INIT["coded_sub_block_flag"][init_type],
                           slice_qp)
    last_c = _ctx_bit_costs(CTX_INIT["last_sig_coeff_prefix"][init_type],
                            slice_qp)
    from ..spec.tables import QUANT_SCALES
    qsc = jnp.asarray(np.asarray(QUANT_SCALES, np.int32))

    out = {"lam": lam}
    for c_idx, lgs, qp in ((0, lgs_luma, qp_y), (1, lgs_chroma, qp_c)):
        qp = jnp.asarray(qp, jnp.int32)
        # g1 ctx = 16*c + 4*ctx_set + c1 -> [ctx_set, c1, bin]
        base = 16 * c_idx
        g1 = lam * jnp.stack(
            [jnp.stack([g1_c[base + 4 * s + c1] for c1 in range(4)])
             for s in range(4 if c_idx == 0 else 2)])
        g2 = lam * jnp.stack([g2_c[4 * c_idx + s]
                              for s in range(4 if c_idx == 0 else 2)])
        csb = lam * jnp.stack([csb_c[2 * c_idx + i] for i in range(2)])
        for lg in lgs:
            sig_idx, w1, w0, byp, rmat, bmat = _static_tabs(lg, c_idx)
            sig = lam * sig_c[sig_idx]          # [S,2,2,nn,2]
            last = lam * (jnp.einsum("spk,k->sp", jnp.asarray(w1),
                                     last_c[:, 1], precision=_HI)
                          + jnp.einsum("spk,k->sp", jnp.asarray(w0),
                                       last_c[:, 0], precision=_HI)
                          + jnp.asarray(byp))   # [S,nn]
            tshift = 15 - bit_depth - lg
            qbits = 14 + qp // 6 + tshift
            q_scale = qsc[qp % 6]
            err_scale = 1.0 / (q_scale.astype(jnp.float32) ** 2
                               * float(1 << (2 * tshift)))
            out[(c_idx, lg)] = dict(
                sig=sig, last=last, g1=g1, g2=g2, csb=csb,
                rmat=jnp.asarray(rmat), bmat=jnp.asarray(bmat),
                qbits=qbits, q_scale=q_scale, err_scale=err_scale,
                lam=lam)
    return out


# ---------------------------------------------------------------------------
# The parallel trellis
# ---------------------------------------------------------------------------

def _rev_excl_cumsum(x):
    """Per-CG reverse exclusive cumsum along the last (16) axis: the sum
    over positions coded BEFORE each slot (higher scan index)."""
    rc = jnp.cumsum(x[..., ::-1], axis=-1)[..., ::-1]
    return rc - x


def _rem_bits(v, rice):
    """coeff_abs_level_remaining bit count (9.3.3.9), vectorized.
    v, rice: int32 arrays; returns float32 bits."""
    v = jnp.maximum(v, 0)
    thresh = 3 << rice
    small = ((v >> rice) + 1 + rice).astype(jnp.float32)
    u = jnp.maximum(v - thresh, 0)
    k = 31 - jax.lax.clz((u >> rice) + 1)
    large = (4 + 2 * k + rice).astype(jnp.float32)
    return jnp.where(v < thresh, small, large)


def rdoq_device(coeffs, scan_oh, perm, tabs, lg: int, c_idx: int):
    """RDO-quantize a batch of transform blocks on device (raster in/out
    convenience wrapper over rdoq_scan; the commit kernel calls
    rdoq_scan directly to share one scan-domain round trip with SDH).

    coeffs: [A, n, n] int32 raster; scan_oh: [A, S] float one-hot scan
    select; perm: [S, nn, nn] static permutation matrices (the same
    matrix maps raster->scan as "bk,sjk,bs->bj" and back as
    "bj,sjk,bs->bk"); tabs: build_rdoq_tables()[(c_idx, lg)].
    Returns levels [A, n, n] int32 (signed, raster order)."""
    n = 1 << lg
    nn = n * n
    a_n = coeffs.shape[0]
    cf = coeffs.reshape(a_n, nn).astype(jnp.float32)
    c_s = jnp.einsum("bk,sjk,bs->bj", cf, perm, scan_oh,
                     precision=_HI).astype(jnp.int32)
    lvl = rdoq_scan(c_s, scan_oh, tabs, lg, c_idx)
    out = jnp.einsum("bj,sjk,bs->bk", lvl.astype(jnp.float32), perm,
                     scan_oh, precision=_HI).astype(jnp.int32)
    return out.reshape(a_n, n, n)


def rdoq_scan(c_s, scan_oh, tabs, lg: int, c_idx: int):
    """The parallel trellis on SCAN-ORDERED coefficients.

    c_s: [A, nn] int32 (signed, scan order); scan_oh: [A, S] float
    one-hot scan select (ignored when the size has one scan); tabs:
    build_rdoq_tables()[(c_idx, lg)].  Returns signed levels [A, nn]
    in scan order.  All selects are elementwise (no gathers): the
    csbf-neighbor routing is a tiny static matmul, the sig-cost choice
    a bilinear blend over the 4 (right, below) combos, and the context
    schedule closed-form per-CG cumsums (module docstring)."""
    a_n, nn = c_s.shape
    g = max(1, nn // 16)
    cg = min(16, nn)
    lam = tabs["lam"]
    n_scans = tabs["sig"].shape[0]

    sgn = jnp.sign(c_s)
    a = jnp.abs(c_s)
    ld = a * tabs["q_scale"]                       # < 2^31
    qbits = tabs["qbits"]
    m = jnp.minimum((ld + (1 << (qbits - 1))) >> qbits, 32767)
    ldf = ld.astype(jnp.float32)
    d0 = ldf * ldf * tabs["err_scale"]

    # --- closed-form context schedule from the provisional map ----------
    mg = m.reshape(a_n, g, cg)
    nz = (mg > 0).astype(jnp.int32)
    gt1 = (mg > 1).astype(jnp.int32)
    k = _rev_excl_cumsum(nz)
    c1 = jnp.where(_rev_excl_cumsum(gt1) > 0, 0,
                   jnp.minimum(1 + _rev_excl_cumsum((mg == 1)
                                                    .astype(jnp.int32)), 3))
    gt2_open = _rev_excl_cumsum(gt1 * (k < 8)) == 0
    rc_max = jax.lax.cummax(mg[..., ::-1], axis=mg.ndim - 1)[..., ::-1]
    # exclusive reverse cummax: shift left by one along the scan axis
    mprev = jnp.concatenate([rc_max[..., 1:],
                             jnp.zeros((a_n, g, 1), mg.dtype)], axis=-1)
    rice = jnp.clip(31 - jax.lax.clz(jnp.maximum(mprev, 1)) - 1, 0, 4)

    has_gt1 = jnp.any(gt1 > 0, axis=-1).astype(jnp.int32)  # [A,g]
    prev_gt1 = jnp.concatenate([has_gt1[:, 1:],
                                jnp.zeros((a_n, 1), jnp.int32)], axis=1)
    n_sets = 4 if c_idx == 0 else 2
    if c_idx == 0 and g > 1:
        cs = 2 * (jnp.arange(g) > 0).astype(jnp.int32)[None, :] + prev_gt1
    else:
        cs = prev_gt1
    cs = jnp.clip(cs, 0, n_sets - 1)

    def sel_cs(vec):                               # [S] by cs -> [A,g]
        out = jnp.zeros(cs.shape, jnp.float32)
        for si in range(n_sets):
            out = out + jnp.where(cs == si, vec[si], 0.0)
        return out

    g2_0 = sel_cs(tabs["g2"][:, 0])                # [A,g]
    g2_1 = sel_cs(tabs["g2"][:, 1])
    # g1 cost by (ctx_set per CG, c1 per coeff): two-level select
    g1b = tabs["g1"]                               # [S,4,2]
    g1_0 = jnp.zeros(c1.shape, jnp.float32)        # [A,g,16]
    g1_1 = jnp.zeros(c1.shape, jnp.float32)
    for si in range(n_sets):
        m_s = (cs == si)[..., None]
        for cv in range(4):
            mk = m_s & (c1 == cv)
            g1_0 = g1_0 + jnp.where(mk, g1b[si, cv, 0], 0.0)
            g1_1 = g1_1 + jnp.where(mk, g1b[si, cv, 1], 0.0)

    # --- sig-flag costs per position -------------------------------------
    csbf_prov = jnp.any(nz > 0, axis=-1).astype(jnp.float32)   # [A,g]
    if n_scans == 1:
        right = jnp.dot(csbf_prov, tabs["rmat"][0].T, precision=_HI)
        below = jnp.dot(csbf_prov, tabs["bmat"][0].T, precision=_HI)
        sig = tabs["sig"][0]                       # [2,2,nn,2]
    else:
        right = jnp.einsum("ag,sgh,as->ah", csbf_prov, tabs["rmat"],
                           scan_oh, precision=_HI)
        below = jnp.einsum("ag,sgh,as->ah", csbf_prov, tabs["bmat"],
                           scan_oh, precision=_HI)
        sig = jnp.einsum("as,srbpt->arbpt", scan_oh, tabs["sig"],
                         precision=_HI)            # [A,2,2,nn,2]
    r_b = jnp.repeat((right > 0.5).astype(jnp.float32)[..., None],
                     cg, -1).reshape(a_n, nn)
    b_b = jnp.repeat((below > 0.5).astype(jnp.float32)[..., None],
                     cg, -1).reshape(a_n, nn)

    def sig_cost(b):                               # bilinear over (r, b)
        t00 = sig[..., 0, 0, :, b]
        t01 = sig[..., 0, 1, :, b]
        t10 = sig[..., 1, 0, :, b]
        t11 = sig[..., 1, 1, :, b]
        return (t00 + r_b * (t10 - t00) + b_b * (t01 - t00)
                + r_b * b_b * (t11 - t10 - t01 + t00))

    s0 = sig_cost(0)                               # [A,nn]
    s1 = sig_cost(1)

    # --- per-coefficient level choice ------------------------------------
    kf = k.reshape(a_n, nn)
    g1_0f = g1_0.reshape(a_n, nn)
    g1_1f = g1_1.reshape(a_n, nn)
    g2_0f = jnp.repeat(g2_0[..., None], cg, -1).reshape(a_n, nn)
    g2_1f = jnp.repeat(g2_1[..., None], cg, -1).reshape(a_n, nn)
    gt2f = gt2_open.reshape(a_n, nn)
    ricef = rice.reshape(a_n, nn)

    def level_cost(l):                             # l: [A,nn] int32 (>0)
        e = ldf - l.astype(jnp.float32) * jnp.exp2(
            qbits.astype(jnp.float32))
        d = e * e * tabs["err_scale"]
        rem2 = lam * _rem_bits(l - 2, ricef)
        rem3 = lam * _rem_bits(l - 3, ricef)
        rem1 = lam * _rem_bits(l - 1, ricef)
        in_slot = kf < 8
        r_gt1 = g1_1f + jnp.where(
            gt2f, jnp.where(l > 2, g2_1f + rem3, g2_0f), rem2)
        r_ctx = jnp.where(l > 1, r_gt1, g1_0f)
        r = lam + jnp.where(in_slot, r_ctx, rem1)  # lam = sign bypass bit
        return d + s1 + r

    cost0 = d0 + s0
    cost_m = jnp.where(m > 0, level_cost(jnp.maximum(m, 1)), jnp.inf)
    m1 = jnp.maximum(m - 1, 1)
    cost_m1 = jnp.where(m > 1, level_cost(m1), jnp.inf)
    lvl = jnp.where((cost_m <= cost0) & (cost_m <= cost_m1), m,
                    jnp.where(cost_m1 <= cost0, m1, 0))
    cost_lv = jnp.minimum(cost0, jnp.minimum(cost_m, cost_m1))

    pos = jnp.arange(nn)[None, :]
    nz_any = jnp.any(m > 0, axis=-1)
    last_init = jnp.where(
        nz_any, nn - 1 - jnp.argmax((m > 0)[:, ::-1], axis=-1), -1)
    valid = pos <= last_init[:, None]
    lvl = jnp.where(valid, lvl, 0)
    cost_lv = jnp.where(valid, cost_lv, 0.0)
    cost_z = jnp.where(valid, d0, 0.0)

    # --- coding-group zeroing (not DC, not the provisional last CG) ------
    if g > 1:
        keep_g = jnp.sum(cost_lv.reshape(a_n, g, cg), axis=-1)
        zero_g = jnp.sum(cost_z.reshape(a_n, g, cg), axis=-1)
        cinc = jnp.minimum(right + below, 1.0)
        csb = tabs["csb"]                          # [2,2]
        b0 = (1 - cinc) * csb[0, 0] + cinc * csb[1, 0]
        b1 = (1 - cinc) * csb[0, 1] + cinc * csb[1, 1]
        gi = jnp.arange(g)[None, :]
        last_cg = last_init[:, None] >> 4
        zeroable = (gi > 0) & (gi < last_cg)
        kill = zeroable & (zero_g + b0 < keep_g + b1)
        killf = jnp.repeat(kill[..., None], cg, -1).reshape(a_n, nn)
        lvl = jnp.where(killf, 0, lvl)
        cost_lv = jnp.where(killf, cost_z, cost_lv)

    # --- last-position optimization (suffix-sum + argmin) ----------------
    nzl = lvl > 0
    any_l = jnp.any(nzl, axis=-1)
    old_last = jnp.where(
        any_l, nn - 1 - jnp.argmax(nzl[:, ::-1], axis=-1), -1)
    in_range = pos <= old_last[:, None]
    diff = jnp.where(in_range, cost_z - cost_lv, 0.0)
    incl = jnp.cumsum(diff, axis=-1)
    suff = (incl[:, -1:] - incl)                   # sum over q > p
    if n_scans == 1:
        last_tab = tabs["last"][0][None, :]
    else:
        last_tab = jnp.einsum("as,sp->ap", scan_oh, tabs["last"],
                              precision=_HI)
    total = suff + last_tab - s1
    total = jnp.where(nzl, total, jnp.inf)
    new_last = jnp.argmin(total, axis=-1)
    lvl = jnp.where(pos <= new_last[:, None], lvl, 0)
    lvl = jnp.where(any_l[:, None], lvl, 0)
    return lvl * sgn
