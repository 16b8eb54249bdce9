"""Batched frame-level RDO search (JAX, TPU) — the P5 "batched candidate
search" from SURVEY.md §2.4.

One jit call evaluates, for EVERY aligned block of every CU size in the
frame, all 35 intra modes (prediction + SATD + rate proxy), then a bottom-up
quadtree dynamic program picks split/no-split per node. This replaces HM's
recursive xCompressCU (SURVEY.md §3.1 hot loop #1) with dense tensor ops.

Search-stage approximations (the commit stage is exact, so these affect RD
quality only, not conformance):
  * references are source pixels, not reconstructions;
  * intra mode rate is MPM-aware but uses same-size grid neighbors as the
    MPM proxy (the exact decode-order MPM depends on the final partition);
  * distortion proxy is SATD for mode choice (HM's own RMD uses the same),
    true transform-domain SSE for the partition DP.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.cost import level_rate_proxy, satd, sse
from ..ops.intra import grid_refs, predict_all_modes
from ..ops.transform import tq_roundtrip_fast as tq_roundtrip


def _blocks(plane: jnp.ndarray, n: int) -> jnp.ndarray:
    """[H, W] -> [H/n * W/n, n, n] in block raster order."""
    h, w = plane.shape
    return (plane.reshape(h // n, n, w // n, n)
            .transpose(0, 2, 1, 3)
            .reshape(-1, n, n))


# Per-CU overhead proxies (bits): cbf luma + 2x chroma cbf + chroma mode
# bin + pred/part flags; split flag ~1 bit. Intra mode bits are counted
# separately (MPM-aware, _intra_mode_bits).
CU_OVERHEAD_BITS = 3.0
SPLIT_FLAG_BITS = 1.0
# mvp flag + merge-ish overhead for an inter leaf
INTER_OVERHEAD_BITS = 2.0


def _mv_rate_bits(mv: jnp.ndarray) -> jnp.ndarray:
    """MVD rate proxy (bits) from quarter-pel magnitude."""
    mag = (jnp.abs(mv[:, 0]) + jnp.abs(mv[:, 1])).astype(jnp.float32)
    return 4.0 + 2.0 * jnp.log2(1.0 + mag)


def _neighbor_mvs(mv: jnp.ndarray, gy: int, gx: int, edge_col: int = 0,
                  edge_on=None):
    """Left and top same-size-grid neighbor fields ([B, C] each, zero at
    the frame edge) — the search-stage stand-ins for merge candidates
    A1/B1.  C is arbitrary (2 for bare MVs; 3 when a ref-idx channel
    rides along so a merge winner adopts the neighbor's reference).

    edge_col/edge_on: grid column that is the TRUE picture left edge on
    halo-extended tile shards (same mechanism as _intra_mode_bits) — the
    zero left-candidate must appear at the same place the full-frame
    search puts it, or sharded byte-identity breaks."""
    c = mv.shape[-1]
    m = mv.reshape(gy, gx, c)
    left = jnp.concatenate([jnp.zeros((gy, 1, c), mv.dtype), m[:, :-1]], 1)
    if edge_col:
        cond = (jnp.arange(gx) == edge_col)[None, :, None]
        if edge_on is not None:
            cond = cond & edge_on
        left = jnp.where(cond, jnp.asarray(0, mv.dtype), left)
    top = jnp.concatenate([jnp.zeros((1, gx, c), mv.dtype), m[:-1, :]], 0)
    return left.reshape(-1, c), top.reshape(-1, c)


def _intra_mode_bits(best_mode: jnp.ndarray, gy: int, gx: int,
                     edge_col: int = 0, edge_on=None):
    """MPM-aware per-mode rate [B, 35] from provisional neighbor modes.

    best_mode: [B] provisional (SATD-best) mode per block at this size,
    raster order. MPM list per spec 8.4.2 using the same-size left/above
    neighbors (DC when unavailable); rate = 2 bits for MPM0, 3 for
    MPM1/2, 6 (flag + 5 fixed) for the rest — the HM binarization.

    edge_col: grid column that is the TRUE picture left edge (non-zero on
    halo-extended tile shards, where column 0 is replicated halo — the
    sharded search must apply the unavailable-neighbor filler at the same
    place the full-frame search does, or byte-identity breaks)."""
    m = best_mode.reshape(gy, gx)
    cand_a = jnp.concatenate([jnp.full((gy, 1), 1, m.dtype), m[:, :-1]], 1)
    if edge_col:
        cond = jnp.arange(gx)[None, :] == edge_col
        if edge_on is not None:
            cond = cond & edge_on  # only the shard holding the frame edge
        cand_a = jnp.where(cond, jnp.asarray(1, m.dtype), cand_a)
    cand_b = jnp.concatenate([jnp.full((1, gx), 1, m.dtype), m[:-1, :]], 0)
    eq = cand_a == cand_b
    lt2 = cand_a < 2
    mpm0 = jnp.where(eq & lt2, 0, cand_a)
    mpm1 = jnp.where(eq, jnp.where(lt2, 1, 2 + ((cand_a + 29) % 32)),
                     cand_b)
    third = jnp.where((cand_a != 0) & (cand_b != 0), 0,
                      jnp.where((cand_a != 1) & (cand_b != 1), 1, 26))
    mpm2 = jnp.where(eq, jnp.where(lt2, 26, 2 + ((cand_a - 1) % 32)),
                     third)
    modes = jnp.arange(35, dtype=m.dtype)
    is0 = modes[None, None, :] == mpm0[..., None]
    is12 = ((modes[None, None, :] == mpm1[..., None])
            | (modes[None, None, :] == mpm2[..., None]))
    bits = jnp.where(is0, 2.0, jnp.where(is12, 3.0, 6.0))
    return bits.reshape(-1, 35)


@partial(jax.jit, static_argnames=("log2_ctu", "log2_min_cu",
                                   "mpm_edge_x", "rd_cands"))
def search_intra_frame(y_plane: jnp.ndarray, lambda_sqrt: jnp.ndarray,
                       log2_ctu: int = 5, log2_min_cu: int = 3,
                       cb_plane=None, cr_plane=None, mpm_edge_x: int = 0,
                       mpm_edge_on=None, rd_cands: int = 3,
                       ref_y=None, ref_cb=None, ref_cr=None):
    """Decide the CU quadtree + luma mode for every CTU of a frame.

    y_plane: [H, W] int32 luma (coded dims, multiples of CTU).
    lambda_sqrt: scalar f32, sqrt of the RD lambda (SATD domain).
    ref_y/ref_cb/ref_cr: optional RECONSTRUCTION planes used for the
    intra reference samples (the recon-reference two-pass search,
    SURVEY.md §7.3.3): prediction references come from these while
    distortion stays against the source.  None = source-pixel refs.

    Two-stage per block size: (1) SATD over all 35 modes picks the mode;
    (2) the chosen mode's residual goes through the real T/Q/IQ/IT
    pipeline, giving true distortion (SSE) + a CABAC level-rate proxy.
    The quadtree DP then compares commensurable D+lambda*R costs across
    sizes (SATD alone misbalances large-vs-small blocks).

    Returns dict of per-depth arrays (block raster order at each size):
      mode{n}:  [B_n] best mode per n-block
      cost{n}:  [B_n] DP cost per n-block (after considering splits)
      split{n}: [B_n] bool, split decision at that node (n > min size)
      rawcost{n}: [B_n] per-block leaf cost before the DP
    """
    h, w = y_plane.shape
    sizes = [1 << lg for lg in range(log2_min_cu, log2_ctu + 1)]
    lam = lambda_sqrt * lambda_sqrt  # SSE-domain lambda
    # jax.named_scope markers make the profiler trace readable (aux 5.1)
    qp = 12.0 + 3.0 * jnp.log2(lam / 0.57)  # invert lambda(qp)
    qp_i = jnp.clip(jnp.round(qp), 0, 51).astype(jnp.int32)
    modes, costs = {}, {}
    for n in sizes:
        lg = n.bit_length() - 1
        # Intra prediction tops out at 32: for 64 use the 32 tables on the
        # top-left quadrant as mode proxy (commit re-derives exactly).
        pn = min(n, 32)
        plg = pn.bit_length() - 1
        top, left = grid_refs(y_plane if ref_y is None else ref_y, n)
        if pn != n:
            top = top[:, :2 * pn + 1]
            left = left[:, :2 * pn + 1]
        with jax.named_scope(f"intra_rmd_{n}"):
            preds = predict_all_modes(top, left, plg, True)  # [B,35,pn,pn]
            src = _blocks(y_plane, n)[:, :pn, :pn]
            d = satd(src[:, None] - preds)                   # [B,35]
        # two-pass MPM-aware mode rate: provisional SATD-best modes give
        # the neighbor context, then the final pick charges real mode bits
        prov = jnp.argmin(d, axis=1).astype(jnp.int32)
        mode_bits = _intra_mode_bits(prov, h // n, w // n,
                                     mpm_edge_x // n,
                                     mpm_edge_on)           # [B,35]
        cost_rmd = d.astype(jnp.float32) + lambda_sqrt * mode_bits
        # stage 2: true RD over the RMD top-k shortlist (HM keeps 3-8
        # full-RD candidates; SATD-best alone is frequently not RD-best).
        # k = cfg.num_intra_rd_candidates (SURVEY.md E7 RMD shortlist).
        k = max(1, min(rd_cands, 35))
        b = src.shape[0]
        with jax.named_scope(f"intra_rd_{n}"):
            _, top_idx = jax.lax.top_k(-cost_rmd, k)         # [B,k]
            # one-hot contraction instead of take_along_axis: per-element
            # gathers are VPU-serial on TPU, the einsum rides the MXU
            onehot = jax.nn.one_hot(top_idx, 35, dtype=jnp.float32)
            cands = jnp.einsum("bkm,bmyx->bkyx", onehot,
                               preds.astype(jnp.float32),
                               preferred_element_type=jnp.float32
                               ).astype(jnp.int32)
            res = src[:, None] - cands                        # [B,k,pn,pn]
            levels, rq = tq_roundtrip(res.reshape(b * k, pn, pn), qp_i,
                                      plg)
            dist = sse(res.reshape(b * k, pn, pn),
                       rq).astype(jnp.float32).reshape(b, k)
            rate = level_rate_proxy(levels).reshape(b, k)
            cand_bits = jnp.sum(onehot * mode_bits[:, None, :], axis=2)
            rd_k = dist + lam * (rate + cand_bits)            # [B,k]
            kbest = jnp.argmin(rd_k, axis=1)
            ksel = jax.nn.one_hot(kbest, k, dtype=jnp.float32)
            best_mode = jnp.sum(
                ksel * top_idx.astype(jnp.float32), axis=1).astype(jnp.int32)
            dist = jnp.sum(ksel * dist, axis=1)
            rate = jnp.sum(ksel * rate, axis=1)
            sel_bits = jnp.sum(ksel * cand_bits, axis=1)
        modes[n] = best_mode
        scale = 4.0 if pn != n else 1.0  # quadrant proxy for 64-blocks
        cost_n = dist + lam * (rate + sel_bits)
        if cb_plane is not None and pn == n:
            # chroma DM cost (both planes): the partition DP otherwise
            # ignores ~1/3 of the coded samples and over-splits flat-
            # chroma regions
            from ..ops.intra import predict_selected
            cn = pn // 2
            clg = cn.bit_length() - 1
            for cp, rcp in ((cb_plane, ref_cb), (cr_plane, ref_cr)):
                ctop, cleft = grid_refs(cp if rcp is None else rcp, cn)
                cpred = predict_selected(ctop, cleft, clg, best_mode,
                                         is_luma=False)
                cres = _blocks(cp, cn) - cpred
                clv, crq = tq_roundtrip(cres, qp_i, clg)
                cost_n = cost_n + (sse(cres, crq).astype(jnp.float32)
                                   + lam * level_rate_proxy(clv))
        costs[n] = scale * cost_n
    raw_costs = dict(costs)  # per-block costs before the DP (P search uses)

    # Quadtree DP bottom-up; leaf/split overheads are bit proxies of the
    # actual CU syntax (CU_OVERHEAD_BITS / SPLIT_FLAG_BITS).
    out = {}
    dp = costs[sizes[0]] + lam * CU_OVERHEAD_BITS
    out[f"mode{sizes[0]}"] = modes[sizes[0]]
    for n in sizes[1:]:
        gy, gx = h // n, w // n
        child = dp.reshape(gy, 2, gx, 2)  # children in 2x2 groups
        sum_child = child.sum(axis=(1, 3)).reshape(-1)
        self_cost = costs[n] + lam * CU_OVERHEAD_BITS
        split = sum_child + lam * SPLIT_FLAG_BITS < self_cost
        dp = jnp.where(split, sum_child + lam * SPLIT_FLAG_BITS, self_cost)
        out[f"mode{n}"] = modes[n]
        out[f"split{n}"] = split
        out[f"cost{n}"] = dp
    for n, c in raw_costs.items():
        out[f"rawcost{n}"] = c
    return out


@partial(jax.jit, static_argnames=("log2_ctu", "log2_min_cu",
                                   "search_range", "rd_cands",
                                   "mpm_edge_x"))
def search_p_frame(y_plane: jnp.ndarray, ref_plane: jnp.ndarray,
                   lambda_sqrt: jnp.ndarray, log2_ctu: int = 5,
                   log2_min_cu: int = 3, search_range: int = 8,
                   rd_cands: int = 3, cb_plane=None, cr_plane=None,
                   mpm_edge_x: int = 0, mpm_edge_on=None,
                   refb_plane=None, nref=None):
    """P-frame search: intra + inter candidates for every block over up
    to 2 active L0 references, then the quadtree DP over the per-block
    minimum.

    Adds to the intra outputs: inter{n} (bool: inter chosen), mv{n}
    ([B_n, 2] quarter-pel) and ref{n} ([B_n] ref idx).
    """
    from ..ops.me import (mc_raw_from_state_sel, me_state,
                          subpel_from_state)

    h, w = y_plane.shape
    sizes = [1 << lg for lg in range(log2_min_cu, log2_ctu + 1)]
    lam = lambda_sqrt * lambda_sqrt
    qp = 12.0 + 3.0 * jnp.log2(lam / 0.57)
    qp_i = jnp.clip(jnp.round(qp), 0, 51).astype(jnp.int32)
    multi = refb_plane is not None
    if nref is None:
        nref = jnp.int32(2 if multi else 1)
    intra_dec = search_intra_frame(y_plane, lambda_sqrt, log2_ctu,
                                   log2_min_cu, cb_plane, cr_plane,
                                   mpm_edge_x, mpm_edge_on,
                                   rd_cands=rd_cands)
    st = me_state(y_plane,
                  [ref_plane, refb_plane] if multi else [ref_plane],
                  search_range, max_size=1 << log2_ctu)
    sp = subpel_from_state(st, lambda_sqrt)
    ib = 1 if multi else 0

    def inter_rd(n, pred, rate_bits):
        """True-RD leaf cost on the exact sub-pel prediction residual."""
        res = _blocks(y_plane, n) - pred
        pn = min(n, 32)
        res = res[:, :pn, :pn]
        levels, rq = tq_roundtrip(res, qp_i, pn.bit_length() - 1,
                                  is_intra=False)
        dist = sse(res, rq).astype(jnp.float32)
        rate = level_rate_proxy(levels)
        scale = 4.0 if pn != n else 1.0
        return scale * (dist + lam * (rate + rate_bits
                                      + INTER_OVERHEAD_BITS))

    from ..ops.cost import satd as satd_blocks

    out = {}
    dp = None
    for i, n in enumerate(sizes):
        ca = sp[n][0][0]
        if multi:
            cb = jnp.where(nref > 1, sp[n][0][1], jnp.inf)
            sel = cb < ca
            me_cost = jnp.minimum(ca, cb)
            mv = jnp.where(sel[:, None], sp[n][1][1], sp[n][1][0])
            pred = jnp.where(sel[:, None, None], sp[n][2][1],
                             sp[n][2][0])
        else:
            sel = jnp.zeros(ca.shape, bool)
            me_cost, mv, pred = ca, sp[n][1][0], sp[n][2][0]
        ridx = sel.astype(jnp.int32)
        src_b = _blocks(y_plane, n)
        # merge-style candidates: the same-size left/top neighbors'
        # (MV, ref) at ~2 bits (merge_idx) — steers the field toward
        # coherent motion the exact commit then codes as merge/skip (HM
        # merge estimation, SURVEY.md E7).  Candidate choice runs in the
        # SATD domain (the same criterion the subpel search used); only
        # the WINNER pays the full transform round-trip.
        rate_bits = _mv_rate_bits(mv)
        sel_cost = me_cost
        field = jnp.concatenate([mv, ridx[:, None]], axis=1)
        for cand in _neighbor_mvs(field, h // n, w // n, mpm_edge_x // n,
                                  mpm_edge_on):
            cmv = cand[:, :2]
            cref = cand[:, 2]
            raw_c, valid = mc_raw_from_state_sel(st, 0, ib, cref > 0, n,
                                                 cmv)
            predc = jnp.clip((raw_c + 32) >> 6, 0, 255)
            costc = jnp.where(
                valid,
                satd_blocks(src_b - predc).astype(jnp.float32)
                + lambda_sqrt * 2.0, jnp.inf)
            better = costc < sel_cost
            sel_cost = jnp.where(better, costc, sel_cost)
            mv = jnp.where(better[:, None], cmv, mv)
            ridx = jnp.where(better, cref, ridx)
            pred = jnp.where(better[:, None, None], predc, pred)
            rate_bits = jnp.where(better, 2.0, rate_bits)
        icost = inter_rd(n, pred, rate_bits)
        raw_intra = intra_dec[f"rawcost{n}"]
        use_inter = icost < raw_intra
        leaf = (jnp.minimum(icost, raw_intra)
                + lam * CU_OVERHEAD_BITS)
        out[f"mode{n}"] = intra_dec[f"mode{n}"]
        out[f"mv{n}"] = mv
        out[f"ref{n}"] = ridx
        out[f"inter{n}"] = use_inter
        if i == 0:
            dp = leaf
            continue
        gy, gx = h // n, w // n
        child = dp.reshape(gy, 2, gx, 2)
        sum_child = child.sum(axis=(1, 3)).reshape(-1)
        split = sum_child + lam * SPLIT_FLAG_BITS < leaf
        dp = jnp.where(split, sum_child + lam * SPLIT_FLAG_BITS, leaf)
        out[f"split{n}"] = split
    return out


@partial(jax.jit, static_argnames=("log2_ctu", "log2_min_cu",
                                   "search_range", "rd_cands",
                                   "mpm_edge_x"))
def search_b_frame(y_plane: jnp.ndarray, ref0_plane: jnp.ndarray,
                   ref1_plane: jnp.ndarray, lambda_sqrt: jnp.ndarray,
                   log2_ctu: int = 5, log2_min_cu: int = 3,
                   search_range: int = 8, rd_cands: int = 3,
                   ref0b_plane=None, ref1b_plane=None,
                   nref0=None, nref1=None, cb_plane=None, cr_plane=None,
                   mpm_edge_x: int = 0, mpm_edge_on=None):
    """B-frame search: intra + L0 + L1 + BI candidates per block, over up
    to 2 active references per list (SURVEY.md E7 multi-ref).

    ref0b/ref1b: optional second reference per list (pass the first ref
    again when absent and mask via nref0/nref1 — traced scalars so batch
    shapes stay fixed).  Adds to the intra outputs: inter{n}, dir{n}
    (1/2/3), mv0{n}, mv1{n}, ref0{n}, ref1{n}.  BI is costed with the
    EXACT 14-bit two-list average (spec 8.5.4.3.5).
    """
    from ..ops.me import (mc_raw_from_state_sel, me_state,
                          subpel_from_state)

    h, w = y_plane.shape
    sizes = [1 << lg for lg in range(log2_min_cu, log2_ctu + 1)]
    lam = lambda_sqrt * lambda_sqrt
    qp = 12.0 + 3.0 * jnp.log2(lam / 0.57)
    qp_i = jnp.clip(jnp.round(qp), 0, 51).astype(jnp.int32)
    multi0 = ref0b_plane is not None
    multi1 = ref1b_plane is not None
    if nref0 is None:
        nref0 = jnp.int32(2 if multi0 else 1)
    if nref1 is None:
        nref1 = jnp.int32(2 if multi1 else 1)
    intra_dec = search_intra_frame(y_plane, lambda_sqrt, log2_ctu,
                                   log2_min_cu, cb_plane, cr_plane,
                                   mpm_edge_x, mpm_edge_on,
                                   rd_cands=rd_cands)
    # ONE shared ME state over all refs of both lists: the coarse search,
    # the window gathers (stacked across refs) and refinement amortize.
    # Ref layout (only actually-distinct refs pay ME): l0a [l0b] l1a [l1b]
    refs = [ref0_plane]
    i0a, i0b = 0, 0
    if multi0:
        refs.append(ref0b_plane)
        i0b = 1
    i1a = i1b = len(refs)
    refs.append(ref1_plane)
    if multi1:
        refs.append(ref1b_plane)
        i1b = i1a + 1
    st = me_state(y_plane, refs, search_range, max_size=1 << log2_ctu)
    sp = subpel_from_state(st, lambda_sqrt)

    from ..ops.cost import satd as satd_blocks

    def rd_of(pred, n, rate_bits):
        """Full transform-round-trip leaf cost (run ONCE per size, on the
        SATD-chosen candidate)."""
        pn = min(n, 32)
        res = (_blocks(y_plane, n) - pred)[:, :pn, :pn]
        levels, rq = tq_roundtrip(res, qp_i, pn.bit_length() - 1,
                                  is_intra=False)
        dist = sse(res, rq).astype(jnp.float32)
        rate = level_rate_proxy(levels)
        scale = 4.0 if pn != n else 1.0
        return scale * (dist + lam * (rate + rate_bits
                                      + INTER_OVERHEAD_BITS))

    def pick_ref(n, ia, ib, nref):
        """Per-block ref choice between state refs ia and ib (masked by
        the traced active count; ia == ib -> single-ref)."""
        ca = sp[n][0][ia]
        if ia == ib:
            z = jnp.zeros(ca.shape, bool)
            return ca, sp[n][1][ia], sp[n][2][ia], z
        cb = jnp.where(nref > 1, sp[n][0][ib], jnp.inf)
        sel = cb < ca
        cost = jnp.minimum(ca, cb)
        mv = jnp.where(sel[:, None], sp[n][1][ib], sp[n][1][ia])
        pred = jnp.where(sel[:, None, None], sp[n][2][ib], sp[n][2][ia])
        return cost, mv, pred, sel

    def with_merge_cands(ia, ib, mv, ridx, pred, cost, rate_bits, n):
        """Fold in the left/top neighbor (MV, ref) pairs at merge-class
        (~2 bit) rate; selection in the SATD domain (one TQ runs later on
        the winner).  A merge winner adopts the neighbor's reference."""
        src_b = _blocks(y_plane, n)
        field = jnp.concatenate([mv, ridx[:, None]], axis=1)  # [B, 3]
        for cand in _neighbor_mvs(field, h // n, w // n,
                                  mpm_edge_x // n, mpm_edge_on):
            cmv = cand[:, :2]
            cref = cand[:, 2]
            raw_c, valid = mc_raw_from_state_sel(
                st, ia, ib, cref > 0, n, cmv)
            predc = jnp.clip((raw_c + 32) >> 6, 0, 255)
            costc = jnp.where(
                valid,
                satd_blocks(src_b - predc).astype(jnp.float32)
                + lambda_sqrt * 2.0, jnp.inf)
            better = costc < cost
            cost = jnp.where(better, costc, cost)
            mv = jnp.where(better[:, None], cmv, mv)
            ridx = jnp.where(better, cref, ridx)
            pred = jnp.where(better[:, None, None], predc, pred)
            rate_bits = jnp.where(better, 2.0, rate_bits)
        return mv, ridx, pred, cost, rate_bits

    out = {}
    dp = None
    for i, n in enumerate(sizes):
        c0, mv0, p0, sel0 = pick_ref(n, i0a, i0b, nref0)
        c1, mv1, p1, sel1 = pick_ref(n, i1a, i1b, nref1)
        r0idx = sel0.astype(jnp.int32)
        r1idx = sel1.astype(jnp.int32)
        r0bits = _mv_rate_bits(mv0)
        r1bits = _mv_rate_bits(mv1)
        mv0, r0idx, p0, c0, r0bits = with_merge_cands(
            i0a, i0b, mv0, r0idx, p0, c0, r0bits, n)
        mv1, r1idx, p1, c1, r1bits = with_merge_cands(
            i1a, i1b, mv1, r1idx, p1, c1, r1bits, n)
        raw0, _ = mc_raw_from_state_sel(st, i0a, i0b, r0idx > 0, n, mv0)
        raw1, _ = mc_raw_from_state_sel(st, i1a, i1b, r1idx > 0, n, mv1)
        pbi = jnp.clip((raw0 + raw1 + 64) >> 7, 0, 255)
        src_b = _blocks(y_plane, n)
        cbi = (satd_blocks(src_b - pbi).astype(jnp.float32)
               + lambda_sqrt * (r0bits + r1bits))
        # direction choice in the SATD domain, then ONE TQ on the winner
        sat3 = jnp.stack([c0, c1, cbi])                    # [3, B]
        dchoice = jnp.argmin(sat3, axis=0)                 # 0=L0,1=L1,2=BI
        dsel = jax.nn.one_hot(dchoice, 3, dtype=jnp.float32)  # [B, 3]
        pred_sel = jnp.einsum(
            "bc,cbyx->byx", dsel,
            jnp.stack([p0, p1, pbi]).astype(jnp.float32),
            preferred_element_type=jnp.float32).astype(jnp.int32)
        rate_sel = (dsel[:, 0] * r0bits + dsel[:, 1] * r1bits
                    + dsel[:, 2] * (r0bits + r1bits))
        icost = rd_of(pred_sel, n, rate_sel)
        raw_intra = intra_dec[f"rawcost{n}"]
        use_inter = icost < raw_intra
        choice = jnp.where(use_inter, dchoice + 1, 0)      # 0=intra,1,2,3=bi
        leaf = jnp.minimum(icost, raw_intra) + lam * CU_OVERHEAD_BITS
        out[f"mode{n}"] = intra_dec[f"mode{n}"]
        out[f"inter{n}"] = use_inter
        out[f"dir{n}"] = jnp.where(choice == 0, 1, choice).astype(jnp.int32)
        out[f"mv0{n}"] = mv0
        out[f"mv1{n}"] = mv1
        out[f"ref0{n}"] = r0idx
        out[f"ref1{n}"] = r1idx
        if i == 0:
            dp = leaf
            continue
        gy, gx = h // n, w // n
        child = dp.reshape(gy, 2, gx, 2)
        sum_child = child.sum(axis=(1, 3)).reshape(-1)
        split = sum_child + lam * SPLIT_FLAG_BITS < leaf
        dp = jnp.where(split, sum_child + lam * SPLIT_FLAG_BITS, leaf)
        out[f"split{n}"] = split
    return out


def _pack_maps_device(dec: dict, padded_w: int, padded_h: int,
                      coded_w: int, coded_h: int,
                      log2_ctu: int, log2_min_cu: int,
                      depth_override=None) -> jnp.ndarray:
    """Device-side decisions_to_maps: fold the per-size search outputs into
    one packed int16 tensor [ph/8, pw/8, 9] = (depth, mode, dir, mv0x,
    mv0y, mv1x, mv1y, ref0, ref1) so the host fetches ONE small array per
    frame (the axon TPU tunnel makes many-array fetches pathologically
    slow).

    depth_override: optional [ph/8, pw/8] granule depth map (the
    fast-partition CNN's prediction, SURVEY.md E8) replacing the DP split
    decisions, mirroring TpuEncoder._apply_fast_partition semantics."""
    gw, gh = padded_w >> 3, padded_h >> 3
    sizes = [1 << lg for lg in range(log2_ctu, log2_min_cu - 1, -1)]

    def up(a, n):
        r = n >> 3
        return jnp.repeat(jnp.repeat(a, r, axis=0), r, axis=1)

    def forced(n):
        bx = np.arange(padded_w // n) * n
        by = np.arange(padded_h // n) * n
        f = (by[:, None] + n > coded_h) | (bx[None, :] + n > coded_w)
        r = n >> 3
        return jnp.asarray(np.kron(f, np.ones((r, r), dtype=bool)))

    def level_maps(n):
        ph_n, pw_n = padded_h // n, padded_w // n
        mode_n = up(dec[f"mode{n}"].reshape(ph_n, pw_n).astype(jnp.int16),
                    n)
        dir_n = jnp.zeros((gh, gw), jnp.int16)
        mv_n = jnp.zeros((gh, gw, 4), jnp.int16)
        ref_n = jnp.zeros((gh, gw, 2), jnp.int16)
        if f"dir{n}" in dec:  # B search
            inter = up(dec[f"inter{n}"].reshape(ph_n, pw_n), n)
            dir_n = jnp.where(
                inter,
                up(dec[f"dir{n}"].reshape(ph_n, pw_n).astype(jnp.int16), n),
                jnp.int16(0))
            mvs = [dec[f"mv0{n}"], dec[f"mv1{n}"]]
            comps = [up(m.reshape(ph_n, pw_n, 2)[..., c].astype(jnp.int16),
                        n) for m in mvs for c in range(2)]
            mv_n = jnp.stack(comps, axis=-1)
            ref_n = jnp.stack(
                [up(dec[f"ref0{n}"].reshape(ph_n, pw_n)
                    .astype(jnp.int16), n),
                 up(dec[f"ref1{n}"].reshape(ph_n, pw_n)
                    .astype(jnp.int16), n)], axis=-1)
        elif f"inter{n}" in dec:  # P search
            inter = up(dec[f"inter{n}"].reshape(ph_n, pw_n), n)
            dir_n = jnp.where(inter, jnp.int16(1), jnp.int16(0))
            mvs = dec[f"mv{n}"].reshape(ph_n, pw_n, 2)
            mv_n = jnp.stack(
                [up(mvs[..., 0].astype(jnp.int16), n),
                 up(mvs[..., 1].astype(jnp.int16), n),
                 jnp.zeros((gh, gw), jnp.int16),
                 jnp.zeros((gh, gw), jnp.int16)], axis=-1)
            if f"ref{n}" in dec:
                ref_n = jnp.stack(
                    [up(dec[f"ref{n}"].reshape(ph_n, pw_n)
                        .astype(jnp.int16), n),
                     jnp.zeros((gh, gw), jnp.int16)], axis=-1)
        mode_n = jnp.where(dir_n > 0, jnp.int16(-1), mode_n)
        return mode_n, dir_n, mv_n, ref_n

    depth = jnp.zeros((gh, gw), jnp.int16)
    mode, dir_m, mv, ref = level_maps(sizes[0])
    for d, n in enumerate(sizes[:-1]):
        child = sizes[d + 1]
        if depth_override is None:
            split = up(dec[f"split{n}"].reshape(padded_h // n,
                                                padded_w // n), n)
        else:
            g = n >> 3
            rm = (depth_override.reshape(padded_h // n, g,
                                         padded_w // n, g)
                  .max(axis=(1, 3)))
            split = up(rm > d, n)
        active = (depth == d) & (split | forced(n))
        cmode, cdir, cmv, cref = level_maps(child)
        depth = jnp.where(active, jnp.int16(d + 1), depth)
        mode = jnp.where(active, cmode, mode)
        dir_m = jnp.where(active, cdir, dir_m)
        mv = jnp.where(active[..., None], cmv, mv)
        ref = jnp.where(active[..., None], cref, ref)
    return jnp.concatenate(
        [depth[..., None], mode[..., None], dir_m[..., None], mv, ref],
        axis=-1)


def _search_intra_maps_impl(y_u8, lambda_sqrt, log2_ctu, log2_min_cu,
                            coded_w, coded_h, cnn_params, qp, use_cnn,
                            cb_u8=None, cr_u8=None, mpm_edge_x=0,
                            mpm_edge_on=None, rd_cands=3,
                            ref_y_u8=None, ref_cb_u8=None, ref_cr_u8=None):
    y = y_u8.astype(jnp.int32)
    cb = cb_u8.astype(jnp.int32) if cb_u8 is not None else None
    cr = cr_u8.astype(jnp.int32) if cr_u8 is not None else None
    rfy = ref_y_u8.astype(jnp.int32) if ref_y_u8 is not None else None
    rfcb = ref_cb_u8.astype(jnp.int32) if ref_cb_u8 is not None else None
    rfcr = ref_cr_u8.astype(jnp.int32) if ref_cr_u8 is not None else None
    dec = search_intra_frame(y, lambda_sqrt, log2_ctu, log2_min_cu, cb, cr,
                             mpm_edge_x, mpm_edge_on, rd_cands=rd_cands,
                             ref_y=rfy, ref_cb=rfcb, ref_cr=rfcr)
    override = None
    if use_cnn:
        from ..models.partition_cnn import predict_depth_maps_device
        override = predict_depth_maps_device(cnn_params, y, qp, log2_ctu)
    return _pack_maps_device(dec, y.shape[1], y.shape[0], coded_w, coded_h,
                             log2_ctu, log2_min_cu, override)


@partial(jax.jit, static_argnames=("log2_ctu", "log2_min_cu", "coded_w",
                                   "coded_h", "use_cnn", "rd_cands"))
def search_intra_maps(y_u8: jnp.ndarray, lambda_sqrt: jnp.ndarray,
                      log2_ctu: int, log2_min_cu: int,
                      coded_w: int, coded_h: int,
                      cnn_params=None, qp: int = 0, use_cnn: bool = False,
                      cb_u8=None, cr_u8=None, rd_cands: int = 3,
                      ref_y_u8=None, ref_cb_u8=None, ref_cr_u8=None):
    """Intra search + decision packing in one dispatch; y_u8 is the padded
    luma plane as uint8 (4x less tunnel upload than int32).  ref_*_u8:
    optional recon planes for the two-pass recon-reference search."""
    return _search_intra_maps_impl(y_u8, lambda_sqrt, log2_ctu, log2_min_cu,
                                   coded_w, coded_h, cnn_params, qp, use_cnn,
                                   cb_u8=cb_u8, cr_u8=cr_u8,
                                   rd_cands=rd_cands, ref_y_u8=ref_y_u8,
                                   ref_cb_u8=ref_cb_u8, ref_cr_u8=ref_cr_u8)


@partial(jax.jit, static_argnames=("log2_ctu", "log2_min_cu", "coded_w",
                                   "coded_h", "use_cnn", "rd_cands"))
def search_intra_maps_batch(y_u8_batch: jnp.ndarray,
                            lambda_sqrt: jnp.ndarray, log2_ctu: int,
                            log2_min_cu: int, coded_w: int, coded_h: int,
                            cnn_params=None, qp: int = 0,
                            use_cnn: bool = False,
                            cb_u8_batch=None, cr_u8_batch=None,
                            rd_cands: int = 3):
    """Multi-frame intra search: [F, H, W] uint8 -> [F, gh, gw, 7] packed.

    One dispatch + ONE device->host fetch for F frames: the axon tunnel
    costs ~30-60 ms latency per round-trip regardless of size, so batching
    frames amortizes what is otherwise the dominant per-frame cost (the
    search compute itself is <1 ms/frame at 1080p)."""
    if cb_u8_batch is not None:
        def one_c(y_u8, cb_u8, cr_u8):
            return _search_intra_maps_impl(y_u8, lambda_sqrt, log2_ctu,
                                           log2_min_cu, coded_w, coded_h,
                                           cnn_params, qp, use_cnn,
                                           cb_u8=cb_u8, cr_u8=cr_u8,
                                           rd_cands=rd_cands)
        return jax.vmap(one_c)(y_u8_batch, cb_u8_batch, cr_u8_batch)

    def one(y_u8):
        return _search_intra_maps_impl(y_u8, lambda_sqrt, log2_ctu,
                                       log2_min_cu, coded_w, coded_h,
                                       cnn_params, qp, use_cnn,
                                       rd_cands=rd_cands)
    return jax.vmap(one)(y_u8_batch)


@partial(jax.jit, static_argnames=("log2_ctu", "log2_min_cu", "coded_w",
                                   "coded_h", "search_range", "use_cnn",
                                   "rd_cands", "mpm_edge_x"))
def search_p_maps(y_u8: jnp.ndarray, ref_u8: jnp.ndarray,
                  lambda_sqrt: jnp.ndarray, log2_ctu: int, log2_min_cu: int,
                  coded_w: int, coded_h: int, search_range: int,
                  cnn_params=None, qp: int = 0, use_cnn: bool = False,
                  rd_cands: int = 3, cb_u8=None, cr_u8=None,
                  mpm_edge_x: int = 0, mpm_edge_on=None,
                  refb_u8=None, nref=None):
    y = y_u8.astype(jnp.int32)
    ref = ref_u8.astype(jnp.int32)
    refb = refb_u8.astype(jnp.int32) if refb_u8 is not None else None
    cb = cb_u8.astype(jnp.int32) if cb_u8 is not None else None
    cr = cr_u8.astype(jnp.int32) if cr_u8 is not None else None
    dec = search_p_frame(y, ref, lambda_sqrt, log2_ctu, log2_min_cu,
                         search_range, rd_cands=rd_cands, cb_plane=cb,
                         cr_plane=cr, mpm_edge_x=mpm_edge_x,
                         mpm_edge_on=mpm_edge_on, refb_plane=refb,
                         nref=nref)
    override = None
    if use_cnn:
        from ..models.partition_cnn import predict_depth_maps_device
        override = predict_depth_maps_device(cnn_params, y, qp, log2_ctu)
    return _pack_maps_device(dec, y.shape[1], y.shape[0], coded_w, coded_h,
                             log2_ctu, log2_min_cu, override)


@partial(jax.jit, static_argnames=("log2_ctu", "log2_min_cu", "coded_w",
                                   "coded_h", "search_range", "use_cnn",
                                   "rd_cands", "mpm_edge_x"))
def search_b_maps(y_u8: jnp.ndarray, ref0_u8: jnp.ndarray,
                  ref1_u8: jnp.ndarray, lambda_sqrt: jnp.ndarray,
                  log2_ctu: int, log2_min_cu: int,
                  coded_w: int, coded_h: int, search_range: int,
                  cnn_params=None, qp: int = 0, use_cnn: bool = False,
                  rd_cands: int = 3, ref0b_u8=None, ref1b_u8=None,
                  nref0=None, nref1=None, mpm_edge_x: int = 0,
                  mpm_edge_on=None):
    y = y_u8.astype(jnp.int32)
    r0 = ref0_u8.astype(jnp.int32)
    r1 = ref1_u8.astype(jnp.int32)
    r0b = ref0b_u8.astype(jnp.int32) if ref0b_u8 is not None else None
    r1b = ref1b_u8.astype(jnp.int32) if ref1b_u8 is not None else None
    dec = search_b_frame(y, r0, r1, lambda_sqrt, log2_ctu, log2_min_cu,
                         search_range, rd_cands=rd_cands,
                         ref0b_plane=r0b, ref1b_plane=r1b,
                         nref0=nref0, nref1=nref1,
                         mpm_edge_x=mpm_edge_x, mpm_edge_on=mpm_edge_on)
    override = None
    if use_cnn:
        from ..models.partition_cnn import predict_depth_maps_device
        override = predict_depth_maps_device(cnn_params, y, qp, log2_ctu)
    return _pack_maps_device(dec, y.shape[1], y.shape[0], coded_w, coded_h,
                             log2_ctu, log2_min_cu, override)


def decisions_to_maps(dec: dict, padded_w: int, padded_h: int,
                      coded_w: int, coded_h: int,
                      log2_ctu: int, log2_min_cu: int):
    """Convert search outputs to per-8x8-granule (depth_map, mode_map)
    int8 arrays — the compact decision interface of the native C++ slice
    engine (cabac_cpp.encode_slice_native).

    Forced boundary splits (blocks overflowing the coded picture) descend
    here as well, so forced children carry their own searched modes —
    matching the tree path exactly."""
    dec = {k: np.asarray(v) for k, v in dec.items()}
    gw, gh = padded_w >> 3, padded_h >> 3
    sizes = [1 << lg for lg in range(log2_ctu, log2_min_cu - 1, -1)]

    def up(arr, n):
        """[ph/n, pw/n] -> granule grid by replication."""
        r = n >> 3
        return np.kron(arr, np.ones((r, r), dtype=arr.dtype))

    def forced(n):
        """granule grid: covering n-block overflows the coded picture."""
        bx = np.arange(padded_w // n) * n
        by = np.arange(padded_h // n) * n
        f = (by[:, None] + n > coded_h) | (bx[None, :] + n > coded_w)
        return up(f, n)

    def level_maps(n):
        """(mode, dir, mv4) granule maps for one CU size."""
        ph_n, pw_n = padded_h // n, padded_w // n
        mode_n = up(dec[f"mode{n}"].reshape(ph_n, pw_n), n).astype(np.int8)
        dir_n = np.zeros((gh, gw), dtype=np.int8)
        mv_n = np.zeros((gh, gw, 4), dtype=np.int16)
        if f"dir{n}" in dec:  # B search
            inter = up(dec[f"inter{n}"].reshape(ph_n, pw_n), n)
            dir_n[inter] = up(dec[f"dir{n}"].reshape(ph_n, pw_n),
                              n)[inter].astype(np.int8)
            for k, key in enumerate((f"mv0{n}", f"mv1{n}")):
                mvs = dec[key].reshape(ph_n, pw_n, 2)
                for c in range(2):
                    mv_n[..., 2 * k + c] = up(mvs[..., c], n).astype(np.int16)
        elif f"inter{n}" in dec:  # P search
            inter = up(dec[f"inter{n}"].reshape(ph_n, pw_n), n)
            dir_n[inter] = 1
            mvs = dec[f"mv{n}"].reshape(ph_n, pw_n, 2)
            for c in range(2):
                mv_n[..., c] = up(mvs[..., c], n).astype(np.int16)
        mode_n[dir_n > 0] = -1
        return mode_n, dir_n, mv_n

    top = sizes[0]
    depth = np.zeros((gh, gw), dtype=np.int8)
    mode, dir_map, mv_map = level_maps(top)
    for d, n in enumerate(sizes[:-1]):
        child = sizes[d + 1]
        split = up(dec[f"split{n}"].reshape(padded_h // n, padded_w // n), n)
        active = (depth == d) & (split | forced(n))
        cmode, cdir, cmv = level_maps(child)
        depth[active] = d + 1
        mode[active] = cmode[active]
        dir_map[active] = cdir[active]
        mv_map[active] = cmv[active]
    return depth, mode, dir_map, mv_map


def decisions_to_trees(dec: dict, padded_w: int, padded_h: int,
                       coded_w: int, coded_h: int,
                       log2_ctu: int, log2_min_cu: int) -> list:
    """Convert search output arrays into per-CTU (x, y, tree) tuples where
    tree = (split?, mode | children) nested, matching CTU raster order.

    The search ran on a CTU-aligned padded plane (padded_w/h); blocks beyond
    the coded picture (coded_w/h, min-CU aligned) force splits / are absent,
    mirroring the spec's inferred-split rule.
    """
    dec = {k: np.asarray(v) for k, v in dec.items()}
    ctu = 1 << log2_ctu

    def node(x, y, lg):
        n = 1 << lg
        gx, gy = x // n, y // n
        row = padded_w // n
        bi = gy * row + gx
        force_split = (x + n > coded_w) or (y + n > coded_h)
        split = (lg > log2_min_cu and
                 (force_split or bool(dec[f"split{n}"][bi])))
        if split:
            half = n >> 1
            children = []
            for i in range(4):
                cx, cy = x + (i & 1) * half, y + (i >> 1) * half
                if cx < coded_w and cy < coded_h:
                    children.append(node(cx, cy, lg - 1))
                else:
                    children.append(None)
            return ("split", children)
        if f"inter{n}" in dec and bool(dec[f"inter{n}"][bi]):
            if f"dir{n}" in dec:  # B search: direction + both MVs + refs
                mv0 = dec[f"mv0{n}"][bi]
                mv1 = dec[f"mv1{n}"][bi]
                r0 = int(dec[f"ref0{n}"][bi]) if f"ref0{n}" in dec else 0
                r1 = int(dec[f"ref1{n}"][bi]) if f"ref1{n}" in dec else 0
                return ("ileaf", (int(dec[f"dir{n}"][bi]),
                                  (int(mv0[0]), int(mv0[1])),
                                  (int(mv1[0]), int(mv1[1])), r0, r1))
            mv = dec[f"mv{n}"][bi]
            r0 = int(dec[f"ref{n}"][bi]) if f"ref{n}" in dec else 0
            return ("ileaf", (1, (int(mv[0]), int(mv[1])), (0, 0), r0, 0))
        return ("leaf", int(dec[f"mode{n}"][bi]))

    trees = []
    for y in range(0, coded_h, ctu):
        for x in range(0, coded_w, ctu):
            trees.append((x, y, node(x, y, log2_ctu)))
    return trees
