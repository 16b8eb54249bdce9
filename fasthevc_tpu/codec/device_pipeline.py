"""All-intra device pipeline: search + commit + in-loop filters in ONE
TPU dispatch per frame group; the host does CABAC emission only.

This is the SURVEY.md §7.0 decision-then-commit design taken to its end
state: the whole pixel path (batched RDO search -> wavefront exact
reconstruction -> deblock -> SAO estimate/apply) lives on device, and the
only host work per frame is the sequential bit emission (C++
hevc_entropy_slice_tiled) plus NAL glue.

Fetch architecture (the device->host tunnel sustains only ~25-35 MB/s, so
bytes fetched per frame bound the frame rate):
  * levels ship as int8 planes (quantized levels at practical QPs almost
    never exceed |127|) with a per-frame/plane overflow flag; the exact
    int16 planes stay on device and are fetched ONLY for flagged frames.
  * the Annex D.3.19 decoded-picture CHECKSUM is a position-masked wrapping
    sum — computed on device, so hash_type=2 needs no recon fetch at all;
    recon planes are returned as device arrays and fetched lazily (MD5/CRC
    are host-sequential and force the fetch).
  * the intra search runs in micro-batches of <=4 frames inside the
    dispatch (its all-modes tensors at 1080p exceed HBM beyond that) while
    commit/deblock/SAO batch over the full group — the wavefront scan's
    per-wave cost is frame-count-invariant, so bigger groups divide it.

Scope guard (device_path_ok): CTU 32, 8-bit, no lossless (the classic
C++ commit path remains for everything else).  cfg.rdoq runs the
device-parallel trellis (ops/rdoq.py) inside the wavefront commit — the
closed-form re-derivation of HM's sequential trellis, so the stream may
legally differ from the classic path's exact trellis (encoder freedom;
both are conformant and decode-verified).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.commit import wavefront_commit_intra, wavefront_commit_mixed
from ..ops.deblock import deblock_device, inter_bs_maps, tu_cbf_map
from ..ops.sao import sao_device
from .search import _search_intra_maps_impl

SEARCH_MICRO_BATCH = 4


def device_path_ok(cfg, sp) -> bool:
    # weighted_pred routes to the classic path (TPU search + native C++
    # commit, which applies the explicit WP tables); the device commit
    # does not weight its MC planes yet
    return (sp.log2_ctu == 5 and sp.bit_depth == 8 and not cfg.lossless
            and not getattr(cfg, "weighted_pred", False))


def _device_checksum(plane_u8: jnp.ndarray) -> jnp.ndarray:
    """Annex D.3.19 hash_type 2 checksum of one plane (uint32 scalar):
    sum of sample bytes XORed with the position mask, wrapping mod 2^32
    (twin of utils.video.picture_checksum)."""
    h, w = plane_u8.shape
    xs = jnp.arange(w, dtype=jnp.uint32)
    ys = jnp.arange(h, dtype=jnp.uint32)
    mask = ((xs[None, :] & 0xFF) ^ (ys[:, None] & 0xFF)
            ^ (xs[None, :] >> 8) ^ (ys[:, None] >> 8))
    vals = (plane_u8.astype(jnp.uint32) & 0xFF) ^ mask
    return jnp.sum(vals.astype(jnp.uint32))  # uint32 add wraps mod 2^32


@partial(jax.jit, static_argnames=("log2_ctu", "log2_min_cu", "coded_w",
                                   "coded_h", "sdh", "deblock_on", "sao_on",
                                   "tile_bounds_x", "tile_bounds_y",
                                   "use_cnn", "rd_cands", "rdoq"))
def encode_group_device(y_u8, cb_u8, cr_u8, lambda_sqrt, qp_y, qp_cb,
                        qp_cr, qp_for_deblock, log2_ctu: int,
                        log2_min_cu: int, coded_w: int, coded_h: int,
                        sdh: bool, deblock_on: bool, sao_on: bool,
                        tile_bounds_x: tuple = (),
                        tile_bounds_y: tuple = (),
                        cnn_params=None, qp: int = 0,
                        use_cnn: bool = False, rd_cands: int = 3,
                        rdoq: bool = False):
    """Search + exact commit + filters for F frames in one dispatch.

    y_u8: [F, PH, PW] uint8 (CTU-padded), cb/cr_u8: [F, PH/2, PW/2].
    qp_*: dynamic int32 scalars (temporal cascade / rate control).
    Returns dict of stacked per-frame outputs (device arrays); see module
    docstring for which are meant to be fetched eagerly vs lazily.
    """
    gh, gw = coded_h >> 3, coded_w >> 3
    f_total = y_u8.shape[0]

    def search_mb(args):
        ym, cbm, crm = args
        return jax.vmap(lambda y, cb, cr: _search_intra_maps_impl(
            y, lambda_sqrt, log2_ctu, log2_min_cu, coded_w, coded_h,
            cnn_params, qp, use_cnn, cb_u8=cb, cr_u8=cr,
            rd_cands=rd_cands))(ym, cbm, crm)

    packed = _lax_map_frames(search_mb, (y_u8, cb_u8, cr_u8), f_total,
                             SEARCH_MICRO_BATCH)

    def one(y, cbp, crp, pk):
        dm = pk[:gh, :gw, 0].astype(jnp.int32)
        mm = pk[:gh, :gw, 1].astype(jnp.int32)
        sy = y[:coded_h, :coded_w].astype(jnp.int32)
        scb = cbp[:coded_h // 2, :coded_w // 2].astype(jnp.int32)
        scr = crp[:coded_h // 2, :coded_w // 2].astype(jnp.int32)
        ry, rcb, rcr, lv_y, lv_cb, lv_cr = wavefront_commit_intra(
            sy, scb, scr, dm, mm, qp_y, qp_cb, qp_cr, coded_w, coded_h,
            8, sdh, tile_bounds_x, tile_bounds_y, rdoq=rdoq,
            lam=(lambda_sqrt * lambda_sqrt).astype(jnp.float32))
        if deblock_on:
            ry, rcb, rcr = deblock_device(ry, rcb, rcr, dm,
                                          qp_for_deblock, qp_cb, qp_cr,
                                          log2_ctu)
        if sao_on:
            ry, rcb, rcr, sao_params = sao_device(sy, scb, scr, ry, rcb,
                                                  rcr, log2_ctu)
        else:
            ny = -(-coded_h // (1 << log2_ctu))
            nx = -(-coded_w // (1 << log2_ctu))
            sao_params = jnp.zeros((ny, nx, 3, 7), jnp.int32)
        ry8 = ry.astype(jnp.uint8)
        rcb8 = rcb.astype(jnp.uint8)
        rcr8 = rcr.astype(jnp.uint8)
        cksum = jnp.stack([_device_checksum(ry8), _device_checksum(rcb8),
                           _device_checksum(rcr8)])

        def to8(lv):
            return (jnp.clip(lv, -128, 127).astype(jnp.int8),
                    jnp.any(jnp.abs(lv.astype(jnp.int32)) > 127))

        lv8_y, of_y = to8(lv_y)
        lv8_cb, of_cb = to8(lv_cb)
        lv8_cr, of_cr = to8(lv_cr)
        return dict(packed=pk,
                    lv8_y=lv8_y, lv8_cb=lv8_cb, lv8_cr=lv8_cr,
                    overflow=jnp.stack([of_y, of_cb, of_cr]),
                    lv_y=lv_y, lv_cb=lv_cb, lv_cr=lv_cr,
                    rec_y=ry8, rec_cb=rcb8, rec_cr=rcr8,
                    cksum=cksum, sao=sao_params)

    return jax.vmap(one)(y_u8, cb_u8, cr_u8, packed)


def _lax_map_frames(fn, args, f_total, mb):
    """Apply a per-micro-batch fn over [F, ...] leading-dim args in chunks
    of mb (HBM cap for the search's all-modes tensors).

    A remainder group (f_total % mb) runs as its own tail call of <= mb
    frames — it must never fall back to one full-batch vmap, which would
    exceed the documented HBM cap (ADVICE r3 #2)."""
    if f_total <= mb:
        return fn(args)
    nmb, rem = divmod(f_total, mb)
    head = jax.tree.map(lambda a: a[:nmb * mb], args)
    r = jax.lax.map(fn, jax.tree.map(
        lambda a: a.reshape((nmb, mb) + a.shape[1:]), head))
    r = jax.tree.map(lambda a: a.reshape((nmb * mb,) + a.shape[2:]), r)
    if rem:
        tail = fn(jax.tree.map(lambda a: a[nmb * mb:], args))
        r = jax.tree.map(lambda a, b: jnp.concatenate([a, b]), r, tail)
    return r


@partial(jax.jit, static_argnames=("log2_ctu", "log2_min_cu", "coded_w",
                                   "coded_h", "sdh", "deblock_on", "sao_on",
                                   "search_range", "is_b",
                                   "tile_bounds_x", "tile_bounds_y",
                                   "use_cnn", "rd_cands", "rdoq"))
def encode_inter_group_device(y_u8, cb_u8, cr_u8,
                              r0_y, r0_cb, r0_cr,
                              r1_y, r1_cb, r1_cr,
                              lambda_sqrt, qp_y, qp_cb, qp_cr,
                              qp_for_deblock, log2_ctu: int,
                              log2_min_cu: int, coded_w: int, coded_h: int,
                              sdh: bool, deblock_on: bool, sao_on: bool,
                              search_range: int, is_b: bool,
                              tile_bounds_x: tuple = (),
                              tile_bounds_y: tuple = (),
                              cnn_params=None, qp: int = 0,
                              use_cnn: bool = False, rd_cands: int = 3,
                              nref0=None, nref1=None, rdoq: bool = False):
    """Search + MC + mixed exact commit + filters for F same-type P/B
    frames in one dispatch (frames of one dependency-free batch: refs come
    from the on-device DPB, so reference pixels never cross the tunnel).

    y_u8: [F, PH, PW] uint8 CTU-padded sources; r0_*/r1_*: [F, 2, coded]
    uint8 reference STACKS per frame and list (2 active refs; duplicate
    the first and pass nref=1 when only one exists — shapes stay fixed
    so batch programs don't multiply).  r1_* ignored unless is_b.
    lambda_sqrt / qp_y / qp_cb / qp_cr / qp_for_deblock / nref0 / nref1:
    PER-FRAME [F] arrays — a batch may mix temporal layers (and hence
    QPs), which is what lets the GOP scheduler pack cross-GOP
    software-pipelined batches (SURVEY.md §2.4 P4; the wavefront
    commit's per-wave cost is frame-count-invariant, so batch width ==
    throughput).
    Returns the same output dict as encode_group_device.
    """
    from .search import search_b_maps, search_p_maps

    gh, gw = coded_h >> 3, coded_w >> 3
    f_total = y_u8.shape[0]
    ph, pw = y_u8.shape[1], y_u8.shape[2]
    if nref0 is None:
        nref0 = jnp.ones((f_total,), jnp.int32)
    if nref1 is None:
        nref1 = jnp.ones((f_total,), jnp.int32)

    def pad_ref(r):
        return jnp.pad(r, ((0, 0), (0, 0), (0, ph - r.shape[2]),
                           (0, pw - r.shape[3])), mode="edge")

    r0_y_pad = pad_ref(r0_y)
    r1_y_pad = pad_ref(r1_y) if is_b else r0_y_pad

    def search_mb(args):
        if is_b:
            ym, re0, re1, lamm, n0, n1 = args

            def one_b(y, a, b, lm, m0, m1):
                return search_b_maps(
                    y, a[0], b[0], lm, log2_ctu, log2_min_cu, coded_w,
                    coded_h, search_range, cnn_params=cnn_params, qp=qp,
                    use_cnn=use_cnn, rd_cands=rd_cands,
                    ref0b_u8=a[1], ref1b_u8=b[1], nref0=m0, nref1=m1)

            if ym.shape[0] == 1:
                # micro-batch 1 runs UNBATCHED: the vmapped 1080p B
                # search program killed the TPU worker (r4 RA crash);
                # the identical un-vmapped program runs fine — same
                # math, different codegen path
                return one_b(ym[0], re0[0], re1[0], lamm[0], n0[0],
                             n1[0])[None]
            return jax.vmap(one_b)(ym, re0, re1, lamm, n0, n1)
        ym, re0, lamm, n0 = args

        def one_p(y, a, lm, m0):
            return search_p_maps(
                y, a[0], lm, log2_ctu, log2_min_cu, coded_w, coded_h,
                search_range, cnn_params=cnn_params, qp=qp,
                use_cnn=use_cnn, rd_cands=rd_cands, refb_u8=a[1],
                nref=m0)

        if ym.shape[0] == 1:
            return one_p(ym[0], re0[0], lamm[0], n0[0])[None]
        return jax.vmap(one_p)(ym, re0, lamm, n0)

    args = ((y_u8, r0_y_pad, r1_y_pad, lambda_sqrt, nref0, nref1) if is_b
            else (y_u8, r0_y_pad, lambda_sqrt, nref0))
    # HBM guard: the multi-ref B search gathers ME tier windows for up to
    # 4 distinct reference planes per frame; at HD+ two frames of that
    # state alongside the batch-8 commit crashed the r4 chip (BENCH_r04
    # "INTERNAL: TPU backend error").  One frame at a time keeps the
    # peak bounded; P frames (<=2 ref planes) keep the wider micro-batch.
    mb_inter = (1 if (is_b and coded_w * coded_h >= 1280 * 720)
                else max(1, SEARCH_MICRO_BATCH // 2))
    packed = _lax_map_frames(search_mb, args, f_total, mb_inter)

    def one(y, cbp, crp, pk, q0y, q0cb, q0cr, q1y, q1cb, q1cr,
            qp_y, qp_cb, qp_cr, qp_for_deblock, lam_sqrt):
        from ..ops.me import inter_pred_planes

        dm = pk[:gh, :gw, 0].astype(jnp.int32)
        mm = pk[:gh, :gw, 1].astype(jnp.int32)
        im = pk[:gh, :gw, 2].astype(jnp.int32)
        mv = pk[:gh, :gw, 3:7].astype(jnp.int32)
        rmap = pk[:gh, :gw, 7:9].astype(jnp.int32)
        sy = y[:coded_h, :coded_w].astype(jnp.int32)
        scb = cbp[:coded_h // 2, :coded_w // 2].astype(jnp.int32)
        scr = crp[:coded_h // 2, :coded_w // 2].astype(jnp.int32)
        ref0 = (q0y.astype(jnp.int32), q0cb.astype(jnp.int32),
                q0cr.astype(jnp.int32))
        ref1 = ((q1y.astype(jnp.int32), q1cb.astype(jnp.int32),
                 q1cr.astype(jnp.int32)) if is_b else None)
        ipy, ipcb, ipcr = inter_pred_planes(ref0, ref1, im, mv,
                                            ref_map=rmap)
        ry, rcb, rcr, lv_y, lv_cb, lv_cr = wavefront_commit_mixed(
            sy, scb, scr, dm, mm, im, ipy, ipcb, ipcr,
            qp_y, qp_cb, qp_cr, coded_w, coded_h, 8, sdh,
            tile_bounds_x, tile_bounds_y, rdoq=rdoq,
            lam=(lam_sqrt * lam_sqrt).astype(jnp.float32))
        if deblock_on:
            cbf = tu_cbf_map(lv_y, dm, log2_ctu)
            # normalize: merge-candidate MVs of unused lists are zeroed
            bs_v, bs_h = inter_bs_maps(dm, im, mv, cbf, ref_map=rmap)
            ry, rcb, rcr = deblock_device(ry, rcb, rcr, dm,
                                          qp_for_deblock, qp_cb, qp_cr,
                                          log2_ctu, bs_vert=bs_v,
                                          bs_horz=bs_h)
        if sao_on:
            ry, rcb, rcr, sao_params = sao_device(sy, scb, scr, ry, rcb,
                                                  rcr, log2_ctu)
        else:
            ny = -(-coded_h // (1 << log2_ctu))
            nx = -(-coded_w // (1 << log2_ctu))
            sao_params = jnp.zeros((ny, nx, 3, 7), jnp.int32)
        ry8 = ry.astype(jnp.uint8)
        rcb8 = rcb.astype(jnp.uint8)
        rcr8 = rcr.astype(jnp.uint8)
        cksum = jnp.stack([_device_checksum(ry8), _device_checksum(rcb8),
                           _device_checksum(rcr8)])

        def to8(lv):
            return (jnp.clip(lv, -128, 127).astype(jnp.int8),
                    jnp.any(jnp.abs(lv.astype(jnp.int32)) > 127))

        lv8_y, of_y = to8(lv_y)
        lv8_cb, of_cb = to8(lv_cb)
        lv8_cr, of_cr = to8(lv_cr)
        return dict(packed=pk,
                    lv8_y=lv8_y, lv8_cb=lv8_cb, lv8_cr=lv8_cr,
                    overflow=jnp.stack([of_y, of_cb, of_cr]),
                    lv_y=lv_y, lv_cb=lv_cb, lv_cr=lv_cr,
                    rec_y=ry8, rec_cb=rcb8, rec_cr=rcr8,
                    cksum=cksum, sao=sao_params)

    return jax.vmap(one)(y_u8, cb_u8, cr_u8, packed, r0_y, r0_cb, r0_cr,
                         r1_y, r1_cb, r1_cr, qp_y, qp_cb, qp_cr,
                         qp_for_deblock, lambda_sqrt)
