"""All-intra device pipeline: search + commit + in-loop filters in ONE
TPU dispatch per frame group; the host does CABAC emission only.

This is the SURVEY.md §7.0 decision-then-commit design taken to its end
state: the whole pixel path (batched RDO search -> wavefront exact
reconstruction -> deblock -> SAO estimate/apply) lives on device, and the
only host work per frame is the sequential bit emission (C++
hevc_entropy_slice_tiled) plus NAL/MD5 glue. One dispatch per FRAME_GROUP
frames amortizes the axon tunnel round-trip; outputs are fetched as a
single pytree.

Scope guard (device_path_ok): intra slices, CTU 32, 8-bit, no lossless,
no RDOQ (the classic C++ commit path remains for everything else).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.commit import wavefront_commit_intra
from ..ops.deblock import deblock_device
from ..ops.sao import sao_device
from .search import _search_intra_maps_impl


def device_path_ok(cfg, sp) -> bool:
    return (sp.log2_ctu == 5 and sp.bit_depth == 8 and not cfg.lossless
            and not cfg.rdoq)


@partial(jax.jit, static_argnames=("log2_ctu", "log2_min_cu", "coded_w",
                                   "coded_h", "sdh", "deblock_on", "sao_on",
                                   "tile_bounds_x", "tile_bounds_y",
                                   "use_cnn"))
def encode_group_device(y_u8, cb_u8, cr_u8, lambda_sqrt, qp_y, qp_cb,
                        qp_cr, qp_for_deblock, log2_ctu: int,
                        log2_min_cu: int, coded_w: int, coded_h: int,
                        sdh: bool, deblock_on: bool, sao_on: bool,
                        tile_bounds_x: tuple = (),
                        tile_bounds_y: tuple = (),
                        cnn_params=None, qp: int = 0,
                        use_cnn: bool = False):
    """Search + exact commit + filters for F frames in one dispatch.

    y_u8: [F, PH, PW] uint8 (CTU-padded), cb/cr_u8: [F, PH/2, PW/2].
    qp_*: dynamic int32 scalars (temporal cascade / rate control).
    Returns dict of stacked per-frame outputs (device arrays).
    """
    gh, gw = coded_h >> 3, coded_w >> 3

    def one(y, cbp, crp):
        packed = _search_intra_maps_impl(y, lambda_sqrt, log2_ctu,
                                         log2_min_cu, coded_w, coded_h,
                                         cnn_params, qp, use_cnn,
                                         cb_u8=cbp, cr_u8=crp)
        dm = packed[:gh, :gw, 0].astype(jnp.int32)
        mm = packed[:gh, :gw, 1].astype(jnp.int32)
        sy = y[:coded_h, :coded_w].astype(jnp.int32)
        scb = cbp[:coded_h // 2, :coded_w // 2].astype(jnp.int32)
        scr = crp[:coded_h // 2, :coded_w // 2].astype(jnp.int32)
        ry, rcb, rcr, lv_y, lv_cb, lv_cr = wavefront_commit_intra(
            sy, scb, scr, dm, mm, qp_y, qp_cb, qp_cr, coded_w, coded_h,
            8, sdh, tile_bounds_x, tile_bounds_y)
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
        return dict(packed=packed,
                    lv_y=lv_y, lv_cb=lv_cb, lv_cr=lv_cr,
                    rec_y=ry.astype(jnp.uint8),
                    rec_cb=rcb.astype(jnp.uint8),
                    rec_cr=rcr.astype(jnp.uint8),
                    sao=sao_params)

    return jax.vmap(one)(y_u8, cb_u8, cr_u8)
