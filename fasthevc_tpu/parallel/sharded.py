"""Sharded intra encode pipeline: ("gop", "tile") mesh, load-bearing
halo exchange (SURVEY.md §2.4 P1/P4/P6, §5.7).

Each (gop, tile) shard owns a CTU-aligned tile COLUMN of its frames and
runs the full device pixel path on it:

  1. SEARCH on a halo-extended source plane — one `lax.ppermute` brings
     the left neighbor's last CTU column and the right neighbor's first
     two CTU columns, so every block's source references (top row extends
     2N right, left column 1 left) are identical to the unsharded search.
  2. COMMIT per tile via the wavefront kernel — HEVC tiles never predict
     across tile boundaries, so the per-shard commit with tile-local
     dimensions is bit-identical to the global tiled commit (no halo).
  3. DEBLOCK with an 8-column recon halo — the vertical edges ON the tile
     boundary read 4 samples from each side (spec 8.7.2,
     loop_filter_across_tiles_enabled_flag = 1), so each shard exchanges
     post-commit recon strips, filters the boundary edges redundantly,
     and keeps only its own columns. Horizontal edges are column-local.

The result is BYTE-IDENTICAL to the single-device encoder on the same
tile grid (asserted by tests/test_sharded_pipeline.py) — the property
test SURVEY.md §7.3.5 prescribes.  Step 4 (intra path): SAO with a 1-px
deblocked-recon classification halo — estimate+apply per tile equals
the full-plane pass, so the sharded stream stays byte-identical with
SAO ON too.  Entropy is host C++ per tile, unchanged.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..ops.commit import wavefront_commit_intra
from ..ops.deblock import BETA_TABLE, TC_TABLE, _filter_vert_chroma, \
    _filter_vert_luma, edge_masks_device
from ..codec.search import _search_intra_maps_impl

CTU = 32


def _ppermute_halo(x, axis_name, n_shards, width_left, width_right,
                   axis=-1):
    """Exchange halos along the last axis: returns (from_left, from_right)
    where from_left is the LEFT neighbor's rightmost `width_left` columns
    and from_right the RIGHT neighbor's leftmost `width_right` columns.
    Global-boundary shards receive edge-replicated own columns."""
    idx = jax.lax.axis_index(axis_name)
    right_perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]
    left_perm = [(i, (i - 1) % n_shards) for i in range(n_shards)]
    mine_last = x[..., -width_left:]
    mine_first = x[..., :width_right]
    from_left = jax.lax.ppermute(mine_last, axis_name, right_perm)
    from_right = jax.lax.ppermute(mine_first, axis_name, left_perm)
    # replicate own edge at the picture boundary (grid_refs edge-pad rule)
    edge_l = jnp.repeat(x[..., :1], width_left, axis=-1)
    edge_r = jnp.repeat(x[..., -1:], width_right, axis=-1)
    from_left = jnp.where(idx == 0, edge_l, from_left)
    from_right = jnp.where(idx == n_shards - 1, edge_r, from_right)
    return from_left, from_right


def _deblock_sharded_cols(rec_y, rec_cb, rec_cr, depth, qp, qp_cb, qp_cr,
                          axis_name, n_shards, bit_depth=8,
                          bs_vert_ext=None, bs_horz=None):
    """Cross-tile deblock for column shards: 8-luma-column halo exchange,
    redundant boundary-edge compute, keep own columns. Bit-identical to
    deblock_device on the assembled frame.

    bs_vert_ext [h/4, (w+16)/8] / bs_horz [w/4, h/8]: P/B boundary
    strengths on the halo-extended vertical grid and the own-column
    horizontal grid (ops.deblock.inter_bs_maps); None = all-intra BS 2."""
    h, w = rec_y.shape
    idx = jax.lax.axis_index(axis_name)
    gh, gw = h // 8, w // 8
    halo = 8

    # halos: post-commit recon + depth (1 granule col each side)
    ly, ry = _ppermute_halo(rec_y, axis_name, n_shards, halo, halo)
    lcb, rcb_h = _ppermute_halo(rec_cb, axis_name, n_shards, halo // 2,
                                halo // 2)
    lcr, rcr_h = _ppermute_halo(rec_cr, axis_name, n_shards, halo // 2,
                                halo // 2)
    ld, rd = _ppermute_halo(depth, axis_name, n_shards, 1, 1)
    ext_y = jnp.concatenate([ly, rec_y, ry], axis=1)       # [h, w+16]
    ext_cb = jnp.concatenate([lcb, rec_cb, rcb_h], axis=1)
    ext_cr = jnp.concatenate([lcr, rec_cr, rcr_h], axis=1)
    ext_d = jnp.concatenate([ld, depth, rd], axis=1)       # [gh, gw+2]

    # edge flags on the extended grid, with GLOBAL column positions
    size = (1 << 5) >> ext_d.astype(jnp.int32)
    gx_glob = (jnp.arange(gw + 2) - 1 + idx * gw) * 8      # luma cols
    gy = (jnp.arange(gh) * 8)[:, None]
    vert = ((gx_glob[None, :] % size) == 0) & (gx_glob[None, :] > 0) \
        & (gx_glob[None, :] < n_shards * w)   # no edge at/past the
    # global picture right boundary (the halo there is edge-replicated)
    horz = ((gy % size) == 0) & (gy > 0)

    vseg = jnp.repeat(vert, 2, axis=0)
    bsv = jnp.where(vseg, jnp.int32(2) if bs_vert_ext is None
                    else bs_vert_ext, jnp.int32(0))
    y_f = _filter_vert_luma(ext_y.astype(jnp.int32), vseg, bsv, qp,
                            bit_depth)[:, halo:halo + w]
    # horizontal: column-local, reuse the transpose path on own columns
    hseg = jnp.repeat(horz[:, 1:-1], 2, axis=1).T
    bsh = jnp.where(hseg, jnp.int32(2) if bs_horz is None else bs_horz,
                    jnp.int32(0))
    y_f = _filter_vert_luma(y_f.T, hseg, bsh, qp, bit_depth).T

    # chroma: edges on the 16-luma grid, filtered only at BS 2
    cvert = vert & ((gx_glob % 16) == 0)[None, :]
    chorz = horz & ((jnp.arange(gh) % 2) == 0)[:, None]
    if bs_vert_ext is not None:
        cvert = cvert & (bs_vert_ext[0::2] == 2)
    if bs_horz is not None:
        # bs_horz[0::2]: [w/8, h/8] -> own columns of chorz ([gh, gw+2])
        own = chorz[:, 1:-1] & (bs_horz[0::2] == 2).T
        chorz = jnp.concatenate([chorz[:, :1], own, chorz[:, -1:]],
                                axis=1)
    ch = halo // 2
    cb_f = _filter_vert_chroma(ext_cb.astype(jnp.int32), cvert, qp_cb,
                               bit_depth)[:, ch:ch + w // 2]
    cb_f = _filter_vert_chroma(cb_f.T, chorz[:, 1:-1].T, qp_cb,
                               bit_depth).T
    cr_f = _filter_vert_chroma(ext_cr.astype(jnp.int32), cvert, qp_cr,
                               bit_depth)[:, ch:ch + w // 2]
    cr_f = _filter_vert_chroma(cr_f.T, chorz[:, 1:-1].T, qp_cr,
                               bit_depth).T
    return y_f, cb_f, cr_f


def build_sharded_intra_pipeline(mesh: Mesh, coded_w: int, coded_h: int,
                                 log2_ctu: int = 5, log2_min_cu: int = 3,
                                 deblock_on: bool = True, sdh: bool = True,
                                 rdoq: bool = False, sao_on: bool = False):
    """Jitted ("gop","tile")-sharded search+commit+deblock for intra
    frames. Tile columns are uniform (coded_w divisible by n_tile CTU
    columns). Frames [G, H, W] uint8 enter sharded P("gop", None, "tile");
    outputs come back with the same layout for host entropy."""
    n_tile = mesh.shape["tile"]
    assert coded_w % (n_tile * (1 << log2_ctu)) == 0, \
        "uniform CTU-aligned tile columns required"
    tile_w = coded_w // n_tile
    assert tile_w >= 2 * CTU, \
        "tile columns must be >= 2 CTUs wide (halo from one neighbor)"
    halo_r = 2 * CTU   # top-right source references reach 2N = 64 right

    def per_shard(y, cb, cr, lam, qp_y, qp_cb, qp_cr, qp):
        # y: [g_local, H, tile_w] uint8
        def one_frame(yt, cbt, crt):
            # --- 1. search with source halo (exact unsharded twin) ----
            yl, yr = _ppermute_halo(yt, "tile", n_tile, CTU, halo_r)
            ext = jnp.concatenate([yl, yt, yr], axis=1)
            # chroma halo: reference reach is 2*16 chroma cols = halo_r/2
            cbl, cbr = _ppermute_halo(cbt, "tile", n_tile, CTU // 2,
                                      halo_r // 2)
            crl, crr = _ppermute_halo(crt, "tile", n_tile, CTU // 2,
                                      halo_r // 2)
            ext_cb = jnp.concatenate([cbl, cbt, cbr], axis=1)
            ext_cr = jnp.concatenate([crl, crt, crr], axis=1)
            packed_ext = _search_intra_maps_impl(
                ext, lam, log2_ctu, log2_min_cu, ext.shape[1], coded_h,
                None, 0, False, cb_u8=ext_cb, cr_u8=ext_cr,
                mpm_edge_x=CTU,
                mpm_edge_on=jax.lax.axis_index("tile") == 0)
            g0 = CTU >> 3
            packed = packed_ext[:, g0:g0 + (tile_w >> 3)]
            dm = packed[:coded_h >> 3, :, 0].astype(jnp.int32)
            mm = packed[:coded_h >> 3, :, 1].astype(jnp.int32)
            # --- 2. per-tile exact commit (no halo: tiles are closed) --
            ry, rcb, rcr, lv_y, lv_cb, lv_cr = wavefront_commit_intra(
                yt[:coded_h].astype(jnp.int32),
                cbt[:coded_h // 2].astype(jnp.int32),
                crt[:coded_h // 2].astype(jnp.int32),
                dm, mm, qp_y, qp_cb, qp_cr, tile_w, coded_h, 8, sdh,
                rdoq=rdoq, lam=(lam * lam).astype(jnp.float32))
            # --- 3. cross-tile deblock via recon halo (P6) -------------
            if deblock_on:
                ry, rcb, rcr = _deblock_sharded_cols(
                    ry, rcb, rcr, dm, qp, qp_cb, qp_cr, "tile", n_tile)
            if sao_on:
                # --- 4. SAO with the 1-px classification halo (P6):
                # deblocked neighbor columns ride the interconnect so
                # each tile's estimate+apply equals the full-plane pass
                from ..ops.sao import sao_device
                idx = jax.lax.axis_index("tile")
                l_av, r_av = idx > 0, idx < n_tile - 1
                hy = _ppermute_halo(ry, "tile", n_tile, 1, 1)
                hcb = _ppermute_halo(rcb, "tile", n_tile, 1, 1)
                hcr = _ppermute_halo(rcr, "tile", n_tile, 1, 1)
                ry, rcb, rcr, sao_p = sao_device(
                    yt[:coded_h].astype(jnp.int32),
                    cbt[:coded_h // 2].astype(jnp.int32),
                    crt[:coded_h // 2].astype(jnp.int32),
                    ry, rcb, rcr, log2_ctu, has_halo=True,
                    halo_y=(hy[0][:, 0], hy[1][:, 0]),
                    halo_cb=(hcb[0][:, 0], hcb[1][:, 0]),
                    halo_cr=(hcr[0][:, 0], hcr[1][:, 0]),
                    l_avail=l_av, r_avail=r_av)
            else:
                ny = -(-coded_h // (1 << log2_ctu))
                nx = tile_w >> log2_ctu
                sao_p = jnp.zeros((ny, nx, 3, 7), jnp.int32)
            return (packed, lv_y, lv_cb, lv_cr,
                    ry.astype(jnp.uint8), rcb.astype(jnp.uint8),
                    rcr.astype(jnp.uint8), sao_p)

        return jax.vmap(one_frame)(y, cb, cr)

    mapped = shard_map(
        per_shard, mesh=mesh,
        in_specs=(P("gop", None, "tile"), P("gop", None, "tile"),
                  P("gop", None, "tile"), P(), P(), P(), P(), P()),
        out_specs=(P("gop", None, "tile", None),   # packed [G, gh, gw, 7]
                   P("gop", None, "tile"), P("gop", None, "tile"),
                   P("gop", None, "tile"),
                   P("gop", None, "tile"), P("gop", None, "tile"),
                   P("gop", None, "tile"),
                   P("gop", None, "tile", None, None)),  # sao params
        check_rep=False)

    @jax.jit
    def run(y, cb, cr, lam, qp_y, qp_cb, qp_cr, qp):
        return mapped(y, cb, cr, lam, qp_y, qp_cb, qp_cr, qp)

    return run


def sharded_encode_all_intra(frames, cfg, mesh: Mesh):
    """Encode an all-intra clip on a ("gop","tile") mesh; returns the
    Annex-B stream (byte-identical to TpuEncoder on the same tile grid
    with SAO off) plus recon planes.

    Host side: upload frames sharded, run the pipeline, then per frame
    emit the per-tile CABAC substreams (C++), slice headers with entry
    points, and the hash SEI."""
    from .. import cabac_cpp
    from ..spec import bitstream as bs
    from ..spec.cabac import ContextSet
    from ..spec.ctu import Planes, tu_qps
    from ..spec.encoder import config_to_sp
    from ..spec.syntax import (SliceHeader, write_picture_hash_sei,
                               write_pps, write_slice_header, write_sps,
                               write_vps)
    from ..utils.video import pad_plane, picture_hash

    n_tile = mesh.shape["tile"]
    n_gop = mesh.shape["gop"]
    cfg = cfg.replace(tile_cols=n_tile, tile_rows=1)
    sp = config_to_sp(cfg)
    sp.sao_enabled = bool(cfg.sao)
    sp.deblocking_disabled = not cfg.deblocking
    qp = cfg.qp
    qp_y, qp_cb, qp_cr = tu_qps(sp, qp)
    lam = 0.57 * 2.0 ** ((qp - 12) / 3.0)
    pipeline = build_sharded_intra_pipeline(
        mesh, sp.coded_width, sp.coded_height, sp.log2_ctu,
        sp.log2_min_cu, deblock_on=cfg.deblocking, sdh=sp.sign_data_hiding,
        rdoq=bool(cfg.rdoq), sao_on=bool(cfg.sao))

    n = len(frames)
    ph = -(-sp.coded_height // CTU) * CTU
    # groups of n_gop frames fill the gop axis
    out = bytearray(bs.write_nal(bs.NAL_VPS, write_vps(sp))
                    + bs.write_nal(bs.NAL_SPS, write_sps(sp))
                    + bs.write_nal(bs.NAL_PPS, write_pps(sp)))
    recons = []
    gh, gw = sp.coded_height >> 3, sp.coded_width >> 3
    for s in range(0, n, n_gop):
        grp = list(range(s, min(s + n_gop, n)))
        while len(grp) < n_gop:          # pad the gop axis
            grp.append(grp[-1])
        ys = np.stack([pad_plane(np.asarray(frames[i][0], np.int32), ph,
                                 sp.coded_width).astype(np.uint8)
                       for i in grp])
        cbs = np.stack([pad_plane(np.asarray(frames[i][1], np.int32),
                                  ph // 2, sp.coded_width // 2)
                        .astype(np.uint8) for i in grp])
        crs = np.stack([pad_plane(np.asarray(frames[i][2], np.int32),
                                  ph // 2, sp.coded_width // 2)
                        .astype(np.uint8) for i in grp])
        spec_in = NamedSharding(mesh, P("gop", None, "tile"))
        res = pipeline(jax.device_put(jnp.asarray(ys), spec_in),
                       jax.device_put(jnp.asarray(cbs), spec_in),
                       jax.device_put(jnp.asarray(crs), spec_in),
                       jnp.float32(np.sqrt(lam)), jnp.int32(qp_y),
                       jnp.int32(qp_cb), jnp.int32(qp_cr), jnp.int32(qp))
        packed, lv_y, lv_cb, lv_cr, ry, rcb, rcr, sao_np = \
            (np.asarray(r) for r in res)
        for j, i in enumerate(grp):
            if i != s + j:               # padded duplicate
                break
            depth = np.ascontiguousarray(packed[j, :gh, :gw, 0]
                                         .astype(np.int8))
            mode = np.ascontiguousarray(packed[j, :gh, :gw, 1]
                                        .astype(np.int8))
            subs = cabac_cpp.entropy_slice_native(
                sp, qp_y, qp_cb, qp_cr, depth, mode, lv_y[j], lv_cb[j],
                lv_cr[j], ContextSet(0, qp),
                sao_params=sao_np[j] if cfg.sao else None,
                sdh=sp.sign_data_hiding, ts=sp.transform_skip_enabled)
            sh = SliceHeader(slice_type=2, slice_qp=qp, is_idr=True,
                             poc_lsb=0, sao_luma=bool(cfg.sao),
                             sao_chroma=bool(cfg.sao),
                             entry_points=tuple(len(x) for x in subs[:-1]))
            w = write_slice_header(sh, sp, bs.NAL_IDR_W_RADL)
            for s_bytes in subs:
                w.append_bytes(s_bytes)
            planes = Planes.__new__(Planes)
            planes.y = ry[j].astype(np.int32)
            planes.cb = rcb[j].astype(np.int32)
            planes.cr = rcr[j].astype(np.int32)
            out += bs.write_nal(bs.NAL_IDR_W_RADL, w.get_bytes())
            md5s = picture_hash((planes.y, planes.cb, planes.cr),
                                cfg.hash_type)
            out += bs.write_nal(bs.NAL_SUFFIX_SEI,
                                write_picture_hash_sei(md5s, cfg.hash_type))
            recons.append(planes)
    return bytes(out), recons


# ---------------------------------------------------------------------------
# Inter (P) tile sharding with ME-window halo exchange (SURVEY.md §2.4 P6,
# §5.7; the BASELINE north-star mechanism: "motion estimation reading
# remote reference windows through halo exchange")
# ---------------------------------------------------------------------------

def _me_halo_ctus(search_range: int) -> int:
    """CTU columns of halo each side so that every KEPT block's decision
    chain is exact: its own ME windows (+-SR, +8 sub-pel/tap margin) and
    its LEFT-neighbor candidate's ME windows (one 32-block further).
    Intra needs >=1 left / >=2 right (top-right reference reach 2N)."""
    need = 32 + search_range + 8
    return max(2, -(-need // 32))


def build_sharded_p_pipeline(mesh: Mesh, coded_w: int, coded_h: int,
                             search_range: int, log2_ctu: int = 5,
                             log2_min_cu: int = 3, deblock_on: bool = True,
                             sdh: bool = True, rdoq: bool = False,
                             sao_on: bool = False, is_b: bool = False):
    """Jitted ("gop","tile")-sharded P/B-frame search+MC+commit+deblock.

    Each tile shard ppermutes +-halo CTU columns of the REFERENCE recon
    from its neighbors before motion estimation — remote reference
    windows ride the mesh interconnect, never the host.  is_b adds a
    second reference list (hierarchical-B on the mesh, SURVEY.md §5.7):
    both lists' windows ride the same ppermute halos and the search is
    the exact search_b_maps twin.  Decisions and reconstruction are
    byte-identical to the unsharded device pipeline on the same tile
    grid (tests/test_sharded_pipeline.py)."""
    from ..codec.search import search_b_maps, search_p_maps
    from ..ops.commit import wavefront_commit_mixed
    from ..ops.deblock import inter_bs_maps, tu_cbf_map
    from ..ops.me import inter_pred_planes

    n_tile = mesh.shape["tile"]
    assert coded_w % (n_tile * (1 << log2_ctu)) == 0
    tile_w = coded_w // n_tile
    hc = _me_halo_ctus(search_range)
    halo = hc * CTU
    assert tile_w >= halo, (
        f"tile columns ({tile_w}) must be >= the ME halo ({halo}) — "
        f"one-neighbor ppermute")

    def per_shard(y, cb, cr, ref_y, ref_cb, ref_cr, r1_y, r1_cb, r1_cr,
                  lam, qp_y, qp_cb, qp_cr, qp):
        def one_frame(yt, cbt, crt, ry_t, rcb_t, rcr_t, r1y_t, r1cb_t,
                      r1cr_t):
            # --- halos: current source + REFERENCE windows (P6) --------
            def ext2(p, wl, wr):
                left, right = _ppermute_halo(p, "tile", n_tile, wl, wr)
                return jnp.concatenate([left, p, right], axis=1)

            ext = ext2(yt, halo, halo)
            ext_cb = ext2(cbt, halo // 2, halo // 2)
            ext_cr = ext2(crt, halo // 2, halo // 2)
            ref_ext = ext2(ry_t, halo, halo)
            ref_ecb = ext2(rcb_t, halo // 2, halo // 2)
            ref_ecr = ext2(rcr_t, halo // 2, halo // 2)
            if is_b:
                r1_ext = ext2(r1y_t, halo, halo)
                r1_ecb = ext2(r1cb_t, halo // 2, halo // 2)
                r1_ecr = ext2(r1cr_t, halo // 2, halo // 2)
            # --- search on the halo-extended planes (exact twin) --------
            if is_b:
                packed_ext = search_b_maps(
                    ext, ref_ext, r1_ext, lam, log2_ctu, log2_min_cu,
                    ext.shape[1], coded_h, search_range, mpm_edge_x=halo,
                    mpm_edge_on=jax.lax.axis_index("tile") == 0)
            else:
                packed_ext = search_p_maps(
                    ext, ref_ext, lam, log2_ctu, log2_min_cu, ext.shape[1],
                    coded_h, search_range, mpm_edge_x=halo,
                    mpm_edge_on=jax.lax.axis_index("tile") == 0)
            g0 = halo >> 3
            gt = tile_w >> 3
            gh = coded_h >> 3
            packed = packed_ext[:gh, g0:g0 + gt]
            dm = packed[..., 0].astype(jnp.int32)
            mm = packed[..., 1].astype(jnp.int32)
            im = packed[..., 2].astype(jnp.int32)
            mv = packed[..., 3:7].astype(jnp.int32)
            # --- MC pred on the extended geometry, cropped to the tile --
            dm_e = packed_ext[:gh, :, 0].astype(jnp.int32)
            im_e = packed_ext[:gh, :, 2].astype(jnp.int32)
            mv_e = packed_ext[:gh, :, 3:7].astype(jnp.int32)
            ipy, ipcb, ipcr = inter_pred_planes(
                (ref_ext[:coded_h].astype(jnp.int32),
                 ref_ecb[:coded_h // 2].astype(jnp.int32),
                 ref_ecr[:coded_h // 2].astype(jnp.int32)),
                ((r1_ext[:coded_h].astype(jnp.int32),
                  r1_ecb[:coded_h // 2].astype(jnp.int32),
                  r1_ecr[:coded_h // 2].astype(jnp.int32)) if is_b
                 else None),
                im_e, mv_e)
            ipy = ipy[:, halo:halo + tile_w]
            ipcb = ipcb[:, halo // 2:(halo + tile_w) // 2]
            ipcr = ipcr[:, halo // 2:(halo + tile_w) // 2]
            # --- per-tile exact mixed commit (tiles are closed) ---------
            ry, rcb, rcr, lv_y, lv_cb, lv_cr = wavefront_commit_mixed(
                yt[:coded_h].astype(jnp.int32),
                cbt[:coded_h // 2].astype(jnp.int32),
                crt[:coded_h // 2].astype(jnp.int32),
                dm, mm, im, ipy, ipcb, ipcr,
                qp_y, qp_cb, qp_cr, tile_w, coded_h, 8, sdh,
                rdoq=rdoq, lam=(lam * lam).astype(jnp.float32))
            if deblock_on:
                cbf = tu_cbf_map(lv_y, dm, log2_ctu)
                cl, cr_h = _ppermute_halo(cbf.astype(jnp.int32), "tile",
                                          n_tile, 1, 1)
                il, ir = _ppermute_halo(im, "tile", n_tile, 1, 1)
                ml, mr = _ppermute_halo(
                    mv.reshape(gh, gt * 4), "tile", n_tile, 4, 4)
                cbf_e = jnp.concatenate([cl, cbf.astype(jnp.int32), cr_h],
                                        axis=1)
                im_eh = jnp.concatenate([il, im, ir], axis=1)
                mv_eh = jnp.concatenate(
                    [ml.reshape(gh, 1, 4), mv,
                     mr.reshape(gh, 1, 4)], axis=1)
                dl, dr = _ppermute_halo(dm, "tile", n_tile, 1, 1)
                dm_eh = jnp.concatenate([dl, dm, dr], axis=1)
                bs_v_e, _bs_h_e = inter_bs_maps(dm_eh, im_eh, mv_eh, cbf_e)
                _bs_v_own, bs_h = inter_bs_maps(dm, im, mv, cbf)
                ry, rcb, rcr = _deblock_sharded_cols(
                    ry, rcb, rcr, dm, qp, qp_cb, qp_cr, "tile", n_tile,
                    bs_vert_ext=bs_v_e, bs_horz=bs_h)
            if sao_on:
                # SAO classification halo (P6) — same as the intra path
                from ..ops.sao import sao_device
                idx = jax.lax.axis_index("tile")
                l_av, r_av = idx > 0, idx < n_tile - 1
                hy = _ppermute_halo(ry, "tile", n_tile, 1, 1)
                hcb = _ppermute_halo(rcb, "tile", n_tile, 1, 1)
                hcr = _ppermute_halo(rcr, "tile", n_tile, 1, 1)
                ry, rcb, rcr, sao_p = sao_device(
                    yt[:coded_h].astype(jnp.int32),
                    cbt[:coded_h // 2].astype(jnp.int32),
                    crt[:coded_h // 2].astype(jnp.int32),
                    ry, rcb, rcr, log2_ctu, has_halo=True,
                    halo_y=(hy[0][:, 0], hy[1][:, 0]),
                    halo_cb=(hcb[0][:, 0], hcb[1][:, 0]),
                    halo_cr=(hcr[0][:, 0], hcr[1][:, 0]),
                    l_avail=l_av, r_avail=r_av)
            else:
                ny = -(-coded_h // (1 << log2_ctu))
                nx = tile_w >> log2_ctu
                sao_p = jnp.zeros((ny, nx, 3, 7), jnp.int32)
            return (packed, lv_y, lv_cb, lv_cr,
                    ry.astype(jnp.uint8), rcb.astype(jnp.uint8),
                    rcr.astype(jnp.uint8), sao_p)

        return jax.vmap(one_frame)(y, cb, cr, ref_y, ref_cb, ref_cr,
                                   r1_y, r1_cb, r1_cr)

    mapped = shard_map(
        per_shard, mesh=mesh,
        in_specs=(P("gop", None, "tile"),) * 9 + (P(),) * 5,
        out_specs=(P("gop", None, "tile", None),
                   P("gop", None, "tile"), P("gop", None, "tile"),
                   P("gop", None, "tile"),
                   P("gop", None, "tile"), P("gop", None, "tile"),
                   P("gop", None, "tile"),
                   P("gop", None, "tile", None, None)),
        check_rep=False)

    @jax.jit
    def run(y, cb, cr, ry, rcb, rcr, r1y, r1cb, r1cr, lam, qp_y, qp_cb,
            qp_cr, qp):
        return mapped(y, cb, cr, ry, rcb, rcr, r1y, r1cb, r1cr, lam,
                      qp_y, qp_cb, qp_cr, qp)

    return run


def sharded_encode_gop(frames, cfg, mesh: Mesh):
    """Encode on a ("gop","tile") mesh with INTER frames: each gop-axis
    shard owns an independent IDR-led segment (closed-GOP parallelism,
    P4) and the tile shards within it cooperate per frame — intra refs,
    ME reference windows and deblock strips ride the mesh via ppermute
    halos (P1/P6).  Reference recon stays device-resident and SHARDED
    between frames (the DPB never crosses the host).

    cfg must describe the equivalent single-device encode: tiles =
    mesh tile shards, intra_period = len(frames)/n_gop, and a GOP table
    of P and/or hierarchical-B entries with at most ONE active reference
    per list on the mesh (the multi-ref search is single-device-only for
    now).  Per-entry QP offsets and TMVP syntax replay are honored, so
    the output stream is byte-identical to TpuEncoder(cfg).encode(frames)
    on the same config (tests/test_sharded_pipeline.py)."""
    from .. import cabac_cpp
    from ..spec import bitstream as bs
    from ..spec.cabac import ContextSet
    from ..spec.ctu import Planes, tu_qps
    from ..spec.encoder import config_to_sp
    from ..spec.syntax import (SliceHeader, write_picture_hash_sei,
                               write_pps, write_slice_header, write_sps,
                               write_vps)
    from ..utils.video import pad_plane, picture_hash

    n_tile = mesh.shape["tile"]
    n_gop = mesh.shape["gop"]
    n = len(frames)
    assert n % n_gop == 0, "frames must split evenly into gop segments"
    seg = n // n_gop
    cfg = cfg.replace(tile_cols=n_tile, tile_rows=1,
                      intra_period=seg)
    sp = config_to_sp(cfg)
    sp.sao_enabled = bool(cfg.sao)
    sp.deblocking_disabled = not cfg.deblocking
    qp = cfg.qp
    qp_y, qp_cb, qp_cr = tu_qps(sp, qp)
    lam = jnp.float32(np.sqrt(0.57 * 2.0 ** ((qp - 12) / 3.0)))
    run_i = build_sharded_intra_pipeline(
        mesh, sp.coded_width, sp.coded_height, sp.log2_ctu,
        sp.log2_min_cu, deblock_on=cfg.deblocking, sdh=sp.sign_data_hiding,
        rdoq=bool(cfg.rdoq), sao_on=bool(cfg.sao))
    run_p = build_sharded_p_pipeline(
        mesh, sp.coded_width, sp.coded_height, cfg.search_range,
        sp.log2_ctu, sp.log2_min_cu, deblock_on=cfg.deblocking,
        sdh=sp.sign_data_hiding, rdoq=bool(cfg.rdoq), sao_on=bool(cfg.sao))
    run_b = None  # built lazily: only GOP tables with B entries pay it

    ph = -(-sp.coded_height // CTU) * CTU
    gh, gw = sp.coded_height >> 3, sp.coded_width >> 3
    spec_in = NamedSharding(mesh, P("gop", None, "tile"))

    def upload(step):
        idx = [r * seg + step for r in range(n_gop)]
        ys = np.stack([pad_plane(np.asarray(frames[i][0], np.int32), ph,
                                 sp.coded_width).astype(np.uint8)
                       for i in idx])
        cbs = np.stack([pad_plane(np.asarray(frames[i][1], np.int32),
                                  ph // 2, sp.coded_width // 2)
                        .astype(np.uint8) for i in idx])
        crs = np.stack([pad_plane(np.asarray(frames[i][2], np.int32),
                                  ph // 2, sp.coded_width // 2)
                        .astype(np.uint8) for i in idx])
        return (jax.device_put(jnp.asarray(ys), spec_in),
                jax.device_put(jnp.asarray(cbs), spec_in),
                jax.device_put(jnp.asarray(crs), spec_in))

    # ---- per-segment coding schedule: the exact pre-pass the single-
    # device gop engine runs (codec/encoder.py _encode_gop_device), so
    # decisions, mctx and slice headers line up byte-for-byte -----------
    from ..codec.gop import coding_order, ref_lists
    from ..spec.inter import MotionCtx
    seg_cfg = cfg.replace(frames=seg)
    order = coding_order(seg_cfg, seg, 0)
    entries = []  # (cvs_poc, st, l0, l1, deltas, qp_f)
    sim: set = set()
    for poc, st0, ref_deltas, qp_off in order:
        is_idr = st0 == 2
        st, _l0d, _l1d, deltas = ref_lists({p2: None for p2 in sim}, poc,
                                           st0, ref_deltas, is_idr)
        l0 = [poc - d for d in deltas[0]] + [poc + d for d in deltas[1]]
        l1 = [poc + d for d in deltas[1]] + [poc - d for d in deltas[0]]
        nr = max(1, min(2, cfg.num_ref_per_list))
        l0, l1 = l0[:nr], l1[:nr]
        if st != 2:
            assert len(l0) <= 1 and (st == 1 or len(l1) <= 1), (
                "sharded_encode_gop supports one active reference per "
                "list; set num_ref_per_list=1 or use single-ref GOP "
                "entries on the mesh")
        entries.append((poc, st, l0, l1, deltas,
                        min(max(cfg.qp + qp_off, 0), 51)))
        sim.add(poc)

    last_use: dict = {}
    for ci, e in enumerate(entries):
        for p2 in e[2] + e[3]:
            last_use[p2] = ci
    qp_cache: dict = {}

    def qps_of(q):
        if q not in qp_cache:
            qp_cache[q] = tu_qps(sp, q)
        return qp_cache[q]

    def pad_ref(t):
        ry, rcb, rcr = t
        return (jnp.pad(ry, ((0, 0), (0, ph - ry.shape[1]), (0, 0))),
                jnp.pad(rcb, ((0, 0), (0, ph // 2 - rcb.shape[1]),
                              (0, 0))),
                jnp.pad(rcr, ((0, 0), (0, ph // 2 - rcr.shape[1]),
                              (0, 0))))

    dpb: dict = {}        # cvs_poc -> (ry, rcb, rcr) sharded device u8
    motion_dpb: dict = {} # cvs_poc -> per-row (dir8, mv8, refpoc) arrays
    per_frame = {}        # (row, ci) -> (nal bytes, planes)
    for ci, (poc, st, l0, l1, deltas, qpf) in enumerate(entries):
        yb, cbb, crb = upload(poc)
        qpf_y, qpf_cb, qpf_cr = qps_of(qpf)
        lam_f = jnp.float32(np.sqrt(0.57 * 2.0 ** ((qpf - 12) / 3.0)))
        if st == 2:
            res = run_i(yb, cbb, crb, lam_f, jnp.int32(qpf_y),
                        jnp.int32(qpf_cb), jnp.int32(qpf_cr),
                        jnp.int32(qpf))
        else:
            r0 = pad_ref(dpb[l0[0]])
            if st == 0:
                r1 = pad_ref(dpb[l1[0]])
                run = run_b
                if run is None:
                    run = run_b = build_sharded_p_pipeline(
                        mesh, sp.coded_width, sp.coded_height,
                        cfg.search_range, sp.log2_ctu, sp.log2_min_cu,
                        deblock_on=cfg.deblocking,
                        sdh=sp.sign_data_hiding, rdoq=bool(cfg.rdoq),
                        sao_on=bool(cfg.sao), is_b=True)
            else:
                r1 = r0
                run = run_p
            res = run(yb, cbb, crb, *r0, *r1, lam_f, jnp.int32(qpf_y),
                      jnp.int32(qpf_cb), jnp.int32(qpf_cr),
                      jnp.int32(qpf))
        packed, lv_y, lv_cb, lv_cr, ry, rcb, rcr, sao_p = res
        dpb[poc] = (ry, rcb, rcr)     # stays sharded on the mesh
        for p2 in [k2 for k2, v in last_use.items() if v == ci]:
            if p2 != poc:
                dpb.pop(p2, None)
                motion_dpb.pop(p2, None)
        packed_h, lvy_h, lvcb_h, lvcr_h, ry_h, rcb_h, rcr_h, sao_h = \
            (np.asarray(r) for r in res)
        # this frame's motion (canonical col form) for later TMVP replay
        # — for EVERY frame including the IDR, exactly like the single-
        # device path (a P collocating an intra picture engages TMVP
        # with an all-intra col map: no temporal candidate is found but
        # the slice-header temporal_mvp bit is 1; byte-identity demands
        # the same here)
        if sp.temporal_mvp_enabled:
            rows_m = []
            for r in range(n_gop):
                d8 = np.ascontiguousarray(
                    packed_h[r, :gh, :gw, 2].astype(np.int8))
                mv8 = np.ascontiguousarray(
                    packed_h[r, :gh, :gw, 3:7].astype(np.int16))
                r8 = packed_h[r, :gh, :gw, 7:9].astype(np.int32)
                rp = np.zeros((gh, gw, 2), np.int32)
                for li, lst in ((0, l0), (1, l1)):
                    if lst:
                        lut = np.asarray(lst, np.int32)
                        rp[..., li] = lut[np.clip(r8[..., li], 0,
                                                  len(lst) - 1)]
                rows_m.append((d8, mv8, rp))
            motion_dpb[poc] = rows_m
        for r in range(n_gop):
            depth = np.ascontiguousarray(packed_h[r, :gh, :gw, 0]
                                         .astype(np.int8))
            mode = np.ascontiguousarray(packed_h[r, :gh, :gw, 1]
                                        .astype(np.int8))
            kw = {}
            mctx = None
            if st != 2:
                kw["slice_type"] = st
                kw["dir_map"] = np.ascontiguousarray(
                    packed_h[r, :gh, :gw, 2].astype(np.int8))
                kw["mv_map"] = np.ascontiguousarray(
                    packed_h[r, :gh, :gw, 3:7].astype(np.int16))
                kw["ref_map"] = np.ascontiguousarray(
                    packed_h[r, :gh, :gw, 7:9].astype(np.int8))
                # mctx mirror of codec/encoder.py device_mctx
                col_from_l0 = st != 0
                mctx = MotionCtx(cur_poc=poc, l0_pocs=tuple(l0),
                                 l1_pocs=tuple(l1), tmvp=False,
                                 col_from_l0=col_from_l0,
                                 log2_ctu=sp.log2_ctu)
                if sp.temporal_mvp_enabled:
                    col_poc = (l0[0] if col_from_l0
                               else (l1[0] if l1 else None))
                    col = (motion_dpb.get(col_poc)
                           if col_poc is not None else None)
                    if col is not None:
                        mctx.tmvp = True
                        mctx.col_poc = col_poc
                        (mctx.col_dir, mctx.col_mv,
                         mctx.col_refpoc) = col[r]
            init_type = 0 if st == 2 else (1 if st == 1 else 2)
            subs = cabac_cpp.entropy_slice_native(
                sp, qpf_y, qpf_cb, qpf_cr, depth, mode, lvy_h[r],
                lvcb_h[r], lvcr_h[r], ContextSet(init_type, qpf),
                sao_params=sao_h[r] if cfg.sao else None,
                sdh=sp.sign_data_hiding, ts=sp.transform_skip_enabled,
                rqt=sp.max_transform_hierarchy_depth_inter > 0,
                mctx=mctx, **kw)
            is_idr = st == 2
            sh = SliceHeader(
                slice_type=st, slice_qp=qpf, is_idr=is_idr,
                poc_lsb=poc & ((1 << sp.log2_max_poc_lsb) - 1),
                ref_pocs_before=() if is_idr else deltas[0],
                ref_pocs_after=() if is_idr else deltas[1],
                num_ref_idx_l0=max(1, len(l0)),
                num_ref_idx_l1=max(1, len(l1)),
                temporal_mvp=bool(mctx and mctx.tmvp),
                collocated_from_l0=(mctx.col_from_l0 if mctx else True),
                sao_luma=bool(cfg.sao), sao_chroma=bool(cfg.sao),
                entry_points=tuple(len(x) for x in subs[:-1]))
            nal_type = bs.NAL_IDR_W_RADL if is_idr else bs.NAL_TRAIL_R
            w = write_slice_header(sh, sp, nal_type)
            for s_bytes in subs:
                w.append_bytes(s_bytes)
            planes = Planes.__new__(Planes)
            planes.y = ry_h[r].astype(np.int32)
            planes.cb = rcb_h[r].astype(np.int32)
            planes.cr = rcr_h[r].astype(np.int32)
            nal = bs.write_nal(nal_type, w.get_bytes())
            md5s = picture_hash((planes.y, planes.cb, planes.cr),
                                cfg.hash_type)
            nal += bs.write_nal(bs.NAL_SUFFIX_SEI,
                                write_picture_hash_sei(md5s,
                                                       cfg.hash_type))
            per_frame[(r, ci)] = (nal, planes, poc)

    out = bytearray(bs.write_nal(bs.NAL_VPS, write_vps(sp))
                    + bs.write_nal(bs.NAL_SPS, write_sps(sp))
                    + bs.write_nal(bs.NAL_PPS, write_pps(sp)))
    recon_by_disp: dict = {}
    for r in range(n_gop):
        for ci in range(len(entries)):
            nal, planes, poc = per_frame[(r, ci)]
            out += nal
            recon_by_disp[r * seg + poc] = planes
    recons = [recon_by_disp[i] for i in range(n)]
    return bytes(out), recons


# ---------------------------------------------------------------------------
# Inter (P) tile sharding with ME-window halo exchange (SURVEY.md §2.4 P6,
# §5.7; the BASELINE north-star mechanism: "motion estimation reading
# remote reference windows through halo exchange")

