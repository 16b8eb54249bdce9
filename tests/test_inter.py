"""Inter prediction: MC filters, merge/AMVP, MVD syntax, P-slice e2e."""

import numpy as np
import pytest

from fasthevc_tpu.config import EncoderConfig, low_delay_p
from fasthevc_tpu.spec import inter, mc
from fasthevc_tpu.spec.decoder import SpecDecoder
from fasthevc_tpu.spec.encoder import SpecEncoder
from fasthevc_tpu.utils import psnr, synthesize_yuv, yuv_from_planes


def test_mc_integer_copy():
    rng = np.random.default_rng(0)
    ref = rng.integers(0, 256, (64, 64)).astype(np.int32)
    out = mc.mc_luma(ref, 16, 16, 8, 8, mv_x=4 * 3, mv_y=4 * -2)
    np.testing.assert_array_equal(out, ref[14:22, 19:27])


def test_mc_half_pel_symmetric():
    # half-pel filter is symmetric: filtering a constant plane is identity
    ref = np.full((32, 32), 77, dtype=np.int32)
    out = mc.mc_luma(ref, 8, 8, 8, 8, mv_x=2, mv_y=2)
    np.testing.assert_array_equal(out, 77)


def test_mc_filter_taps():
    # impulse response along a row: half-pel taps [-1,4,-11,40,40,-11,4,-1]
    ref = np.zeros((16, 32), dtype=np.int32)
    ref[:, 10] = 64
    out = mc.mc_luma(ref, 7, 0, 8, 4, mv_x=2, mv_y=0)
    # sample at output x: taps hit ref columns (x+7)-3..+4
    # ref col 10 nonzero -> contributions follow the filter
    col = out[0]
    assert col.max() == 40  # 64*40/64 at the two nearest positions
    assert (col == 40).sum() == 2


def test_mc_chroma_eighth_pel():
    ref = np.full((16, 16), 100, dtype=np.int32)
    for fx in range(8):
        out = mc.mc_chroma(ref, 4, 4, 4, 4, mv_x=fx, mv_y=0)
        np.testing.assert_array_equal(out, 100)


def test_mc_edge_clamp():
    ref = np.arange(64, dtype=np.int32).reshape(8, 8)
    out = mc.mc_luma(ref, 0, 0, 4, 4, mv_x=-4 * 10, mv_y=0)
    np.testing.assert_array_equal(out, ref[:4, :1].repeat(4, axis=1))


def test_mvd_roundtrip():
    from fasthevc_tpu.spec import bitstream as bs
    from fasthevc_tpu.spec import cabac
    vals = [(0, 0), (1, 0), (0, -1), (3, 7), (-120, 200), (2047, -2047)]
    w = bs.BitWriter()
    enc = cabac.CabacEncoder(w, cabac.ContextSet(1, 30))
    for mx, my in vals:
        inter.encode_mvd(enc, mx, my)
    enc.encode_terminate(1)
    enc.finish()
    w.byte_align()
    dec = cabac.CabacDecoder(bs.BitReader(w.get_bytes() + b"\x00\x00"),
                             cabac.ContextSet(1, 30))
    for mx, my in vals:
        assert inter.decode_mvd(dec) == (mx, my)


def test_merge_zero_fill():
    from fasthevc_tpu.spec.ctu import FrameMaps
    from fasthevc_tpu.spec.syntax import SequenceParams
    sp = SequenceParams(width=64, height=64)
    maps = FrameMaps(sp)
    cands = inter.merge_candidates(maps, maps.motion, 0, 0, 16)
    assert len(cands) == 5
    assert all(c == inter.Motion(inter.DIR_L0, (0, 0), 0) for c in cands)
    # B slices zero-fill with BI candidates
    cands_b = inter.merge_candidates(maps, maps.motion, 0, 0, 16, True)
    assert all(c == inter.Motion(inter.DIR_BI, (0, 0), 0, (0, 0), 0)
               for c in cands_b)
    amvp = inter.amvp_candidates(maps, maps.motion, 0, 0, 16)
    assert amvp == [(0, 0), (0, 0)]


def _run_p(cfg, frames):
    stream, recons = SpecEncoder(cfg).encode(frames)
    pics = SpecDecoder().decode(stream)
    assert len(pics) == len(frames)
    for pic, rec in zip(pics, recons):
        assert pic.hash_ok is True
        np.testing.assert_array_equal(pic.planes.y, rec.y)
        np.testing.assert_array_equal(pic.planes.cb, rec.cb)
        np.testing.assert_array_equal(pic.planes.cr, rec.cr)
    return stream, pics


def test_p_slice_e2e():
    cfg = low_delay_p(width=64, height=64, qp=32, frames=3,
                      num_intra_rd_candidates=1)
    frames = synthesize_yuv(64, 64, 3, seed=51)
    _run_p(cfg, frames)


def test_p_slice_e2e_with_filters_off():
    cfg = low_delay_p(width=96, height=64, qp=35, frames=3,
                      num_intra_rd_candidates=1, deblocking=False, sao=False)
    frames = synthesize_yuv(96, 64, 3, seed=52)
    _run_p(cfg, frames)


def test_p_frames_cheaper_than_intra():
    frames = synthesize_yuv(96, 64, 4, seed=53)
    cfg_p = low_delay_p(width=96, height=64, qp=32, frames=4,
                        num_intra_rd_candidates=1, sao=False)
    cfg_i = EncoderConfig(width=96, height=64, qp=32, frames=4,
                          num_intra_rd_candidates=1, sao=False)
    s_p, _ = SpecEncoder(cfg_p).encode(frames)
    s_i, _ = SpecEncoder(cfg_i).encode(frames)
    assert len(s_p) < len(s_i) * 0.8, (len(s_p), len(s_i))
