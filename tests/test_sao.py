"""SAO: unit behavior + e2e conformance with SAO enabled."""

import numpy as np
import pytest

from fasthevc_tpu.config import EncoderConfig
from fasthevc_tpu.spec import sao
from fasthevc_tpu.spec.decoder import SpecDecoder
from fasthevc_tpu.spec.encoder import SpecEncoder
from fasthevc_tpu.utils import psnr, synthesize_yuv, yuv_from_planes


def test_edge_categories_basic():
    p = np.array([[5, 5, 5], [5, 1, 5], [5, 5, 5]], dtype=np.int32)
    cat = sao._edge_categories(p, 0)  # horizontal
    assert cat[1, 1] == 1  # local minimum
    p2 = np.array([[5, 5, 5], [5, 9, 5], [5, 5, 5]], dtype=np.int32)
    assert sao._edge_categories(p2, 0)[1, 1] == 4  # local maximum
    # boundary samples category 0
    assert cat[0, 0] == 0 and cat[1, 0] == 0


def test_estimate_recovers_uniform_shift():
    # recon = src - 3 in one band: band offset should recover it
    rng = np.random.default_rng(0)
    src = rng.integers(100, 110, (32, 32)).astype(np.int32)
    rec = src - 3
    p = sao.estimate_ctb(src, rec)
    out = sao.apply_sao_plane(rec, [[p]], 32)
    assert np.abs(out - src).mean() < np.abs(rec - src).mean()


def test_band_offset_application():
    rec = np.full((8, 8), 100, dtype=np.int32)  # band 100>>3 = 12
    p = sao.SaoParam(sao.SAO_BAND, 0, 12, (5, 0, 0, 0))
    out = sao.apply_sao_plane(rec, [[p]], 8)
    assert np.all(out == 105)


def test_edge_offset_application():
    rec = np.full((8, 8), 100, dtype=np.int32)
    rec[4, 4] = 90  # local min for any class
    p = sao.SaoParam(sao.SAO_EDGE, 0, 0, (4, 2, -2, -4))
    out = sao.apply_sao_plane(rec, [[p]], 8)
    assert out[4, 4] == 94  # category 1 (local min): +4
    assert out[4, 3] == 98  # one equal + one smaller neighbor -> cat 3: -2


def test_sao_syntax_roundtrip():
    from fasthevc_tpu.spec import bitstream as bs
    from fasthevc_tpu.spec import cabac
    rng = np.random.default_rng(1)
    params = []
    for _ in range(12):
        t = int(rng.integers(0, 3))
        if t == sao.SAO_EDGE:
            offs = (int(rng.integers(0, 8)), int(rng.integers(0, 8)),
                    -int(rng.integers(0, 8)), -int(rng.integers(0, 8)))
            p = sao.SaoParam(t, int(rng.integers(0, 4)), 0, offs)
        elif t == sao.SAO_BAND:
            offs = tuple(int(rng.integers(-7, 8)) for _ in range(4))
            p = sao.SaoParam(t, 0, int(rng.integers(0, 29)), offs)
        else:
            p = sao.SaoParam()
        params.append(p)
    w = bs.BitWriter()
    enc = cabac.CabacEncoder(w, cabac.ContextSet(0, 32))
    for i in range(0, 12, 3):
        # Cr must share type/class with Cb per spec
        cr = sao.SaoParam(params[i + 1].type_idx, params[i + 1].eo_class,
                          params[i + 2].band_pos if params[i + 1].type_idx
                          == sao.SAO_BAND else 0,
                          params[i + 2].offsets if params[i + 1].type_idx
                          else (0, 0, 0, 0))
        if params[i + 1].type_idx == sao.SAO_EDGE:
            cr.offsets = (abs(cr.offsets[0]), abs(cr.offsets[1]),
                          -abs(cr.offsets[2]), -abs(cr.offsets[3]))
        params[i + 2] = cr
        sao.encode_sao_ctu(enc, params[i], params[i + 1], params[i + 2],
                           rx=1, ry=1, sao_luma=True, sao_chroma=True)
    enc.encode_terminate(1)
    enc.finish()
    w.byte_align()
    dec = cabac.CabacDecoder(bs.BitReader(w.get_bytes() + b"\x00\x00"),
                             cabac.ContextSet(0, 32))
    for i in range(0, 12, 3):
        py, pcb, pcr = sao.decode_sao_ctu(dec, 1, 1, True, True,
                                          ([sao.SaoParam()] * 3),
                                          ([sao.SaoParam()] * 3))
        for got, exp in ((py, params[i]), (pcb, params[i + 1]),
                        (pcr, params[i + 2])):
            assert got.type_idx == exp.type_idx
            if exp.type_idx == sao.SAO_EDGE:
                assert got.eo_class == exp.eo_class
            if exp.type_idx == sao.SAO_BAND:
                assert got.band_pos == exp.band_pos
            if exp.type_idx:
                assert got.offsets == tuple(exp.offsets)
    assert dec.decode_terminate() == 1


def test_e2e_with_sao():
    cfg = EncoderConfig(width=96, height=64, qp=37, frames=2, sao=True,
                        deblocking=True, num_intra_rd_candidates=1)
    frames = synthesize_yuv(96, 64, 2, seed=41)
    stream, recons = SpecEncoder(cfg).encode(frames)
    pics = SpecDecoder().decode(stream)
    for pic, rec in zip(pics, recons):
        assert pic.hash_ok is True
        np.testing.assert_array_equal(pic.planes.y, rec.y)
        np.testing.assert_array_equal(pic.planes.cb, rec.cb)
        np.testing.assert_array_equal(pic.planes.cr, rec.cr)


def test_sao_improves_psnr():
    frames = synthesize_yuv(96, 64, 1, seed=42)
    ps = {}
    for use in (False, True):
        cfg = EncoderConfig(width=96, height=64, qp=40, frames=1, sao=use,
                            deblocking=False, num_intra_rd_candidates=1)
        stream, recons = SpecEncoder(cfg).encode(frames)
        y, _, _ = yuv_from_planes((recons[0].y, recons[0].cb, recons[0].cr),
                                  96, 64)
        ps[use] = psnr(frames[0][0], y)
    assert ps[True] >= ps[False] - 0.05, ps  # SAO should not hurt
