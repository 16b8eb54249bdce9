"""Weighted prediction (SURVEY.md E13): pred_weight_table syntax,
explicit weighted sample process, encode/decode parity on fades, and the
coding-gain property that motivates the tool (HM WeightPredAnalysis)."""

import numpy as np
import pytest

from fasthevc_tpu.config import EncoderConfig
from fasthevc_tpu.config.config import GopEntry
from fasthevc_tpu.spec.bitstream import BitReader, BitWriter
from fasthevc_tpu.spec.decoder import SpecDecoder
from fasthevc_tpu.spec.encoder import SpecEncoder
from fasthevc_tpu.spec.wp import (
    WpEntry,
    WpTables,
    default_tables,
    estimate_wp_tables,
    parse_pred_weight_table,
    write_pred_weight_table,
)
from fasthevc_tpu.utils import synthesize_yuv

W, H = 64, 64


def fade_clip(n=3, w=W, h=H, seed=3):
    """A global luminance fade: frame t = base * gain_t + off_t."""
    base = synthesize_yuv(w, h, 1, seed=seed, motion=False)[0]
    out = []
    for t in range(n):
        gain = 1.0 - 0.25 * t
        off = 10 * t
        y = np.clip(base[0].astype(np.float64) * gain + off, 0, 255)
        cb = np.clip((base[1].astype(np.float64) - 128) * gain + 128,
                     0, 255)
        cr = np.clip((base[2].astype(np.float64) - 128) * gain + 128,
                     0, 255)
        out.append((y.astype(np.uint8), cb.astype(np.uint8),
                    cr.astype(np.uint8)))
    return out


def test_pred_weight_table_roundtrip():
    wp = WpTables(5, 4,
                  l0=(WpEntry(40, -3, 20, 5, 15, -7),
                      default_tables(1, 0, 5, 4).l0[0]),
                  l1=(WpEntry(20, 127, 16, 0, 16, 0),))
    w = BitWriter()
    write_pred_weight_table(w, wp, is_b=True)
    w.byte_align()
    r = BitReader(w.get_bytes())
    got = parse_pred_weight_table(r, 2, 1, is_b=True)
    assert got == wp


def test_pred_weight_table_roundtrip_p_defaults():
    wp = default_tables(2, 0)
    w = BitWriter()
    write_pred_weight_table(w, wp, is_b=False)
    w.byte_align()
    got = parse_pred_weight_table(BitReader(w.get_bytes()), 2, 0, False)
    assert got == wp


def test_estimate_detects_fade():
    frames = fade_clip(2)
    cur = tuple(np.asarray(p, np.int32) for p in frames[1])

    class Ref:
        y, cb, cr = (np.asarray(p, np.int32) for p in frames[0])

    wp = estimate_wp_tables(cur, [Ref()], [])
    e = wp.l0[0]
    # gain 0.75 -> weight ~ 48/64, offset ~ +10
    assert not wp.luma_default(0, 0)
    assert 40 <= e.w_y <= 56
    assert 0 <= e.o_y <= 30


def test_wp_decode_parity_p_frames():
    frames = fade_clip(3)
    cfg = EncoderConfig(width=W, height=H, qp=30, frames=3,
                        intra_period=-1, sao=False,
                        gop=[GopEntry(1, 0, "P", (-1,))],
                        weighted_pred=True, num_ref_per_list=1)
    stream, recs = SpecEncoder(cfg).encode(frames)
    pics = SpecDecoder().decode(stream)
    assert len(pics) == 3
    assert all(p.hash_ok for p in pics)
    for p, r in zip(pics, recs):
        np.testing.assert_array_equal(p.planes.y, r.y)


def test_wp_decode_parity_b_frames():
    frames = fade_clip(5)
    cfg = EncoderConfig(width=W, height=H, qp=30, frames=5,
                        intra_period=4, sao=False,
                        gop=[GopEntry(4, 0, "P", (-4,)),
                             GopEntry(2, 1, "B", (-2, 2)),
                             GopEntry(1, 2, "B", (-1, 1)),
                             GopEntry(3, 2, "B", (-1, 1))],
                        weighted_pred=True, num_ref_per_list=1)
    stream, recs = SpecEncoder(cfg).encode(frames)
    pics = SpecDecoder().decode(stream)
    assert all(p.hash_ok for p in pics)


def test_wp_gains_bits_on_fade():
    """The tool's purpose: on a fade, explicit WP must beat the default
    weighted sample process in rate at equal-or-better quality."""
    from fasthevc_tpu.utils import psnr

    frames = fade_clip(3)
    kw = dict(width=W, height=H, qp=30, frames=3, intra_period=-1,
              sao=False, gop=[GopEntry(1, 0, "P", (-1,))],
              num_ref_per_list=1)
    s_wp, r_wp = SpecEncoder(
        EncoderConfig(weighted_pred=True, **kw)).encode(frames)
    s_off, r_off = SpecEncoder(
        EncoderConfig(weighted_pred=False, **kw)).encode(frames)
    psnr_wp = np.mean([psnr(np.asarray(frames[i][0], np.int32),
                            r_wp[i].y) for i in range(3)])
    psnr_off = np.mean([psnr(np.asarray(frames[i][0], np.int32),
                             r_off[i].y) for i in range(3)])
    assert len(s_wp) < len(s_off), (len(s_wp), len(s_off))
    assert psnr_wp >= psnr_off - 0.05


def test_wp_flag_off_stream_unchanged():
    """weighted_pred=False must produce the exact previous bitstream
    (no PPS/slice-header bit drift from the new fields)."""
    frames = synthesize_yuv(W, H, 2, seed=5)
    cfg = EncoderConfig(width=W, height=H, qp=32, frames=2,
                        intra_period=-1, sao=False,
                        gop=[GopEntry(1, 0, "P", (-1,))],
                        num_ref_per_list=1)
    s1, _ = SpecEncoder(cfg).encode(frames)
    pics = SpecDecoder().decode(s1)
    assert all(p.hash_ok for p in pics)


def test_wp_native_matches_python(monkeypatch):
    """Production path: the C++ engine's weighted blend must match the
    Python fallback byte-for-byte, and the stream must decode clean."""
    cpp = pytest.importorskip("fasthevc_tpu.cabac_cpp")
    if not cpp.available():
        pytest.skip("C++ toolchain unavailable")
    import fasthevc_tpu.codec.encoder as enc_mod
    from fasthevc_tpu.codec.encoder import TpuEncoder

    frames = fade_clip(3)
    cfg = EncoderConfig(width=W, height=H, qp=30, frames=3,
                        intra_period=-1, sao=False,
                        gop=[GopEntry(1, 0, "P", (-1,))],
                        weighted_pred=True, num_ref_per_list=1)
    ns, nr = TpuEncoder(cfg).encode(frames)
    with monkeypatch.context() as m:
        m.setattr(enc_mod, "_native_engine", lambda: None)
        ps, pr = TpuEncoder(cfg).encode(frames)
    assert ns == ps, "native and python streams differ under WP"
    pics = SpecDecoder().decode(ns)
    assert all(p.hash_ok for p in pics)


def test_wp_native_b_frames(monkeypatch):
    """Weighted bi-prediction parity (B slices, both lists weighted)."""
    cpp = pytest.importorskip("fasthevc_tpu.cabac_cpp")
    if not cpp.available():
        pytest.skip("C++ toolchain unavailable")
    import fasthevc_tpu.codec.encoder as enc_mod
    from fasthevc_tpu.codec.encoder import TpuEncoder

    frames = fade_clip(5)
    cfg = EncoderConfig(width=W, height=H, qp=30, frames=5,
                        intra_period=4, sao=False,
                        gop=[GopEntry(4, 0, "P", (-4,)),
                             GopEntry(2, 1, "B", (-2, 2)),
                             GopEntry(1, 2, "B", (-1, 1)),
                             GopEntry(3, 2, "B", (-1, 1))],
                        weighted_pred=True, num_ref_per_list=1)
    ns, _ = TpuEncoder(cfg).encode(frames)
    with monkeypatch.context() as m:
        m.setattr(enc_mod, "_native_engine", lambda: None)
        ps, _ = TpuEncoder(cfg).encode(frames)
    assert ns == ps
    pics = SpecDecoder().decode(ns)
    assert all(p.hash_ok for p in pics)
