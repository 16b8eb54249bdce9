"""WPP / entropy_coding_sync (SURVEY.md P2): per-CTU-row substreams with
context inheritance from the row above's second CTB (spec 9.3.1)."""

import numpy as np
import pytest

from fasthevc_tpu.config import EncoderConfig
from fasthevc_tpu.config.config import GopEntry
from fasthevc_tpu.spec import bitstream as bs
from fasthevc_tpu.spec.decoder import SpecDecoder
from fasthevc_tpu.spec.encoder import SpecEncoder
from fasthevc_tpu.utils import synthesize_yuv

W, H = 96, 96  # 3x3 CTUs at CTU-32


def test_wpp_intra_decodes():
    frames = synthesize_yuv(W, H, 2, seed=41)
    cfg = EncoderConfig(width=W, height=H, qp=32, frames=2, sao=False,
                        wpp=True)
    stream, recs = SpecEncoder(cfg).encode(frames)
    dec = SpecDecoder()
    pics = dec.decode(stream)
    assert dec.sp.wpp
    assert all(p.hash_ok for p in pics)
    for p, r in zip(pics, recs):
        np.testing.assert_array_equal(p.planes.y, r.y)


def test_wpp_entry_points_per_row():
    frames = synthesize_yuv(W, H, 1, seed=42)
    cfg = EncoderConfig(width=W, height=H, qp=32, frames=1, sao=False,
                        wpp=True)
    stream, _ = SpecEncoder(cfg).encode(frames)
    from fasthevc_tpu.spec.syntax import parse_slice_header
    for t, _, rbsp in bs.split_annexb(stream):
        if t <= 31:
            enc = SpecEncoder(cfg)
            sh = parse_slice_header(bs.BitReader(rbsp), enc.sp, t)
            assert len(sh.entry_points) == 3 - 1  # one per row but last
            break


def test_wpp_p_frames_decode():
    frames = synthesize_yuv(W, H, 3, seed=43)
    cfg = EncoderConfig(width=W, height=H, qp=32, frames=3, sao=False,
                        intra_period=-1, gop=[GopEntry(1, 0, "P", (-1,))],
                        wpp=True, num_ref_per_list=1)
    stream, _ = SpecEncoder(cfg).encode(frames)
    pics = SpecDecoder().decode(stream)
    assert all(p.hash_ok for p in pics)


def test_wpp_with_sao():
    frames = synthesize_yuv(W, H, 1, seed=44)
    cfg = EncoderConfig(width=W, height=H, qp=37, frames=1, sao=True,
                        wpp=True)
    stream, _ = SpecEncoder(cfg).encode(frames)
    pics = SpecDecoder().decode(stream)
    assert all(p.hash_ok for p in pics)


def test_wpp_single_column_picture():
    """ctus_x == 1: no sync point exists; every row inits fresh."""
    frames = synthesize_yuv(32, 96, 1, seed=45)
    cfg = EncoderConfig(width=32, height=96, qp=32, frames=1, sao=False,
                        wpp=True)
    stream, _ = SpecEncoder(cfg).encode(frames)
    pics = SpecDecoder().decode(stream)
    assert all(p.hash_ok for p in pics)


def test_wpp_rate_near_neutral():
    """WPP only resets contexts per row: the rate penalty vs the plain
    stream must be small (prediction is unconstrained, unlike tiles)."""
    frames = synthesize_yuv(W, H, 1, seed=46)
    kw = dict(width=W, height=H, qp=32, frames=1, sao=False)
    s_wpp, _ = SpecEncoder(EncoderConfig(wpp=True, **kw)).encode(frames)
    s_off, _ = SpecEncoder(EncoderConfig(wpp=False, **kw)).encode(frames)
    assert len(s_wpp) < len(s_off) * 1.10


def test_tpu_encoder_raises_loudly():
    from fasthevc_tpu.codec.encoder import TpuEncoder
    with pytest.raises(NotImplementedError):
        TpuEncoder(EncoderConfig(width=W, height=H, qp=32, frames=1,
                                 wpp=True))
