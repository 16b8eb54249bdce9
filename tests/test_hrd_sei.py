"""HRD signalling (SURVEY.md E12): SPS VUI timing + nal_hrd_parameters,
buffering-period SEI on IRAPs, pic-timing SEI per picture — write, parse
and delay-accounting round trip."""

import numpy as np
import pytest

from fasthevc_tpu.codec.encoder import TpuEncoder
from fasthevc_tpu.config import EncoderConfig
from fasthevc_tpu.config.config import GopEntry
from fasthevc_tpu.spec.decoder import SpecDecoder
from fasthevc_tpu.spec.encoder import SpecEncoder
from fasthevc_tpu.utils import synthesize_yuv


def test_hrd_sps_roundtrip():
    from fasthevc_tpu.spec.syntax import (SequenceParams, parse_sps,
                                          write_sps)
    sp = SequenceParams(width=64, height=64, hrd_enabled=True,
                        frame_rate=60.0, hrd_bitrate=5_000_000,
                        hrd_cpb_size=10_000_000)
    sp2 = parse_sps(write_sps(sp), SequenceParams())
    assert sp2.hrd_enabled
    assert abs(sp2.frame_rate - 60.0 * 1000) < 1e-6 or \
        abs(sp2.frame_rate - 60.0) < 1e-6
    # scaled-value quantization: within one quantum
    assert abs(sp2.hrd_bitrate - 5_000_000) <= (1 << 12)
    assert abs(sp2.hrd_cpb_size - 10_000_000) <= (1 << 8)


def test_hrd_sei_emitted_and_parsed_ldp():
    """LDP with hrd=True: one buffering-period per IRAP, one pic-timing
    per picture, delays consistent with coding order; hashes still OK."""
    frames = synthesize_yuv(64, 64, 4, seed=3)
    cfg = EncoderConfig(width=64, height=64, qp=35, frames=4, sao=False,
                        hrd=True, intra_period=-1,
                        gop=[GopEntry(1, 1, "P", (-1,))])
    stream, _ = SpecEncoder(cfg).encode(frames)
    dec = SpecDecoder()
    pics = dec.decode(stream)
    assert all(p.hash_ok for p in pics)
    assert len(dec.hrd_buffering_periods) == 1        # one IRAP
    assert len(dec.hrd_pic_timings) == 4              # one per picture
    assert dec.hrd_buffering_periods[0]["initial_cpb_removal_delay"] > 0
    # au_cpb_removal_delay counts AUs since the buffering period
    assert [t["au_cpb_removal_delay"] for t in dec.hrd_pic_timings] == \
        [1, 1, 2, 3]


def test_hrd_sei_production_path():
    """TpuEncoder (classic + device paths) with hrd=True must emit the
    same SEI structure and still decode hash-OK."""
    frames = synthesize_yuv(64, 64, 3, seed=4)
    cfg = EncoderConfig(width=64, height=64, qp=32, frames=3, sao=False,
                        hrd=True, intra_period=-1,
                        gop=[GopEntry(1, 0, "P", (-1,))])
    stream, _ = TpuEncoder(cfg).encode(frames)
    dec = SpecDecoder()
    pics = dec.decode(stream)
    assert all(p.hash_ok for p in pics)
    assert len(dec.hrd_buffering_periods) == 1
    assert len(dec.hrd_pic_timings) == 3


def test_hrd_reorder_delay_hier_b():
    """dpb_output_delay accounting on a hierarchical-B GOP: delays are
    non-negative and the display order is recoverable."""
    frames = synthesize_yuv(64, 64, 5, seed=5)
    gop = [GopEntry(4, 1, "B", (-4,)), GopEntry(2, 2, "B", (-2, 2)),
           GopEntry(1, 3, "B", (-1, 1)), GopEntry(3, 3, "B", (-1, 1))]
    cfg = EncoderConfig(width=64, height=64, qp=35, frames=5, sao=False,
                        hrd=True, intra_period=-1, gop=gop)
    stream, _ = SpecEncoder(cfg).encode(frames)
    dec = SpecDecoder()
    pics = dec.decode(stream)
    assert all(p.hash_ok for p in pics)
    assert len(dec.hrd_pic_timings) == 5
    assert all(t["dpb_output_delay"] >= 0 for t in dec.hrd_pic_timings)
