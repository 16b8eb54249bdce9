"""B slices + random-access GOP: bi-prediction, reordering, conformance."""

import numpy as np
import pytest

from fasthevc_tpu.config import EncoderConfig, GopEntry, random_access_gop16
from fasthevc_tpu.spec import mc
from fasthevc_tpu.spec.decoder import SpecDecoder
from fasthevc_tpu.spec.encoder import SpecEncoder
from fasthevc_tpu.spec.inter import DIR_BI, DIR_L0, DIR_L1, Motion
from fasthevc_tpu.utils import psnr, synthesize_yuv, yuv_from_planes


class _P:
    def __init__(self, y):
        self.y = y
        self.cb = y[::2, ::2].copy()
        self.cr = y[::2, ::2].copy()


def test_bi_average_integer():
    a = _P(np.full((32, 32), 100, dtype=np.int32))
    b = _P(np.full((32, 32), 104, dtype=np.int32))
    m = Motion(DIR_BI, (0, 0), 0, (0, 0), 0)
    py, pcb, pcr = mc.mc_cu_motion(m, [a], [b], 0, 0, 16)
    assert np.all(py == 102)  # (100<<6 + 104<<6 + 64) >> 7


def test_bi_average_rounding_matches_spec():
    # (a<<6 + b<<6 + 64) >> 7 rounds to nearest with ties up
    a = _P(np.full((16, 16), 100, dtype=np.int32))
    b = _P(np.full((16, 16), 101, dtype=np.int32))
    m = Motion(DIR_BI, (0, 0), 0, (0, 0), 0)
    py, _, _ = mc.mc_cu_motion(m, [a], [b], 0, 0, 8)
    assert np.all(py == 101)  # 100.5 rounds up


def test_uni_raw_equivalence():
    rng = np.random.default_rng(0)
    ref = rng.integers(0, 256, (64, 64)).astype(np.int32)
    for mv in ((0, 0), (5, -7), (2, 2), (1, 3)):
        raw = mc.mc_luma_raw(ref, 8, 8, 16, 16, mv[0], mv[1])
        uni = mc.mc_luma(ref, 8, 8, 16, 16, mv[0], mv[1])
        np.testing.assert_array_equal(
            uni, np.clip((raw + 32) >> 6, 0, 255))


def _gop8():
    return [
        GopEntry(8, 1, "B", (-8,)),
        GopEntry(4, 3, "B", (-4, 4)),
        GopEntry(2, 4, "B", (-2, 2)),
        GopEntry(1, 5, "B", (-1, 1)),
        GopEntry(3, 5, "B", (-1, 1)),
        GopEntry(6, 4, "B", (-2, 2)),
        GopEntry(5, 5, "B", (-1, 1)),
        GopEntry(7, 5, "B", (-1, 1)),
    ]


def _run(cfg, frames):
    stream, recons = SpecEncoder(cfg).encode(frames)
    dec = SpecDecoder()
    pics = dec.decode(stream)
    assert len(pics) == len(frames)
    assert all(p.hash_ok for p in pics)
    # display-order recon match: decoder pictures are in coding order;
    # match via returned recons (display order) against sorted pocs
    by_poc = {}
    base = 0
    for p in pics:
        if p.poc == 0 and 0 in by_poc:
            base = max(by_poc) + 1  # new CVS
        by_poc[base + p.poc] = p
    for i, rec in enumerate(recons):
        np.testing.assert_array_equal(by_poc[i].planes.y, rec.y)
    return stream


def test_hierarchical_b_gop8():
    cfg = EncoderConfig(width=64, height=64, qp=35, frames=9,
                        intra_period=-1, gop=_gop8(),
                        num_intra_rd_candidates=1, sao=False,
                        deblocking=False)
    frames = synthesize_yuv(64, 64, 9, seed=101)
    _run(cfg, frames)


def test_hierarchical_b_with_filters():
    cfg = EncoderConfig(width=96, height=64, qp=32, frames=9,
                        intra_period=-1, gop=_gop8(),
                        num_intra_rd_candidates=1, sao=True,
                        deblocking=True)
    frames = synthesize_yuv(96, 64, 9, seed=102)
    _run(cfg, frames)


def test_random_access_gop16_preset():
    cfg = random_access_gop16(width=64, height=64, qp=37, frames=17,
                              num_intra_rd_candidates=1, sao=False,
                              deblocking=False)
    frames = synthesize_yuv(64, 64, 17, seed=103)
    _run(cfg, frames)


def test_b_frames_cheaper_than_p():
    frames = synthesize_yuv(96, 64, 9, seed=104)
    cfg_b = EncoderConfig(width=96, height=64, qp=32, frames=9,
                          intra_period=-1, gop=_gop8(),
                          num_intra_rd_candidates=1, sao=False)
    from fasthevc_tpu.config import low_delay_p
    cfg_p = low_delay_p(width=96, height=64, qp=32, frames=9,
                        num_intra_rd_candidates=1, sao=False)
    s_b = SpecEncoder(cfg_b).encode(frames)[0]
    s_p = SpecEncoder(cfg_p).encode(frames)[0]
    # hierarchical B with future refs should not be larger than LDP
    assert len(s_b) <= len(s_p) * 1.05, (len(s_b), len(s_p))
