"""Tiles (SURVEY.md P1): geometry, syntax, and e2e conformance."""

import numpy as np
import pytest

from fasthevc_tpu.config import EncoderConfig, low_delay_p
from fasthevc_tpu.spec.decoder import SpecDecoder
from fasthevc_tpu.spec.encoder import SpecEncoder
from fasthevc_tpu.spec.syntax import SequenceParams
from fasthevc_tpu.utils import synthesize_yuv


def test_tile_geometry_uniform():
    sp = SequenceParams(width=128, height=96, log2_ctu=5, tile_cols=2,
                        tile_rows=2)
    # 4x3 CTUs -> cols [0,2,4], rows [0,1,3]
    assert sp.tile_col_bounds() == [0, 2, 4]
    assert sp.tile_row_bounds() == [0, 1, 3]
    rects = sp.tile_rects()
    assert rects[0] == (0, 0, 64, 32)
    assert rects[3] == (64, 32, 128, 96)
    ctus = sp.tile_ctus()
    assert len(ctus) == 4
    assert sum(len(c) for c in ctus) == 12
    # tile 1 = top-right: CTUs (64,0) and (96,0)
    assert ctus[1] == [(64, 0), (96, 0)]


def _run(cfg, frames):
    stream, recons = SpecEncoder(cfg).encode(frames)
    pics = SpecDecoder().decode(stream)
    assert len(pics) == len(frames)
    for pic, rec in zip(pics, recons):
        assert pic.hash_ok is True
        np.testing.assert_array_equal(pic.planes.y, rec.y)
        np.testing.assert_array_equal(pic.planes.cb, rec.cb)
        np.testing.assert_array_equal(pic.planes.cr, rec.cr)
    return stream


def test_tiles_2x1_intra():
    cfg = EncoderConfig(width=128, height=64, qp=32, frames=1, tile_cols=2,
                        num_intra_rd_candidates=1)
    frames = synthesize_yuv(128, 64, 1, seed=91)
    _run(cfg, frames)


def test_tiles_2x2_with_filters():
    cfg = EncoderConfig(width=128, height=96, qp=35, frames=2, tile_cols=2,
                        tile_rows=2, num_intra_rd_candidates=1,
                        deblocking=True, sao=True)
    frames = synthesize_yuv(128, 96, 2, seed=92)
    _run(cfg, frames)


def test_tiles_p_slices():
    cfg = low_delay_p(width=128, height=64, qp=35, frames=3,
                      num_intra_rd_candidates=1, sao=False)
    cfg = cfg.replace(tile_cols=2)
    frames = synthesize_yuv(128, 64, 3, seed=93)
    _run(cfg, frames)


def test_tiles_nonuniform_dims():
    # 3 columns over 5 CTUs -> widths 1,2,2 (uniform-spacing formula)
    cfg = EncoderConfig(width=160, height=64, qp=37, frames=1, tile_cols=3,
                        num_intra_rd_candidates=1)
    frames = synthesize_yuv(160, 64, 1, seed=94)
    _run(cfg, frames)


def test_tiles_change_stream_but_stay_conformant():
    frames = synthesize_yuv(128, 64, 1, seed=95)
    cfg1 = EncoderConfig(width=128, height=64, qp=32, frames=1,
                         num_intra_rd_candidates=1)
    cfg2 = cfg1.replace(tile_cols=2)
    s1 = _run(cfg1, frames)
    s2 = _run(cfg2, frames)
    assert s1 != s2
    # tiles cost a little rate (broken prediction at boundaries)
    assert len(s2) < len(s1) * 1.25
