"""Deblocking filter: unit behavior + e2e conformance with filter on."""

import numpy as np
import pytest

from fasthevc_tpu.codec.encoder import TpuEncoder
from fasthevc_tpu.config import EncoderConfig
from fasthevc_tpu.spec import deblock
from fasthevc_tpu.spec.decoder import SpecDecoder
from fasthevc_tpu.spec.encoder import SpecEncoder
from fasthevc_tpu.utils import psnr, synthesize_yuv, yuv_from_planes


class _P:
    def __init__(self, y, cb, cr):
        self.y, self.cb, self.cr = y, cb, cr


class _SP:
    bit_depth = 8
    log2_ctu = 5
    log2_max_tu = 5


def test_tables():
    assert deblock.BETA_TABLE[15] == 0 and deblock.BETA_TABLE[16] == 6
    assert deblock.BETA_TABLE[51] == 64
    assert deblock.TC_TABLE[17] == 0 and deblock.TC_TABLE[18] == 1
    assert deblock.TC_TABLE[53] == 24
    assert len(deblock.BETA_TABLE) == 52 and len(deblock.TC_TABLE) == 54


def test_edge_flags_uniform_16():
    depth = np.ones((8, 8), dtype=np.int32)  # all CUs 16x16 (ctu 32)
    vert, horz = deblock.edge_flags(depth, 5)
    # vertical edges at every even granule column except col 0
    assert not vert[:, 0].any()
    assert vert[:, 2].all() and vert[:, 4].all()
    assert not vert[:, 1].any() and not vert[:, 3].any()
    assert horz[2, :].all() and not horz[1, :].any()


def test_flat_region_smooth_edge_filtered():
    # Step edge across a CU boundary in an otherwise flat area -> the
    # deblocking filter must smooth it.
    y = np.zeros((32, 64), dtype=np.int32)
    y[:, :32] = 100
    y[:, 32:] = 108
    cb = np.full((16, 32), 128, dtype=np.int32)
    cr = cb.copy()
    planes = _P(y.copy(), cb, cr)
    depth = np.zeros((4, 8), dtype=np.int32)  # two 32x32 CUs
    deblock.deblock_picture(planes, _SP(), depth, 32, 32, 32)
    edge_jump = abs(int(planes.y[5, 32]) - int(planes.y[5, 31]))
    assert edge_jump < 8  # smoothed
    # interior untouched
    assert planes.y[5, 10] == 100 and planes.y[5, 60] == 108


def test_blocky_smooth_content_filtered():
    # Smooth-per-block content with per-block DC offsets (classic blocking
    # artifacts) -> filter engages; pure noise keeps it off (high activity).
    rng = np.random.default_rng(0)
    y = np.zeros((64, 64), dtype=np.int32)
    for by in range(0, 64, 8):
        for bx in range(0, 64, 8):
            y[by:by + 8, bx:bx + 8] = 100 + rng.integers(-6, 7)
    planes = _P(y.copy(), np.full((32, 32), 128, np.int32),
                np.full((32, 32), 128, np.int32))
    depth = np.full((8, 8), 2, dtype=np.int32)  # 8x8 CUs: all edges
    deblock.deblock_picture(planes, _SP(), depth, 37, 36, 36)
    assert not np.array_equal(planes.y, y)  # blockiness smoothed

    noise = rng.integers(0, 256, (64, 64)).astype(np.int32)
    planes2 = _P(noise.copy(), np.full((32, 32), 128, np.int32),
                 np.full((32, 32), 128, np.int32))
    deblock.deblock_picture(planes2, _SP(), depth, 30, 30, 30)
    assert np.array_equal(planes2.y, noise)  # high activity: filter off


@pytest.mark.parametrize("encoder_cls", [SpecEncoder, TpuEncoder])
def test_e2e_with_deblocking(encoder_cls):
    cfg = EncoderConfig(width=96, height=64, qp=35, frames=2, deblocking=True)
    frames = synthesize_yuv(96, 64, 2, seed=31)
    stream, recons = encoder_cls(cfg).encode(frames)
    pics = SpecDecoder().decode(stream)
    for pic, rec in zip(pics, recons):
        assert pic.hash_ok is True
        np.testing.assert_array_equal(pic.planes.y, rec.y)
        np.testing.assert_array_equal(pic.planes.cb, rec.cb)


def test_deblocking_helps_at_high_qp():
    frames = synthesize_yuv(96, 64, 1, seed=32)
    psnrs = {}
    for db in (False, True):
        cfg = EncoderConfig(width=96, height=64, qp=40, frames=1,
                            deblocking=db)
        stream, recons = TpuEncoder(cfg).encode(frames)
        y, _, _ = yuv_from_planes((recons[0].y, recons[0].cb, recons[0].cr),
                                  96, 64)
        psnrs[db] = psnr(frames[0][0], y)
    # On synthetic sharp-edged content deblocking can cost some PSNR (it
    # smooths grid-aligned true edges); bound the loss. On natural video
    # it is ~neutral-to-positive — revisit when real clips are available.
    assert psnrs[True] > psnrs[False] - 1.0, psnrs
