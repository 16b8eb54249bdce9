"""End-to-end self-conformance: encode -> decode -> bit-exact recon match.

This is the single most important test in the project (SURVEY.md §4 item 1):
the decoder reconstruction must equal the encoder reconstruction exactly,
verified both directly and through the decoded-picture-hash SEI.
"""

import numpy as np
import pytest

from fasthevc_tpu.config import EncoderConfig, all_intra
from fasthevc_tpu.spec.decoder import SpecDecoder
from fasthevc_tpu.spec.encoder import SpecEncoder
from fasthevc_tpu.utils import psnr, synthesize_yuv, yuv_from_planes


def _run(cfg, frames):
    enc = SpecEncoder(cfg)
    stream, recons = enc.encode(frames)
    dec = SpecDecoder()
    pics = dec.decode(stream)
    assert len(pics) == len(frames)
    for pic, rec in zip(pics, recons):
        np.testing.assert_array_equal(pic.planes.y, rec.y)
        np.testing.assert_array_equal(pic.planes.cb, rec.cb)
        np.testing.assert_array_equal(pic.planes.cr, rec.cr)
        assert pic.hash_ok is True
    return stream, pics


def test_tiny_single_frame():
    cfg = EncoderConfig(width=64, height=64, qp=32, frames=1,
                        num_intra_rd_candidates=2)
    frames = synthesize_yuv(64, 64, 1, seed=1)
    stream, pics = _run(cfg, frames)
    y, cb, cr = yuv_from_planes(
        (pics[0].planes.y, pics[0].planes.cb, pics[0].planes.cr), 64, 64)
    p = psnr(frames[0][0], y)
    assert p > 30.0, f"luma PSNR too low: {p}"


def test_nonaligned_dimensions():
    # 72x56: not CTU-aligned (CTU 32) -> forced splits at borders
    cfg = EncoderConfig(width=72, height=56, qp=35, frames=1,
                        num_intra_rd_candidates=1)
    frames = synthesize_yuv(72, 56, 1, seed=2)
    _run(cfg, frames)


def test_ctu64():
    cfg = EncoderConfig(width=128, height=64, qp=32, frames=1, log2_ctu=6,
                        num_intra_rd_candidates=1)
    frames = synthesize_yuv(128, 64, 1, seed=3)
    _run(cfg, frames)


def test_lossless():
    cfg = EncoderConfig(width=64, height=64, qp=32, frames=1, lossless=True,
                        num_intra_rd_candidates=1)
    frames = synthesize_yuv(64, 64, 1, seed=4)
    stream, pics = _run(cfg, frames)
    y, cb, cr = yuv_from_planes(
        (pics[0].planes.y, pics[0].planes.cb, pics[0].planes.cr), 64, 64)
    np.testing.assert_array_equal(y, frames[0][0])
    np.testing.assert_array_equal(cb, frames[0][1])
    np.testing.assert_array_equal(cr, frames[0][2])


def test_multi_frame_and_qps():
    frames = synthesize_yuv(64, 32, 2, seed=5)
    for qp in (22, 37):
        cfg = EncoderConfig(width=64, height=32, qp=qp, frames=2,
                            num_intra_rd_candidates=1)
        _run(cfg, frames)


def test_rate_decreases_with_qp():
    frames = synthesize_yuv(96, 64, 1, seed=6)
    sizes = []
    for qp in (22, 32, 42):
        cfg = EncoderConfig(width=96, height=64, qp=qp, frames=1,
                            num_intra_rd_candidates=1)
        stream, _ = _run(cfg, frames)
        sizes.append(len(stream))
    assert sizes[0] > sizes[1] > sizes[2]
