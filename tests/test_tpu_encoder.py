"""TPU-pipeline encoder: self-conformance + quality sanity vs golden."""

import numpy as np
import pytest

from fasthevc_tpu.codec.encoder import TpuEncoder
from fasthevc_tpu.config import EncoderConfig
from fasthevc_tpu.spec.decoder import SpecDecoder
from fasthevc_tpu.spec.encoder import SpecEncoder
from fasthevc_tpu.utils import psnr, synthesize_yuv, yuv_from_planes


def _run(cfg, frames):
    enc = TpuEncoder(cfg)
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


def test_tpu_encoder_self_conformance():
    cfg = EncoderConfig(width=96, height=64, qp=32, frames=2)
    frames = synthesize_yuv(96, 64, 2, seed=21)
    _run(cfg, frames)


def test_tpu_encoder_nonaligned():
    cfg = EncoderConfig(width=88, height=72, qp=30, frames=1)
    frames = synthesize_yuv(88, 72, 1, seed=22)
    _run(cfg, frames)


def test_tpu_encoder_lossless():
    cfg = EncoderConfig(width=64, height=64, qp=32, frames=1, lossless=True)
    frames = synthesize_yuv(64, 64, 1, seed=23)
    stream, pics = _run(cfg, frames)
    y, cb, cr = yuv_from_planes((pics[0].planes.y, pics[0].planes.cb,
                                 pics[0].planes.cr), 64, 64)
    np.testing.assert_array_equal(y, frames[0][0])


def test_tpu_quality_near_golden():
    """TPU search approximations should stay within a reasonable RD band of
    the golden full-search encoder."""
    frames = synthesize_yuv(96, 64, 1, seed=24)
    cfg = EncoderConfig(width=96, height=64, qp=32, frames=1)
    t_stream, t_recons = TpuEncoder(cfg).encode(frames)
    g_stream, g_recons = SpecEncoder(cfg).encode(frames)
    ty, *_ = yuv_from_planes((t_recons[0].y, t_recons[0].cb, t_recons[0].cr),
                             96, 64)
    gy, *_ = yuv_from_planes((g_recons[0].y, g_recons[0].cb, g_recons[0].cr),
                             96, 64)
    p_t = psnr(frames[0][0], ty)
    p_g = psnr(frames[0][0], gy)
    # Allow up to 1.2 dB PSNR deficit and 15% bitrate overhead vs golden.
    # Current: ~0.8 dB at ~5% LOWER rate (two-stage search: SATD mode pick
    # + true transform-domain D+lambda*R leaf costs); remaining gap is the
    # source-referenced prediction in search.
    assert p_t > p_g - 1.2, (p_t, p_g)
    assert len(t_stream) < len(g_stream) * 1.15, (len(t_stream),
                                                  len(g_stream))
