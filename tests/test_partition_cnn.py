"""Fast-partition CNN: training, prediction shape, encoder integration."""

import numpy as np
import pytest

from fasthevc_tpu.codec.encoder import TpuEncoder
from fasthevc_tpu.config import EncoderConfig
from fasthevc_tpu.models import (
    predict_depth_maps,
    save_params,
    load_params,
    train_self_distilled,
)
from fasthevc_tpu.spec.decoder import SpecDecoder
from fasthevc_tpu.utils import psnr, synthesize_yuv, yuv_from_planes


@pytest.fixture(scope="module")
def tiny_params(tmp_path_factory):
    from fasthevc_tpu.utils.video import synthesize_yuv as synth
    clips = synth(128, 64, 3, seed=7)
    params = train_self_distilled(clips=clips, qps=(32,), steps=120,
                                  log=lambda *_: None)
    p = tmp_path_factory.mktemp("model") / "partition.pkl"
    save_params(params, str(p))
    return load_params(str(p))


def test_predict_shape(tiny_params):
    y = np.random.default_rng(0).integers(0, 256, (64, 96)).astype(np.int32)
    depth = predict_depth_maps(tiny_params, y, qp=32)
    assert depth.shape == (8, 12)
    assert depth.min() >= 0 and depth.max() <= 2


def test_fast_partition_encode_conformant(tiny_params):
    cfg = EncoderConfig(width=96, height=64, qp=32, frames=2,
                        fast_partition=True)
    frames = synthesize_yuv(96, 64, 2, seed=61)
    enc = TpuEncoder(cfg, partition_params=tiny_params)
    stream, recons = enc.encode(frames)
    pics = SpecDecoder().decode(stream)
    for pic, rec in zip(pics, recons):
        assert pic.hash_ok is True
        np.testing.assert_array_equal(pic.planes.y, rec.y)


def test_fast_vs_full_quality_band(tiny_params):
    """Config #4 gate shape: fast partition must stay within a sane RD band
    of the full DP search (full BD-rate gate lives in the bench harness)."""
    frames = synthesize_yuv(96, 64, 1, seed=62)
    cfg_full = EncoderConfig(width=96, height=64, qp=32, frames=1)
    cfg_fast = cfg_full.replace(fast_partition=True)
    s_full, r_full = TpuEncoder(cfg_full).encode(frames)
    s_fast, r_fast = TpuEncoder(cfg_fast,
                                partition_params=tiny_params).encode(frames)
    y_full, *_ = yuv_from_planes((r_full[0].y, r_full[0].cb, r_full[0].cr),
                                 96, 64)
    y_fast, *_ = yuv_from_planes((r_fast[0].y, r_fast[0].cb, r_fast[0].cr),
                                 96, 64)
    p_full = psnr(frames[0][0], y_full)
    p_fast = psnr(frames[0][0], y_fast)
    assert p_fast > p_full - 1.5, (p_fast, p_full)
    assert len(s_fast) < len(s_full) * 1.35, (len(s_fast), len(s_full))


def test_requires_params():
    cfg = EncoderConfig(width=64, height=64, fast_partition=True)
    with pytest.raises(ValueError):
        TpuEncoder(cfg)
