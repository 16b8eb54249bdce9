"""transform_skip (4x4 TBs, spec 7.3.8.11 / 8.6.4.2) — VERDICT r1 item 8
scope: oracle encoder searches DCT-vs-TS per 4x4 TB, decoder inverts both.
"""

import numpy as np
import pytest

from fasthevc_tpu.config import EncoderConfig
from fasthevc_tpu.spec import transform
from fasthevc_tpu.spec.decoder import SpecDecoder
from fasthevc_tpu.spec.encoder import SpecEncoder
from fasthevc_tpu.utils import synthesize_yuv

from tests.test_nxn import _ForceNxN, _detail_clip


def test_ts_transform_inverse_identity_lowres():
    """forward_ts -> quantize(QP4) -> dequantize -> inverse_ts reproduces
    small residuals exactly (the scale ladder is self-consistent)."""
    rng = np.random.default_rng(2)
    res = rng.integers(-64, 65, (4, 4)).astype(np.int32)
    c = transform.forward_transform_skip(res, 8)
    lv = transform.quantize(c, 4, 8, is_intra=True)
    deq = transform.dequantize(lv, 4, 8)
    out = transform.inverse_transform_skip(deq, 8)
    assert np.abs(out - res).max() <= 1


def _screenish_clip(w, h):
    """Sharp flat/step content where transform_skip wins (screen text)."""
    rng = np.random.default_rng(44)
    y = np.full((h, w), 200, np.uint8)
    for _ in range(w * h // 64):
        x0, y0 = rng.integers(0, w - 3), rng.integers(0, h - 3)
        y[y0:y0 + 3, x0:x0 + 3] = rng.integers(0, 60)
    cb = np.full((h // 2, w // 2), 128, np.uint8)
    cr = np.full((h // 2, w // 2), 128, np.uint8)
    return [(y, cb, cr)]


def test_ts_stream_decodes_and_flag_used():
    """NxN + transform_skip on screen-like content: some 4x4 TB must pick
    TS and the stream must decode with hash match."""
    frames = _screenish_clip(64, 64)
    cfg = EncoderConfig(width=64, height=64, qp=30, frames=1, sao=False,
                        nxn_intra=True, transform_skip=True)
    enc = _ForceNxN(cfg)
    stream, recs = enc.encode(frames)
    pics = SpecDecoder().decode(stream)
    assert pics[0].hash_ok
    np.testing.assert_array_equal(pics[0].planes.y, recs[0].y)


def test_ts_chosen_somewhere_on_screen_content():
    """The RD choice must actually use TS on flat/step content (not dead
    code): count ts flags through a spy on the TQ chooser."""
    frames = _screenish_clip(64, 64)
    cfg = EncoderConfig(width=64, height=64, qp=30, frames=1, sao=False,
                        nxn_intra=True, transform_skip=True)
    enc = _ForceNxN(cfg)
    picked = []
    orig = enc._tq_intra_tb

    def spy(res, qp, blog2, c_idx, scan):
        levels, ts = orig(res, qp, blog2, c_idx, scan)
        picked.append(ts)
        return levels, ts

    enc._tq_intra_tb = spy
    stream, _ = enc.encode(frames)
    assert any(picked), "transform_skip never chosen on screen content"
    assert SpecDecoder().decode(stream)[0].hash_ok


def test_ts_flag_off_means_identical_stream():
    """transform_skip=False must produce exactly the previous syntax."""
    frames = synthesize_yuv(64, 64, 1, seed=5)
    cfg = EncoderConfig(width=64, height=64, qp=32, frames=1, sao=False)
    s1, _ = SpecEncoder(cfg).encode(frames)
    s2, _ = SpecEncoder(cfg.replace(transform_skip=False)).encode(frames)
    assert s1 == s2
