"""TPU encoder P-frame pipeline: batched ME search + conformance."""

import numpy as np
import pytest

from fasthevc_tpu.codec.encoder import TpuEncoder
from fasthevc_tpu.config import EncoderConfig, low_delay_p
from fasthevc_tpu.spec.decoder import SpecDecoder
from fasthevc_tpu.utils import synthesize_yuv


def test_full_search_finds_known_shift():
    import jax.numpy as jnp
    from fasthevc_tpu.ops.me import full_search
    rng = np.random.default_rng(0)
    ref = rng.integers(0, 256, (64, 64)).astype(np.int32)
    # src = ref shifted by (+3, -2): block content at (y,x) = ref[y-(-2)...]
    src = np.roll(np.roll(ref, 2, axis=0), -3, axis=1)
    sad, mv = full_search(jnp.asarray(src), jnp.asarray(ref), block=16,
                          search_range=8)
    mv = np.asarray(mv)
    # src[y][x] = ref[y-2][x+3] -> MC convention mv = (+3, -2) integer
    assert tuple(mv[5] // 4) == (3, -2)
    assert int(np.asarray(sad)[5]) == 0


def test_tpu_p_frames_conformant():
    cfg = low_delay_p(width=96, height=64, qp=32, frames=3)
    frames = synthesize_yuv(96, 64, 3, seed=81)
    stream, recons = TpuEncoder(cfg).encode(frames)
    pics = SpecDecoder().decode(stream)
    assert len(pics) == 3
    for pic, rec in zip(pics, recons):
        assert pic.hash_ok is True
        np.testing.assert_array_equal(pic.planes.y, rec.y)
        np.testing.assert_array_equal(pic.planes.cb, rec.cb)
        np.testing.assert_array_equal(pic.planes.cr, rec.cr)


def test_tpu_p_cheaper_than_intra():
    frames = synthesize_yuv(96, 64, 4, seed=82)
    cfg_p = low_delay_p(width=96, height=64, qp=32, frames=4)
    cfg_i = EncoderConfig(width=96, height=64, qp=32, frames=4)
    s_p, _ = TpuEncoder(cfg_p).encode(frames)
    s_i, _ = TpuEncoder(cfg_i).encode(frames)
    # synthetic clips carry per-frame independent noise (not motion-
    # compensatable), so the inter gain here is modest; the golden-encoder
    # inter test covers the stronger sub-pel path.
    assert len(s_p) < len(s_i) * 0.97, (len(s_p), len(s_i))


def test_tpu_p_with_intra_period():
    cfg = low_delay_p(width=64, height=64, qp=35, frames=5)
    cfg = cfg.replace(intra_period=2)
    frames = synthesize_yuv(64, 64, 5, seed=83)
    stream, recons = TpuEncoder(cfg).encode(frames)
    pics = SpecDecoder().decode(stream)
    assert len(pics) == 5
    assert all(p.hash_ok for p in pics)


def test_tpu_b_frames_random_access():
    """TPU encoder with the RA GOP-16 preset: B search (L0/L1/BI) +
    conformant streams."""
    from fasthevc_tpu.config import random_access_gop16
    cfg = random_access_gop16(width=64, height=64, qp=35, frames=17,
                              sao=False, deblocking=False)
    frames = synthesize_yuv(64, 64, 17, seed=85)
    stream, recons = TpuEncoder(cfg).encode(frames)
    pics = SpecDecoder().decode(stream)
    assert len(pics) == 17
    assert all(p.hash_ok for p in pics)


def test_tpu_b_frames_gop8_with_deblock():
    from fasthevc_tpu.config import EncoderConfig, GopEntry
    gop = [GopEntry(4, 1, "B", (-4,)), GopEntry(2, 3, "B", (-2, 2)),
           GopEntry(1, 4, "B", (-1, 1)), GopEntry(3, 4, "B", (-1, 1))]
    cfg = EncoderConfig(width=96, height=64, qp=32, frames=5,
                        intra_period=-1, gop=gop, deblocking=True)
    frames = synthesize_yuv(96, 64, 5, seed=86)
    stream, recons = TpuEncoder(cfg).encode(frames)
    pics = SpecDecoder().decode(stream)
    assert all(p.hash_ok for p in pics)
