"""Multi-slice pictures (SURVEY.md P3): independent slice segments with
slice_segment_address, per-slice CABAC init, slice-boundary-constrained
prediction, and decoder continuation across slice NALs."""

import numpy as np
import pytest

from fasthevc_tpu.config import EncoderConfig
from fasthevc_tpu.config.config import GopEntry
from fasthevc_tpu.spec import bitstream as bs
from fasthevc_tpu.spec.decoder import SpecDecoder
from fasthevc_tpu.spec.encoder import SpecEncoder
from fasthevc_tpu.utils import synthesize_yuv

W, H = 64, 96  # 2x3 CTUs at CTU-32


def _vcl_nals(stream):
    return [(t, rbsp) for t, _, rbsp in bs.split_annexb(stream)
            if t <= 31]


@pytest.mark.parametrize("n_slices", [2, 3])
def test_multislice_intra_decodes(n_slices):
    frames = synthesize_yuv(W, H, 2, seed=11)
    cfg = EncoderConfig(width=W, height=H, qp=32, frames=2, sao=False,
                        slices=n_slices)
    stream, recs = SpecEncoder(cfg).encode(frames)
    assert len(_vcl_nals(stream)) == 2 * n_slices
    pics = SpecDecoder().decode(stream)
    assert len(pics) == 2
    assert all(p.hash_ok for p in pics)
    for p, r in zip(pics, recs):
        np.testing.assert_array_equal(p.planes.y, r.y)


def test_multislice_p_frames_decode():
    frames = synthesize_yuv(W, H, 3, seed=12)
    cfg = EncoderConfig(width=W, height=H, qp=32, frames=3, sao=False,
                        intra_period=-1, gop=[GopEntry(1, 0, "P", (-1,))],
                        slices=2, num_ref_per_list=1)
    stream, recs = SpecEncoder(cfg).encode(frames)
    assert len(_vcl_nals(stream)) == 6
    pics = SpecDecoder().decode(stream)
    assert all(p.hash_ok for p in pics)


def test_multislice_with_sao():
    frames = synthesize_yuv(W, H, 1, seed=13)
    cfg = EncoderConfig(width=W, height=H, qp=37, frames=1, sao=True,
                        slices=2)
    stream, recs = SpecEncoder(cfg).encode(frames)
    pics = SpecDecoder().decode(stream)
    assert all(p.hash_ok for p in pics)


def test_multislice_with_deblock_and_wp():
    """Slices compose with the other tools: deblock across slice edges
    (loop_filter_across_slices on) + weighted prediction per slice."""
    from tests.test_weighted_pred import fade_clip

    frames = fade_clip(3, w=W, h=H)
    cfg = EncoderConfig(width=W, height=H, qp=30, frames=3, sao=False,
                        intra_period=-1, gop=[GopEntry(1, 0, "P", (-1,))],
                        slices=3, weighted_pred=True, num_ref_per_list=1)
    stream, recs = SpecEncoder(cfg).encode(frames)
    pics = SpecDecoder().decode(stream)
    assert all(p.hash_ok for p in pics)


def test_single_slice_stream_unchanged():
    """slices=1 must not perturb the bitstream (no header drift)."""
    frames = synthesize_yuv(W, H, 1, seed=14)
    s1, _ = SpecEncoder(EncoderConfig(width=W, height=H, qp=32, frames=1,
                                      sao=False)).encode(frames)
    s2, _ = SpecEncoder(EncoderConfig(width=W, height=H, qp=32, frames=1,
                                      sao=False, slices=1)).encode(frames)
    assert s1 == s2


def test_slice_segment_address_syntax():
    """Non-first slices carry the CTU raster address; decoded pictures
    place each slice's CTUs at the right rows (content check)."""
    frames = synthesize_yuv(W, H, 1, seed=15)
    cfg = EncoderConfig(width=W, height=H, qp=22, frames=1, sao=False,
                        slices=3, deblocking=False)
    stream, recs = SpecEncoder(cfg).encode(frames)
    pics = SpecDecoder().decode(stream)
    assert pics[0].hash_ok
    # near-lossless at QP 22: every region must correlate with source
    y = np.asarray(pics[0].planes.y[:H, :W])
    src = frames[0][0].astype(np.int32)
    assert np.abs(y - src).mean() < 6.0
