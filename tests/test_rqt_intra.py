"""Depth-1 intra RQT (SURVEY.md E7): split_transform_flag on 2Nx2N intra
CUs — 4 sub-TBs predicted sequentially from each other's recon."""

import numpy as np
import pytest

from fasthevc_tpu.config import EncoderConfig
from fasthevc_tpu.config.config import GopEntry
from fasthevc_tpu.spec.decoder import SpecDecoder
from fasthevc_tpu.spec.encoder import SpecEncoder
from fasthevc_tpu.utils import synthesize_yuv

W, H = 64, 64


def test_intra_rqt_decode_parity():
    frames = synthesize_yuv(W, H, 2, seed=51)
    cfg = EncoderConfig(width=W, height=H, qp=32, frames=2, sao=False,
                        rqt_intra=True)
    stream, recs = SpecEncoder(cfg).encode(frames)
    dec = SpecDecoder()
    pics = dec.decode(stream)
    assert dec.sp.max_transform_hierarchy_depth_intra == 1
    assert all(p.hash_ok for p in pics)
    for p, r in zip(pics, recs):
        np.testing.assert_array_equal(p.planes.y, r.y)
        np.testing.assert_array_equal(p.planes.cb, r.cb)


def test_intra_rqt_actually_splits():
    """On structured content at least one CU must choose the split (else
    the tool is dead code) — detected via the recon difference."""
    frames = synthesize_yuv(W, H, 1, seed=52)
    kw = dict(width=W, height=H, qp=37, frames=1, sao=False,
              deblocking=False)
    s_on, r_on = SpecEncoder(EncoderConfig(rqt_intra=True, **kw)).encode(frames)
    s_off, r_off = SpecEncoder(EncoderConfig(rqt_intra=False, **kw)).encode(frames)
    assert s_on != s_off


def test_intra_rqt_rd_no_regression():
    """The RD-searched split must not lose: cost(on) <= cost(off) in the
    lambda-weighted sense, proxied by bits at >= equal PSNR or fewer
    bits at slightly lower PSNR within the lambda trade."""
    from fasthevc_tpu.utils import psnr

    frames = synthesize_yuv(W, H, 2, seed=53)
    kw = dict(width=W, height=H, qp=32, frames=2, sao=False)
    s_on, r_on = SpecEncoder(EncoderConfig(rqt_intra=True, **kw)).encode(frames)
    s_off, r_off = SpecEncoder(EncoderConfig(rqt_intra=False, **kw)).encode(frames)
    lam = 0.57 * 2.0 ** ((32 - 12) / 3.0)

    def cost(stream, recs):
        d = 0
        for i, r in enumerate(recs):
            res = frames[i][0].astype(np.int64) - np.asarray(r.y)[:H, :W]
            d += int((res * res).sum())
        return d + lam * len(stream) * 8

    assert cost(s_on, r_on) <= cost(s_off, r_off) * 1.001


def test_intra_rqt_in_p_slices():
    frames = synthesize_yuv(W, H, 3, seed=54)
    cfg = EncoderConfig(width=W, height=H, qp=32, frames=3, sao=False,
                        intra_period=-1, gop=[GopEntry(1, 0, "P", (-1,))],
                        rqt_intra=True, num_ref_per_list=1)
    stream, _ = SpecEncoder(cfg).encode(frames)
    pics = SpecDecoder().decode(stream)
    assert all(p.hash_ok for p in pics)


def test_intra_rqt_with_deblock_and_sao():
    """TU-split interior edges feed deblock edge derivation; SAO on top."""
    frames = synthesize_yuv(W, H, 1, seed=55)
    cfg = EncoderConfig(width=W, height=H, qp=37, frames=1, sao=True,
                        deblocking=True, rqt_intra=True)
    stream, recs = SpecEncoder(cfg).encode(frames)
    pics = SpecDecoder().decode(stream)
    assert all(p.hash_ok for p in pics)
    np.testing.assert_array_equal(pics[0].planes.y, recs[0].y)


def test_default_off_stream_unchanged():
    frames = synthesize_yuv(W, H, 1, seed=56)
    kw = dict(width=W, height=H, qp=32, frames=1, sao=False)
    s1, _ = SpecEncoder(EncoderConfig(**kw)).encode(frames)
    s2, _ = SpecEncoder(EncoderConfig(rqt_intra=False, **kw)).encode(frames)
    assert s1 == s2


def test_tpu_encoder_raises_loudly():
    from fasthevc_tpu.codec.encoder import TpuEncoder
    with pytest.raises(NotImplementedError):
        TpuEncoder(EncoderConfig(width=W, height=H, qp=32, frames=1,
                                 rqt_intra=True))
