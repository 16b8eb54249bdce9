"""Quantization scaling lists (SURVEY.md C2/C5): default matrices,
scaling_list_data syntax, and end-to-end encode/decode conformance."""

import numpy as np
import pytest

from fasthevc_tpu.config import EncoderConfig
from fasthevc_tpu.config.config import GopEntry
from fasthevc_tpu.spec.bitstream import BitReader, BitWriter
from fasthevc_tpu.spec.decoder import SpecDecoder
from fasthevc_tpu.spec.encoder import SpecEncoder
from fasthevc_tpu.spec.scaling import (
    DEFAULT_8X8_INTRA,
    default_matrix,
    parse_scaling_list_data,
    write_scaling_list_data,
)
from fasthevc_tpu.utils import synthesize_yuv

W, H = 64, 64


def test_default_matrix_shapes():
    assert (default_matrix(4, False) == 16).all()
    m8 = default_matrix(8, False)
    assert m8[0, 0] == 16 and m8[7, 7] == 115
    m16 = default_matrix(16, False)
    assert m16[0, 0] == 16           # DC override
    assert m16[1, 1] == 16 and m16[15, 15] == 115
    assert m16[14, 14] == DEFAULT_8X8_INTRA[7, 7]
    m32 = default_matrix(32, True)
    assert m32.shape == (32, 32) and m32[0, 0] == 16


def test_scaling_list_data_roundtrip_defaults():
    w = BitWriter()
    write_scaling_list_data(w, None)
    w.byte_align()
    got = parse_scaling_list_data(BitReader(w.get_bytes()))
    for size_id in range(4):
        for matrix_id in range(2 if size_id == 3 else 6):
            is_inter = (matrix_id >= 3 if size_id < 3 else matrix_id >= 1)
            np.testing.assert_array_equal(
                got[(size_id, matrix_id)],
                default_matrix(min(4 << size_id, 32), is_inter))


def test_scaling_list_data_roundtrip_custom():
    custom = {(1, 0): np.clip(DEFAULT_8X8_INTRA + 7, 1, 255),
              (2, 3): default_matrix(16, True) * 0 + 20}
    custom[(2, 3)][0, 0] = 24  # custom DC
    w = BitWriter()
    write_scaling_list_data(w, custom)
    w.byte_align()
    got = parse_scaling_list_data(BitReader(w.get_bytes()))
    np.testing.assert_array_equal(got[(1, 0)], custom[(1, 0)])
    np.testing.assert_array_equal(got[(2, 3)], custom[(2, 3)])
    # unspecified entries resolve to defaults
    np.testing.assert_array_equal(got[(1, 3)], default_matrix(8, True))


def test_scaling_lists_intra_decode():
    frames = synthesize_yuv(W, H, 2, seed=31)
    cfg = EncoderConfig(width=W, height=H, qp=30, frames=2, sao=False,
                        scaling_lists=True)
    stream, recs = SpecEncoder(cfg).encode(frames)
    dec = SpecDecoder()
    pics = dec.decode(stream)
    assert dec.sp.scaling_lists
    assert all(p.hash_ok for p in pics)
    for p, r in zip(pics, recs):
        np.testing.assert_array_equal(p.planes.y, r.y)


def test_scaling_lists_inter_decode():
    frames = synthesize_yuv(W, H, 3, seed=32)
    cfg = EncoderConfig(width=W, height=H, qp=30, frames=3, sao=False,
                        intra_period=-1, gop=[GopEntry(1, 0, "P", (-1,))],
                        scaling_lists=True, num_ref_per_list=1)
    stream, recs = SpecEncoder(cfg).encode(frames)
    pics = SpecDecoder().decode(stream)
    assert all(p.hash_ok for p in pics)


def test_scaling_lists_change_the_stream():
    """The matrices must actually shape quantization (8x8+ TBs)."""
    frames = synthesize_yuv(W, H, 1, seed=33)
    kw = dict(width=W, height=H, qp=30, frames=1, sao=False)
    s_on, _ = SpecEncoder(EncoderConfig(scaling_lists=True, **kw)).encode(frames)
    s_off, _ = SpecEncoder(EncoderConfig(scaling_lists=False, **kw)).encode(frames)
    assert s_on != s_off


def test_tpu_encoder_raises_loudly():
    from fasthevc_tpu.codec.encoder import TpuEncoder
    with pytest.raises(NotImplementedError):
        TpuEncoder(EncoderConfig(width=W, height=H, qp=30, frames=1,
                                 scaling_lists=True))
