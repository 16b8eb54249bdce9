"""Native C++ slice engine must match the Python commit+entropy path
byte-for-byte, and its streams must decode with hash OK."""

import numpy as np
import pytest

import fasthevc_tpu.codec.encoder as enc_mod
from fasthevc_tpu.codec.encoder import TpuEncoder
from fasthevc_tpu.config import EncoderConfig
from fasthevc_tpu.spec.decoder import SpecDecoder
from fasthevc_tpu.utils import synthesize_yuv

cpp = pytest.importorskip("fasthevc_tpu.cabac_cpp")
if not cpp.available():
    pytest.skip("C++ toolchain unavailable", allow_module_level=True)


def _encode_both(cfg, frames, monkeypatch):
    enc = TpuEncoder(cfg)
    native_stream, native_recons = enc.encode(frames)
    with monkeypatch.context() as m:
        m.setattr(enc_mod, "_native_engine", lambda: None)
        enc2 = TpuEncoder(cfg)
        py_stream, py_recons = enc2.encode(frames)
    return native_stream, native_recons, py_stream, py_recons


@pytest.mark.parametrize("dims,qp", [((96, 64), 32), ((88, 72), 27),
                                     ((64, 64), 45)])
def test_native_matches_python_bitstream(dims, qp, monkeypatch):
    w, h = dims
    cfg = EncoderConfig(width=w, height=h, qp=qp, frames=2, sao=False)
    frames = synthesize_yuv(w, h, 2, seed=qp)
    ns, nr, ps, pr = _encode_both(cfg, frames, monkeypatch)
    assert ns == ps, "native and python streams differ"
    for a, b in zip(nr, pr):
        np.testing.assert_array_equal(a.y, b.y)
        np.testing.assert_array_equal(a.cb, b.cb)
        np.testing.assert_array_equal(a.cr, b.cr)


def test_native_ctu64(monkeypatch):
    cfg = EncoderConfig(width=128, height=128, qp=32, frames=1, log2_ctu=6,
                        sao=False)
    frames = synthesize_yuv(128, 128, 1, seed=5)
    ns, nr, ps, pr = _encode_both(cfg, frames, monkeypatch)
    assert ns == ps


def test_native_lossless(monkeypatch):
    cfg = EncoderConfig(width=64, height=64, qp=32, frames=1, lossless=True)
    frames = synthesize_yuv(64, 64, 1, seed=6)
    ns, nr, ps, pr = _encode_both(cfg, frames, monkeypatch)
    assert ns == ps
    np.testing.assert_array_equal(np.asarray(nr[0].y[:64, :64]),
                                  frames[0][0].astype(np.int32))


def test_native_stream_decodes():
    cfg = EncoderConfig(width=96, height=64, qp=32, frames=2, sao=False)
    frames = synthesize_yuv(96, 64, 2, seed=7)
    stream, recons = TpuEncoder(cfg).encode(frames)
    pics = SpecDecoder().decode(stream)
    assert len(pics) == 2
    for pic, rec in zip(pics, recons):
        assert pic.hash_ok is True
        np.testing.assert_array_equal(pic.planes.y, rec.y)


def test_native_tiled_parallel():
    """Tiled native engine: threaded per-tile substreams decode with hash
    OK and match the SpecEncoder tile semantics."""
    cfg = EncoderConfig(width=128, height=96, qp=33, frames=2, tile_cols=2,
                        tile_rows=2)
    frames = synthesize_yuv(128, 96, 2, seed=77)
    stream, recons = TpuEncoder(cfg).encode(frames)
    pics = SpecDecoder().decode(stream)
    assert len(pics) == 2
    for pic, rec in zip(pics, recons):
        assert pic.hash_ok is True
        np.testing.assert_array_equal(pic.planes.y, rec.y)
        np.testing.assert_array_equal(pic.planes.cb, rec.cb)


def test_native_tiled_vs_untiled_streams_differ():
    cfg1 = EncoderConfig(width=128, height=64, qp=32, frames=1, sao=False)
    cfg2 = cfg1.replace(tile_cols=2)
    frames = synthesize_yuv(128, 64, 1, seed=78)
    s1, _ = TpuEncoder(cfg1).encode(frames)
    s2, _ = TpuEncoder(cfg2).encode(frames)
    assert s1 != s2
    assert len(s2) < len(s1) * 1.3


def test_native_matches_python_p_frames(monkeypatch):
    """Native inter commit must be byte-identical to the Python commit."""
    from fasthevc_tpu.config import low_delay_p
    cfg = low_delay_p(width=96, height=64, qp=33, frames=3, sao=False)
    frames = synthesize_yuv(96, 64, 3, seed=79)
    ns, nr, ps, pr = _encode_both(cfg, frames, monkeypatch)
    assert ns == ps, "native and python P streams differ"
    for a, b in zip(nr, pr):
        np.testing.assert_array_equal(a.y, b.y)


def test_native_matches_python_b_frames(monkeypatch):
    from fasthevc_tpu.config import EncoderConfig, GopEntry
    gop = [GopEntry(4, 1, "B", (-4,)), GopEntry(2, 3, "B", (-2, 2)),
           GopEntry(1, 4, "B", (-1, 1)), GopEntry(3, 4, "B", (-1, 1))]
    cfg = EncoderConfig(width=96, height=64, qp=35, frames=5,
                        intra_period=-1, gop=gop, sao=False)
    frames = synthesize_yuv(96, 64, 5, seed=80)
    ns, nr, ps, pr = _encode_both(cfg, frames, monkeypatch)
    assert ns == ps, "native and python B streams differ"
    for a, b in zip(nr, pr):
        np.testing.assert_array_equal(a.y, b.y)


def test_native_sao_stream_decodes():
    """SAO in the two-phase native engine: the stream must carry SAO
    syntax and decode with hash OK; SAO must not hurt quality."""
    from fasthevc_tpu.utils import psnr, yuv_from_planes

    w, h = 128, 96
    frames = synthesize_yuv(w, h, 2, seed=9)
    res = {}
    for sao in (False, True):
        cfg = EncoderConfig(width=w, height=h, qp=37, frames=2, sao=sao)
        enc = TpuEncoder(cfg)
        assert enc.sp.sao_enabled == sao
        stream, recons = enc.encode(frames)
        pics = SpecDecoder().decode(stream)
        assert all(p.hash_ok for p in pics), f"hash mismatch (sao={sao})"
        ry, _, _ = yuv_from_planes((recons[0].y, recons[0].cb, recons[0].cr),
                                   w, h)
        res[sao] = psnr(frames[0][0], ry)
    # SAO picks parameters only when they reduce distortion
    assert res[True] >= res[False] - 1e-9


def test_native_sao_tiled_decodes():
    cfg = EncoderConfig(width=128, height=96, qp=37, frames=2, tile_cols=2,
                        tile_rows=2)
    frames = synthesize_yuv(128, 96, 2, seed=11)
    stream, _ = TpuEncoder(cfg).encode(frames)
    pics = SpecDecoder().decode(stream)
    assert all(p.hash_ok for p in pics)
