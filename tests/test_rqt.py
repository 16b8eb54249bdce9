"""Depth-1 residual quadtree for inter CUs (spec 7.3.8.8
split_transform_flag) — VERDICT r4 item 5: 32->4x16 / 16->4x8 TU splits,
RD-searched, in the oracle, the native engine and the Python fallback,
with decode parity and deblock TU-edge exactness (via hash SEI)."""

import numpy as np
import pytest

import fasthevc_tpu.codec.encoder as enc_mod
from fasthevc_tpu.codec.encoder import TpuEncoder
from fasthevc_tpu.config import EncoderConfig
from fasthevc_tpu.config.config import GopEntry
from fasthevc_tpu.spec.decoder import SpecDecoder
from fasthevc_tpu.spec.encoder import SpecEncoder


def _sparse_motion_clip(w, h, n=3, seed=31):
    """Static background + one small high-detail patch that moves: inter
    residuals concentrate in one TU child, where the depth-1 split wins."""
    rng = np.random.default_rng(seed)
    bg = rng.integers(100, 140, (h, w)).astype(np.uint8)
    out = []
    for t in range(n):
        y = bg.copy()
        px, py = 8 + 5 * t, 8 + 3 * t
        y[py:py + 12, px:px + 12] = rng.integers(0, 255, (12, 12))
        cb = np.full((h // 2, w // 2), 120, np.uint8)
        cr = np.full((h // 2, w // 2), 130, np.uint8)
        cb[(py + 6) // 2:(py + 18) // 2, (px + 6) // 2:(px + 18) // 2] = 60
        out.append((y, cb, cr))
    return out


_P_KW = dict(intra_period=-1, gop=[GopEntry(1, 1, "P", (-1,))])


def test_rqt_oracle_stream_decodes_and_split_used():
    """Oracle with rqt_inter: decode hash OK; the reconstruction must
    differ from the rqt-off encode (i.e. some CU actually split)."""
    frames = _sparse_motion_clip(64, 64)
    cfg = EncoderConfig(width=64, height=64, qp=35, frames=3, sao=False,
                        rqt_inter=True, **_P_KW)
    s_on, r_on = SpecEncoder(cfg).encode(frames)
    pics = SpecDecoder().decode(s_on)
    assert all(p.hash_ok for p in pics)
    s_off, r_off = SpecEncoder(cfg.replace(rqt_inter=False)).encode(frames)
    assert s_on != s_off
    assert any(not np.array_equal(a.y, b.y) for a, b in zip(r_on, r_off)), \
        "split_transform_flag never chosen by the oracle on split-friendly content"
    assert all(p.hash_ok for p in SpecDecoder().decode(s_off))


def test_rqt_native_python_parity(monkeypatch):
    """TpuEncoder classic path: the C++ engine and the Python fallback
    must make identical split decisions (byte-identical streams)."""
    cpp = pytest.importorskip("fasthevc_tpu.cabac_cpp")
    if not cpp.available():
        pytest.skip("C++ toolchain unavailable")
    frames = _sparse_motion_clip(96, 64)
    cfg = EncoderConfig(width=96, height=64, qp=35, frames=3, sao=False,
                        rqt_inter=True, **_P_KW)
    ns, nr = TpuEncoder(cfg).encode(frames)
    with monkeypatch.context() as m:
        m.setattr(enc_mod, "_native_engine", lambda: None)
        ps, pr = TpuEncoder(cfg).encode(frames)
    assert ns == ps, "native and python RQT streams differ"
    for a, b in zip(nr, pr):
        np.testing.assert_array_equal(np.asarray(a.y), np.asarray(b.y))
    pics = SpecDecoder().decode(ns)
    assert all(p.hash_ok for p in pics)


def test_rqt_split_chosen_on_production_path():
    """The production (native) commit must actually choose splits on
    split-friendly content, and deblock must stay encoder==decoder exact
    at the new interior TU edges (hash SEI check)."""
    cpp = pytest.importorskip("fasthevc_tpu.cabac_cpp")
    if not cpp.available():
        pytest.skip("C++ toolchain unavailable")
    frames = _sparse_motion_clip(96, 64)
    cfg = EncoderConfig(width=96, height=64, qp=35, frames=3, sao=False,
                        rqt_inter=True, **_P_KW)
    s_on, r_on = TpuEncoder(cfg).encode(frames)
    s_off, r_off = TpuEncoder(cfg.replace(rqt_inter=False)).encode(frames)
    assert s_on != s_off
    assert any(not np.array_equal(np.asarray(a.y), np.asarray(b.y))
               for a, b in zip(r_on, r_off)), \
        "split never chosen on the production path"
    for s in (s_on, s_off):
        assert all(p.hash_ok for p in SpecDecoder().decode(s))


def test_rqt_b_frames_decode():
    """Hierarchical-B with RQT: conformant streams, hash OK."""
    cpp = pytest.importorskip("fasthevc_tpu.cabac_cpp")
    if not cpp.available():
        pytest.skip("C++ toolchain unavailable")
    frames = _sparse_motion_clip(64, 64, n=5, seed=17)
    gop = [GopEntry(4, 1, "B", (-4,)), GopEntry(2, 2, "B", (-2, 2)),
           GopEntry(1, 3, "B", (-1, 1)), GopEntry(3, 3, "B", (-1, 1))]
    cfg = EncoderConfig(width=64, height=64, qp=33, frames=5, sao=False,
                        intra_period=-1, gop=gop, rqt_inter=True)
    stream, _ = TpuEncoder(cfg).encode(frames)
    pics = SpecDecoder().decode(stream)
    assert len(pics) == 5 and all(p.hash_ok for p in pics)
