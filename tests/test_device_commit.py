"""Device pixel-path exactness: wavefront commit, deblock, SAO (SURVEY.md
§7.0 step 3 — decision-then-commit with the commit ON DEVICE).

The wavefront commit (ops/commit.py) must be bit-identical to the C++
engine's commit pass for the same decisions; the device deblock must be
bit-identical to the spec oracle; the device SAO application must match
the decoder's transform exactly. The integrated device pipeline must
produce byte-identical bitstreams to the classic path where comparable
(SAO off — SAO estimation is encoder freedom) and decode-verify always.
"""

import os

import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _enable_device_paths(monkeypatch):
    """This module tests the DEVICE pipeline; the suite-wide classic
    forcing (conftest) must not apply here."""
    monkeypatch.delenv("FASTHEVC_FORCE_CLASSIC", raising=False)


jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

from fasthevc_tpu import cabac_cpp
from fasthevc_tpu.codec.encoder import TpuEncoder
from fasthevc_tpu.config import EncoderConfig
from fasthevc_tpu.spec.cabac import ContextSet
from fasthevc_tpu.spec.ctu import Planes, tu_qps
from fasthevc_tpu.spec.decoder import SpecDecoder
from fasthevc_tpu.utils import synthesize_yuv
from fasthevc_tpu.utils.video import pad_plane

pytestmark = pytest.mark.skipif(not cabac_cpp.available(),
                                reason="C++ engine unavailable")


def _random_quadtree_depth(gh, gw, rng):
    depth = np.zeros((gh, gw), np.int8)
    for cy in range(0, gh, 4):
        for cx in range(0, gw, 4):
            if rng.random() < 0.7:
                for sy in range(2):
                    for sx in range(2):
                        d = 1 + (rng.random() < 0.5)
                        depth[cy + 2 * sy:cy + 2 * sy + 2,
                              cx + 2 * sx:cx + 2 * sx + 2] = d
    return depth


def test_deblock_device_matches_oracle():
    from fasthevc_tpu.ops.deblock import deblock_device
    from fasthevc_tpu.spec.deblock import deblock_picture

    rng = np.random.default_rng(0)
    for trial in range(3):
        w, h = int(rng.choice([64, 96, 128])), int(rng.choice([64, 96]))
        depth = _random_quadtree_depth(h // 8, w // 8, rng)
        qp = int(rng.integers(18, 45))
        y = rng.integers(0, 256, (h, w)).astype(np.int32)
        cb = rng.integers(0, 256, (h // 2, w // 2)).astype(np.int32)
        cr = rng.integers(0, 256, (h // 2, w // 2)).astype(np.int32)

        class P:
            pass

        class SP:
            bit_depth, log2_ctu, log2_max_tu = 8, 5, 5

        p = P()
        p.y, p.cb, p.cr = y.copy(), cb.copy(), cr.copy()
        deblock_picture(p, SP(), depth.astype(np.int32), qp, qp, qp,
                        maps=None)
        dy, dcb, dcr = deblock_device(
            jnp.asarray(y), jnp.asarray(cb), jnp.asarray(cr),
            jnp.asarray(depth.astype(np.int32)), qp, qp, qp, 5)
        assert np.array_equal(p.y, np.asarray(dy))
        assert np.array_equal(p.cb, np.asarray(dcb))
        assert np.array_equal(p.cr, np.asarray(dcr))


def test_sao_device_apply_matches_oracle():
    from fasthevc_tpu.ops.sao import sao_device
    from fasthevc_tpu.spec.sao import SaoParam, apply_sao_plane

    rng = np.random.default_rng(1)
    w, h = 104, 72
    src = rng.integers(0, 256, (h, w)).astype(np.int32)
    rec = np.clip(src + rng.integers(-6, 7, (h, w)), 0, 255).astype(np.int32)
    scb = rng.integers(0, 256, (h // 2, w // 2)).astype(np.int32)
    rcb = np.clip(scb + rng.integers(-6, 7, scb.shape), 0,
                  255).astype(np.int32)
    scr = rng.integers(0, 256, (h // 2, w // 2)).astype(np.int32)
    rcr = np.clip(scr + rng.integers(-6, 7, scr.shape), 0,
                  255).astype(np.int32)
    oy, ocb, ocr, params = sao_device(
        *(jnp.asarray(a) for a in (src, scb, scr, rec, rcb, rcr)), 5)
    params = np.asarray(params)
    ny, nx = params.shape[:2]

    def grid(ci):
        return [[SaoParam(int(params[by, bx, ci, 0]),
                          int(params[by, bx, ci, 1]),
                          int(params[by, bx, ci, 2]),
                          tuple(int(v) for v in params[by, bx, ci, 3:]))
                 for bx in range(nx)] for by in range(ny)]

    assert np.array_equal(apply_sao_plane(rec, grid(0), 32),
                          np.asarray(oy))
    assert np.array_equal(apply_sao_plane(rcb, grid(1), 16),
                          np.asarray(ocb))
    assert np.array_equal(apply_sao_plane(rcr, grid(2), 16),
                          np.asarray(ocr))
    # SAO must not increase luma distortion (estimation sanity)
    assert ((src - np.asarray(oy)) ** 2).sum() <= ((src - rec) ** 2).sum()


def test_wavefront_commit_matches_cpp():
    from fasthevc_tpu.ops.commit import wavefront_commit_intra

    for trial, (w, h, qp) in enumerate(((96, 64, 32), (104, 72, 27))):
        clip = synthesize_yuv(w, h, 1, seed=trial)
        cfg = EncoderConfig(width=w, height=h, qp=qp, frames=1)
        enc = TpuEncoder(cfg)
        sp = enc.sp
        y, cb, cr = clip[0]
        src = Planes(sp)
        src.y[:] = pad_plane(np.asarray(y, np.int32), sp.coded_height,
                             sp.coded_width)
        src.cb[:] = pad_plane(np.asarray(cb, np.int32),
                              sp.coded_height // 2, sp.coded_width // 2)
        src.cr[:] = pad_plane(np.asarray(cr, np.int32),
                              sp.coded_height // 2, sp.coded_width // 2)
        pw = -(-sp.coded_width // 32) * 32
        ph = -(-sp.coded_height // 32) * 32
        y_pad = pad_plane(src.y, ph, pw)
        packed = np.asarray(enc._search_dispatch(y_pad, ((), ()), 2, True,
                                                 pw, ph, qp=qp))
        gw, gh = sp.coded_width >> 3, sp.coded_height >> 3
        depth = np.ascontiguousarray(packed[:gh, :gw, 0].astype(np.int8))
        mode = np.ascontiguousarray(packed[:gh, :gw, 1].astype(np.int8))
        qp_y, qp_cb, qp_cr = tu_qps(sp, qp)
        subs_ref, ry, rcb, rcr, _ = cabac_cpp.encode_slice_native(
            (src.y, src.cb, src.cr), sp, qp_y, qp_cb, qp_cr, depth, mode,
            ContextSet(0, qp), False, deblock=False, sao=False,
            rdoq=False, sdh=True)
        dy, dcb, dcr, lvy, lvcb, lvcr = wavefront_commit_intra(
            jnp.asarray(src.y), jnp.asarray(src.cb), jnp.asarray(src.cr),
            jnp.asarray(depth.astype(np.int32)),
            jnp.asarray(mode.astype(np.int32)),
            jnp.int32(qp_y), jnp.int32(qp_cb), jnp.int32(qp_cr),
            sp.coded_width, sp.coded_height, sdh=True)
        assert np.array_equal(ry, np.asarray(dy)), "luma recon"
        assert np.array_equal(rcb, np.asarray(dcb)), "cb recon"
        assert np.array_equal(rcr, np.asarray(dcr)), "cr recon"
        # entropy from the device levels must be byte-identical
        subs_dev = cabac_cpp.entropy_slice_native(
            sp, qp_y, qp_cb, qp_cr, depth, mode, np.asarray(lvy),
            np.asarray(lvcb), np.asarray(lvcr), ContextSet(0, qp),
            sao_params=None, sdh=True)
        assert [bytes(a) for a in subs_ref] == [bytes(b) for b in subs_dev]


def test_device_path_byte_identical_to_classic():
    import fasthevc_tpu.codec.device_pipeline as dp

    clip = synthesize_yuv(104, 72, 3, seed=3)
    # rdoq=False: cross-tier byte-identity holds for scalar quant only
    cfg = EncoderConfig(width=104, height=72, qp=32, frames=3, sao=False,
                        rdoq=False)
    s_dev, _ = TpuEncoder(cfg).encode(clip)
    orig = dp.device_path_ok
    dp.device_path_ok = lambda c, s: False
    try:
        s_classic, _ = TpuEncoder(cfg).encode(clip)
    finally:
        dp.device_path_ok = orig
    assert s_dev == s_classic


def test_device_path_decode_verify_with_filters():
    clip = synthesize_yuv(104, 72, 4, seed=4)
    cfg = EncoderConfig(width=104, height=72, qp=30, frames=4)
    stream, recons = TpuEncoder(cfg).encode(clip)
    pics = SpecDecoder().decode(stream)
    assert all(p.hash_ok for p in pics)


def test_device_path_tiled_byte_identical():
    import fasthevc_tpu.codec.device_pipeline as dp

    clip = synthesize_yuv(128, 96, 2, seed=5)
    cfg = EncoderConfig(width=128, height=96, qp=30, frames=2,
                        tile_cols=2, tile_rows=1, sao=False, rdoq=False)
    s_dev, _ = TpuEncoder(cfg).encode(clip)
    orig = dp.device_path_ok
    dp.device_path_ok = lambda c, s: False
    try:
        s_classic, _ = TpuEncoder(cfg).encode(clip)
    finally:
        dp.device_path_ok = orig
    assert s_dev == s_classic
    pics = SpecDecoder().decode(s_dev)
    assert all(p.hash_ok for p in pics)
