"""Device-parallel RDOQ (ops/rdoq.py — SURVEY.md §2.2 C5 on the device
tier).

The device trellis is the closed-form re-derivation of HM's sequential
xRateDistOptQuant (spec/rdoq.py is the exact mirror): same candidate set
{0, m, m-1}, same CG zeroing and last-position decisions, but with the
CABAC context schedule computed in parallel from the provisional level
map.  It is encoder freedom — streams need not match the exact trellis —
so the gates here are (a) conformance (decode hash), (b) the RD win
itself: fewer bits at >= PSNR than scalar quantization on the SAME device
path, and (c) trellis-shape agreement with the spec trellis on random
blocks (nonzero pattern within a small tolerance).
"""

import os

import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _enable_device_paths(monkeypatch):
    monkeypatch.delenv("FASTHEVC_FORCE_CLASSIC", raising=False)


jnp = pytest.importorskip("jax.numpy")

from fasthevc_tpu import cabac_cpp
from fasthevc_tpu.codec.encoder import TpuEncoder
from fasthevc_tpu.config import EncoderConfig
from fasthevc_tpu.spec.decoder import SpecDecoder
from fasthevc_tpu.utils import synthesize_yuv
from fasthevc_tpu.utils.video import psnr

pytestmark = pytest.mark.skipif(not cabac_cpp.available(),
                                reason="C++ engine unavailable")

W, H = 192, 128


def _mean_psnr(frames, pics):
    return float(np.mean([
        psnr(np.asarray(frames[i][0], np.int32),
             np.asarray(pics[i].planes.y, np.int32))
        for i in range(len(pics))]))


def test_device_rdoq_conformance_and_rd_win():
    frames = synthesize_yuv(W, H, 3, seed=3)
    res = {}
    for rdoq in (False, True):
        cfg = EncoderConfig(width=W, height=H, qp=32, frames=3, rdoq=rdoq)
        stream, _ = TpuEncoder(cfg).encode(frames)
        pics = SpecDecoder().decode(stream)
        assert all(p.hash_ok for p in pics)
        res[rdoq] = (len(stream), _mean_psnr(frames, pics))
    bits_off, psnr_off = res[False]
    bits_on, psnr_on = res[True]
    # the RD win: strictly fewer bits without losing quality (0.05 dB
    # slack for the quality side; on this content RDOQ gains both)
    assert bits_on < bits_off
    assert psnr_on > psnr_off - 0.05


def test_device_rdoq_inter_conformance():
    from fasthevc_tpu.config.config import low_delay_p
    frames = synthesize_yuv(W, H, 5, seed=11)
    cfg = low_delay_p(width=W, height=H, qp=32, frames=5, rdoq=True)
    stream, _ = TpuEncoder(cfg).encode(frames)
    pics = SpecDecoder().decode(stream)
    assert len(pics) == 5 and all(p.hash_ok for p in pics)


def test_parallel_trellis_tracks_spec_trellis():
    """Per-block sanity: the device trellis's decisions stay close to the
    exact trellis (same candidate set + cost model, approximated context
    schedule): nonzero counts within 10% on random spectra, and levels
    never exceed the ceil quantization."""
    from fasthevc_tpu.ops.commit import _scan_perm_mats
    from fasthevc_tpu.ops.rdoq import build_rdoq_tables, rdoq_device
    from fasthevc_tpu.ops.transform import fwd_transform
    from fasthevc_tpu.spec.cabac import ContextSet
    from fasthevc_tpu.spec.rdoq import rdoq_quantize
    from fasthevc_tpu.spec.tables import QUANT_SCALES

    rng = np.random.default_rng(0)
    qp, bd = 32, 8
    lam = 0.57 * 2.0 ** ((qp - 12) / 3.0)
    ctx = ContextSet(0, qp)
    tabs = build_rdoq_tables(jnp.int32(qp), jnp.int32(qp), jnp.int32(qp),
                             jnp.float32(lam), 0, bd)
    for lg, c_idx in ((3, 0), (4, 0), (5, 0), (2, 1), (3, 1)):
        n = 1 << lg
        res = (rng.standard_normal((8, n, n)) * 18).astype(np.int32)
        cf = np.asarray(fwd_transform(jnp.asarray(res), lg, bd, False))
        P = jnp.asarray(_scan_perm_mats(lg))
        oh = np.zeros((8, P.shape[0]), np.float32)
        oh[:, 0] = 1
        lv_dev = np.asarray(rdoq_device(jnp.asarray(cf), jnp.asarray(oh),
                                        P, tabs[(c_idx, lg)], lg, c_idx))
        tshift = 15 - bd - lg
        qbits = 14 + qp // 6 + tshift
        qs = int(QUANT_SCALES[qp % 6])
        m = np.minimum((np.abs(cf).astype(np.int64) * qs
                        + (1 << (qbits - 1))) >> qbits, 32767)
        assert np.all(np.abs(lv_dev) <= m), (lg, c_idx)
        nz_dev = int((lv_dev != 0).sum())
        nz_spec = sum(int((rdoq_quantize(cf[i], qp, bd, lg, c_idx, 0,
                                         lam, ctx) != 0).sum())
                      for i in range(8))
        assert abs(nz_dev - nz_spec) <= max(4, 0.1 * nz_spec), \
            (lg, c_idx, nz_dev, nz_spec)
