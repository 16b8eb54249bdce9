"""BD-rate gate: the production TpuEncoder must stay within a bounded
BD-rate distance of the SpecEncoder oracle (VERDICT r1 item 5 — without
this gate the TPU search proxies can regress silently).

The oracle runs exhaustive recursive RDO with reconstructed references;
the TPU path uses source-reference wavefront-free search + proxies.
Gate: BD-rate(TpuEncoder vs SpecEncoder) <= GATE_PCT on the synthetic
clip, 4 CTC QPs. Ratchet GATE_PCT down as the search improves.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from fasthevc_tpu.codec.encoder import TpuEncoder
from fasthevc_tpu.config import EncoderConfig
from fasthevc_tpu.config.config import GopEntry
from fasthevc_tpu.spec.encoder import SpecEncoder
from fasthevc_tpu.utils import bd_rate, psnr, synthesize_yuv, yuv_from_planes

GATE_INTRA_PCT = 12.0    # default config; measured 10.5 (r5 proxy refit)
GATE_P_PCT = 16.0        # default config; measured ~15 (r5)
# quality() preset (two-pass recon-ref search + rd_cands=5):
GATE_INTRA_QUALITY = 10.0  # measured 8.9 (r5)
GATE_P_QUALITY = 15.0      # measured 13.7 (r5)

W, H, N = 96, 64, 2
QPS = (22, 27, 32, 37)


def _curve(cls, frames, **cfg_kw):
    rates, psnrs = [], []
    for qp in QPS:
        cfg = EncoderConfig(width=W, height=H, qp=qp, frames=len(frames),
                            sao=False, **cfg_kw)
        stream, recs = cls(cfg).encode(frames)
        ys = [yuv_from_planes((r.y, r.cb, r.cr), W, H)[0] for r in recs]
        rates.append(len(stream) * 8 / len(frames))
        psnrs.append(np.mean([psnr(frames[i][0], ys[i])
                              for i in range(len(frames))]))
    return rates, psnrs


def test_bd_gate_all_intra():
    frames = synthesize_yuv(W, H, N, seed=21)
    ra, pa = _curve(SpecEncoder, frames)
    rt, pt = _curve(TpuEncoder, frames)
    bd = bd_rate(ra, pa, rt, pt)
    assert bd <= GATE_INTRA_PCT, f"BD-rate {bd:.2f}% vs oracle"


def test_bd_gate_p_frames():
    frames = synthesize_yuv(W, H, 3, seed=22)
    kw = dict(intra_period=-1, gop=[GopEntry(1, 2, "P", (-1,))])
    ra, pa = _curve(SpecEncoder, frames, **kw)
    rt, pt = _curve(TpuEncoder, frames, **kw)
    bd = bd_rate(ra, pa, rt, pt)
    assert bd <= GATE_P_PCT, f"BD-rate {bd:.2f}% vs oracle"


def test_bd_gate_all_intra_quality():
    """The quality() preset must close most of the source-vs-recon
    reference gap (r5: two-pass recon-ref search + deeper shortlist)."""
    from fasthevc_tpu.config import quality

    frames = synthesize_yuv(W, H, N, seed=21)
    ra, pa = _curve(SpecEncoder, frames)
    rates, psnrs = [], []
    for qp in QPS:
        cfg = quality(EncoderConfig(width=W, height=H, qp=qp, frames=N,
                                    sao=False))
        stream, recs = TpuEncoder(cfg).encode(frames)
        ys = [yuv_from_planes((r.y, r.cb, r.cr), W, H)[0] for r in recs]
        rates.append(len(stream) * 8 / N)
        psnrs.append(np.mean([psnr(frames[i][0], ys[i])
                              for i in range(N)]))
    bd = bd_rate(ra, pa, rates, psnrs)
    assert bd <= GATE_INTRA_QUALITY, f"quality BD-rate {bd:.2f}% vs oracle"


def test_bd_gate_p_quality():
    from fasthevc_tpu.config import quality

    frames = synthesize_yuv(W, H, 3, seed=22)
    kw = dict(intra_period=-1, gop=[GopEntry(1, 2, "P", (-1,))])
    ra, pa = _curve(SpecEncoder, frames, **kw)
    rates, psnrs = [], []
    for qp in QPS:
        cfg = quality(EncoderConfig(width=W, height=H, qp=qp, frames=3,
                                    sao=False, **kw))
        stream, recs = TpuEncoder(cfg).encode(frames)
        ys = [yuv_from_planes((r.y, r.cb, r.cr), W, H)[0] for r in recs]
        rates.append(len(stream) * 8 / 3)
        psnrs.append(np.mean([psnr(frames[i][0], ys[i])
                              for i in range(3)]))
    bd = bd_rate(ra, pa, rates, psnrs)
    assert bd <= GATE_P_QUALITY, f"quality BD-rate {bd:.2f}% vs oracle"
