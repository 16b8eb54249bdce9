"""Multi-reference prediction + temporal MVP (SURVEY.md E7/C4):
POC-distance MV scaling, ref_idx syntax, TMVP merge/AMVP candidates —
decode parity across the spec and native tiers."""

import numpy as np

from fasthevc_tpu.config import EncoderConfig
from fasthevc_tpu.config.config import GopEntry
from fasthevc_tpu.spec.decoder import SpecDecoder
from fasthevc_tpu.spec.encoder import SpecEncoder
from fasthevc_tpu.spec.inter import mv_scale
from fasthevc_tpu.utils import synthesize_yuv


def _ldp_cfg(**kw):
    gop = [GopEntry(1, 0, "P", (-1, -2)), GopEntry(2, 0, "P", (-1, -2))]
    return EncoderConfig(width=96, height=64, qp=32, intra_period=-1,
                         gop=gop, sao=False, **kw)


def test_mv_scale_spec_values():
    """Hand-computed spec 8.5.3.2.8 cases (tx truncates toward zero)."""
    # tb=4, td=2: tx=8192, dsf=512 -> exact doubling
    assert mv_scale((8, -6), 4, 2) == (16, -12)
    # tb=2, td=4: halving with the +127 round
    assert mv_scale((8, -6), 2, 4) == (4, -3)
    # negative td (future col ref): sign handling of the trunc division
    tx = -((16384 + 2) // 4)  # C-style (16384+2)/-4
    dsf = max(-4096, min(4095, (2 * tx + 32) >> 6))
    want = ((abs(dsf * 8) + 127) >> 8) * (-1 if dsf * 8 < 0 else 1)
    assert mv_scale((8, 0), 2, -4)[0] == want
    # identity when distances match is handled by callers (td == tb skips
    # scaling); scaling with tb == td still equals ~identity
    assert mv_scale((32, -32), 3, 3) == (32, -32)


def test_ref_idx_1_wins_on_period2_content():
    """Frames with period-2 flicker: the 2-frames-back reference is an
    exact match, so the search must pick ref_idx 1 and the stream must
    decode bit-exactly (ref_idx syntax + AMVP target parity)."""
    rng = np.random.default_rng(3)
    a = synthesize_yuv(96, 64, 1, seed=1)[0]
    b = tuple(np.clip(np.asarray(p).astype(np.int32) + 40, 0, 255)
              for p in a)
    frames = [a, b, a, b, a, b, a]
    cfg = _ldp_cfg(frames=len(frames), temporal_mvp=False)
    enc = SpecEncoder(cfg)
    stream, recons = enc.encode(frames)
    # at least one CU of the last P frame references index 1
    assert (enc.maps.motion.ref_idx[..., 0] == 1).any()
    pics = SpecDecoder().decode(stream)
    assert all(p.hash_ok for p in pics)


def test_tmvp_on_off_decode_parity():
    """TMVP on and off both produce self-conformant streams; the SPS and
    slice flags survive the round trip."""
    frames = synthesize_yuv(96, 64, 5, seed=7)
    sizes = {}
    for tmvp in (False, True):
        cfg = _ldp_cfg(frames=5, temporal_mvp=tmvp)
        stream, _ = SpecEncoder(cfg).encode(frames)
        dec = SpecDecoder()
        pics = dec.decode(stream)
        assert all(p.hash_ok for p in pics), f"tmvp={tmvp}"
        assert dec.sp.temporal_mvp_enabled == tmvp
        sizes[tmvp] = len(stream)
    # TMVP adds merge candidates -> encodings legitimately differ
    assert sizes[True] != sizes[False]


def test_tmvp_b_slices_decode():
    """Hierarchical-B GOP with TMVP + 2 refs/list decodes bit-exactly
    (temporal candidate scaling crosses past/future distances)."""
    gop = [GopEntry(4, 1, "B", (-4,)), GopEntry(2, 2, "B", (-2, 2)),
           GopEntry(1, 3, "B", (-1, 1, 3)), GopEntry(3, 3, "B", (-1, 1))]
    cfg = EncoderConfig(width=96, height=64, qp=32, frames=9,
                        intra_period=-1, gop=gop, sao=False,
                        temporal_mvp=True)
    frames = synthesize_yuv(96, 64, 9, seed=9)
    stream, recons = SpecEncoder(cfg).encode(frames)
    pics = SpecDecoder().decode(stream)
    assert all(p.hash_ok for p in pics)
    # display-order recon equality decoder vs encoder
    by_poc = sorted(pics, key=lambda p: p.poc)
    for p, r in zip(by_poc, recons):
        np.testing.assert_array_equal(p.planes.y, r.y)
